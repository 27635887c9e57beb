"""CLI entry point (ref: Main.py).

``python -m mimrl_tpu.cli.main --flags ...`` with the reference's full
flag surface. Seeding covers python/numpy and the JAX PRNG
(ref: Main.py:13-24 seeds python/numpy/torch/cuda; JAX's explicit
PRNGKey threading replaces the torch/cuda global seeds and the cudnn
determinism toggles — XLA is deterministic by construction here).
"""

from __future__ import annotations

import faulthandler
import random

import numpy as np

from mimrl_tpu.core.config import MimrlConfig, parse_args


def set_random_seed(opt: MimrlConfig) -> None:
    random.seed(opt.seed)
    np.random.seed(opt.seed)
    # device selection: the reference pins CUDA_VISIBLE_DEVICES
    # (Main.py:21-24); on TPU the mesh flags (--mesh_data/--mesh_model)
    # play that role and are consumed by the Solver.


def main(argv=None):
    faulthandler.enable()
    from mimrl_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    opt = parse_args(argv)
    set_random_seed(opt)
    if opt.jit_backend:
        import jax

        jax.config.update("jax_platforms", opt.jit_backend)
    if opt.distributed:
        # one JAX process per host; env-based coordinator discovery
        # (the TPU-native replacement for the reference's single-process
        # DataParallel, SURVEY.md §2.8)
        import jax

        jax.distributed.initialize()
    from mimrl_tpu.train.solver import Solver

    solver = Solver(opt)
    return solver.solve()


if __name__ == "__main__":
    main()
