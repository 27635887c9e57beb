"""Device-mesh construction and sharding rules.

TPU-native replacement for the reference's single-process
`torch.nn.DataParallel` (ref: Solver.py:33-36): instead of replica
scatter/gather, we build a `jax.sharding.Mesh` with a `data` axis (and an
optional `model` axis for tensor parallelism), annotate the batch with
`P('data')`, keep parameters replicated (or model-sharded), and let XLA's
GSPMD partitioner insert the ICI collectives.

A semantic improvement over the reference, made explicit here: the
reference computes the MI losses on device 0 only (`model.module`,
ref: Customization.py:99,107), so its critics see per-device batches. We
compute the critic score matrices on the *global* batch — under GSPMD the
`[bs, bs]` matmul all-gathers the sharded feature activations over ICI,
which is both faster and statistically better for InfoNCE-style bounds.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. ``data=-1`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model <= 0:
        model = 1
    if data <= 0:
        data = n // model
    assert data * model <= n, (
        f"mesh {data}x{model} needs {data * model} devices, have {n}"
    )
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every array leaf of a batch pytree with its batch axis sharded
    over `data` (leaves whose leading dim is not divisible are replicated)."""
    ds = data_sharding(mesh)
    rs = replicated_sharding(mesh)
    n_data = mesh.shape[DATA_AXIS]

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n_data == 0:
            return jax.device_put(x, ds)
        return jax.device_put(x, rs)

    return jax.tree_util.tree_map(place, batch)


def param_sharding_rule(mesh: Mesh, min_size: int = 2048):
    """Return a function pytree-mapping params -> NamedSharding.

    Large 2-D kernels get their output axis sharded over `model`
    (tensor parallelism for BERT FFN / critic MLPs); everything else is
    replicated. With ``model=1`` this degenerates to full replication.
    """
    n_model = mesh.shape[MODEL_AXIS]

    def rule(x):
        if (
            n_model > 1
            and hasattr(x, "ndim")
            and x.ndim == 2
            and x.shape[1] % n_model == 0
            and x.size >= min_size
        ):
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        return NamedSharding(mesh, P())

    return rule


def shard_params(mesh: Mesh, params):
    rule = param_sharding_rule(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rule(x)), params)
