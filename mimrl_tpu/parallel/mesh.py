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

DCN_AXIS = "dcn"
DATA_AXIS = "data"
PIPE_AXIS = "pipe"
MODEL_AXIS = "model"


def make_mesh(data: int = -1, model: int = 1, pipe: int = 1,
              dcn: int = 1, devices=None) -> Mesh:
    """Build a (dcn, data, pipe, model) mesh. ``data=-1`` uses all
    remaining devices. `pipe` is the pipeline-stage axis
    (parallel/pipeline.py); with the defaults the mesh degenerates to
    (data, model). Axis order puts `model` innermost so tensor-parallel
    collectives ride the fastest ICI links, and `dcn` OUTERMOST: on a
    multi-slice pod the leading axis maps to the slice boundary, so only
    the `dcn` collectives (the batch gradient all-reduce) cross the
    data-center network while pipe/model traffic stays on intra-slice
    ICI. Parameters are replicated across `dcn` (pure data parallelism
    between slices); the batch shards over dcn x data jointly."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model <= 0:
        model = 1
    if pipe <= 0:
        pipe = 1
    if dcn <= 0:
        dcn = 1
    if data <= 0:
        data = n // (model * pipe * dcn)
    assert data * model * pipe * dcn <= n, (
        f"mesh {dcn}x{data}x{pipe}x{model} needs "
        f"{data * model * pipe * dcn} devices, have {n}"
    )
    dev_array = np.asarray(devices[: dcn * data * model * pipe]).reshape(
        dcn, data, pipe, model)
    return Mesh(dev_array, (DCN_AXIS, DATA_AXIS, PIPE_AXIS, MODEL_AXIS))


def batch_axes(mesh: Mesh):
    """The mesh axes the batch dimension shards over: (dcn, data) on a
    multi-slice mesh, plain 'data' otherwise."""
    if DCN_AXIS in mesh.shape and mesh.shape[DCN_AXIS] > 1:
        return (DCN_AXIS, DATA_AXIS)
    return DATA_AXIS


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data (x dcn) axes."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every array leaf of a batch pytree with its batch axis sharded
    over `data` (x `dcn` on multi-slice meshes); leaves whose leading dim
    is not divisible are replicated."""
    ds = data_sharding(mesh)
    rs = replicated_sharding(mesh)
    axes = batch_axes(mesh)
    axes = axes if isinstance(axes, tuple) else (axes,)
    n_batch = int(np.prod([mesh.shape[a] for a in axes]))

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n_batch == 0:
            return jax.device_put(x, ds)
        return jax.device_put(x, rs)

    return jax.tree_util.tree_map(place, batch)


def param_sharding_rule(mesh: Mesh, min_size: int = 2048):
    """Return a function mapping (path, leaf) -> NamedSharding.

    - Large 2-D kernels get their output axis sharded over `model`
      (tensor parallelism for BERT FFN / critic MLPs).
    - MoE expert weights (leaves under a `moe_*` module with a leading
      expert axis divisible by the `model` size) shard expert-wise over
      `model` (expert parallelism).
    - Everything else is replicated. With ``model=1`` this degenerates
      to full replication.
    """
    n_model = mesh.shape[MODEL_AXIS]

    def rule(path, x):
        if n_model > 1 and hasattr(x, "ndim"):
            path_str = "/".join(
                str(getattr(k, "key", k)) for k in path)
            if ("moe_" in path_str and "router" not in path_str
                    and x.ndim >= 2 and x.shape[0] % n_model == 0):
                return NamedSharding(
                    mesh, P(MODEL_AXIS, *([None] * (x.ndim - 1))))
            # Embedding tables stay replicated: they are consumed by
            # gathers, not matmuls, and a hidden-sharded table forces
            # GSPMD to replicate-then-repartition every lookup
            # ("involuntary full rematerialization" in the dryrun).
            if (x.ndim == 2 and x.shape[1] % n_model == 0
                    and x.size >= min_size
                    and not path_str.endswith("embedding")):
                return NamedSharding(mesh, P(None, MODEL_AXIS))
        return NamedSharding(mesh, P())

    return rule


def shard_params(mesh: Mesh, params):
    rule = param_sharding_rule(mesh)
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(x, rule(path, x)), params)
