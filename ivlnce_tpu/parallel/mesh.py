"""Device-mesh construction and sharding rules.

The reference has no distributed backend at all (SURVEY.md section 2:
single-process, single-GPU, vector envs over pipes). The TPU-native
equivalent is a 2D ``(data, model)`` mesh:

- ``data``  — batch-dimension data parallelism for the IL update (lanes /
  tour lanes shard across chips; grads reduce over ICI via the psum XLA
  inserts for replicated-param outputs);
- ``model`` — tensor parallelism for the wide weights (frozen ResNet /
  RedNet convs and the big obs->hidden linears shard their output
  channels; XLA inserts the matching all-gathers).

Everything is expressed as ``NamedSharding`` on jit boundaries: we pick
the layout, XLA inserts the collectives (scaling-book recipe).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}"
        )
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, batch_axis: int = 0, ndim: int = 1):
    """Shard one axis over ``data``, replicate the rest."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def param_shardings(params, mesh: Mesh, min_weight_size: int = 1 << 15):
    """Tensor-parallel sharding rule for a parameter (or optimizer-state)
    pytree: big weights shard their OUTPUT-channel axis over ``model`` when
    divisible; everything else replicates.

    The output axis position depends on layout: 2D matmul weights are
    (out, in) — axis 0; 4D conv kernels are stored HWIO (checkpoint_io
    transposes torch OIHW -> HWIO) — axis -1. Output-axis sharding is the
    column-parallel half of the Megatron split: y = W x with W out-sharded
    produces y sharded over ``model``; XLA all-gathers y where a
    replicated consumer needs it.
    """
    m = mesh.shape["model"]

    def rule(x):
        shape = getattr(x, "shape", ())
        size = int(np.prod(shape)) if shape else 0
        if m > 1 and len(shape) >= 2 and size >= min_weight_size:
            out_axis = len(shape) - 1 if len(shape) == 4 else 0
            if shape[out_axis] % m == 0:
                spec = [None] * len(shape)
                spec[out_axis] = "model"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)
