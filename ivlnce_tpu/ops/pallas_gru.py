"""Pallas TPU kernel: fused masked GRU cell.

The CMA policies run two GRU cells per step (reference
map_cma_policy.py:314-353 via habitat's RNNStateEncoder). The XLA lowering
splits each cell into two matmuls plus ~10 elementwise kernels; this
kernel computes the whole masked cell — mask multiply, both gate matmuls,
sigmoid/tanh gating, state blend — as ONE fused MXU+VPU program with the
weights resident in VMEM (w_ih + w_hh for hidden 512 ≈ 5.5 MB f32).

Semantics match models/rnn.py::masked_gru_step exactly (torch gate order
[r, z, n]; r gates only the hidden contribution; mask==0 restarts the
recurrence by zeroing h before the step).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, jnp.ndarray]


def _kernel(x_ref, h_ref, mask_ref, w_ih_ref, w_hh_ref, b_ih_ref, b_hh_ref,
            out_ref, *, hidden: int):
    x = x_ref[:, :]
    h = h_ref[:, :] * mask_ref[:, :]  # masked restart

    gi = (
        jnp.dot(x, w_ih_ref[:, :].T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + b_ih_ref[0, :]
    )
    gh = (
        jnp.dot(h, w_hh_ref[:, :].T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + b_hh_ref[0, :]
    )
    i_r = gi[:, :hidden]
    i_z = gi[:, hidden:2 * hidden]
    i_n = gi[:, 2 * hidden:]
    h_r = gh[:, :hidden]
    h_z = gh[:, hidden:2 * hidden]
    h_n = gh[:, 2 * hidden:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    out_ref[:, :] = (1.0 - z) * n + z * h


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_gru_step_pallas(
    p: Params,
    x: jnp.ndarray,  # (B, I)
    h: jnp.ndarray,  # (B, H)
    mask: jnp.ndarray,  # (B,) 1 keeps state, 0 restarts
    interpret: bool = False,
) -> jnp.ndarray:
    b, hidden = h.shape
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, hidden=hidden),
        in_specs=[vmem] * 7,
        out_specs=vmem,
        out_shape=jax.ShapeDtypeStruct((b, hidden), jnp.float32),
        interpret=interpret,
    )(
        x.astype(jnp.float32),
        h.astype(jnp.float32),
        jnp.broadcast_to(
            mask.astype(jnp.float32).reshape(-1, 1), (b, 1)
        ),
        p["w_ih"],
        p["w_hh"],
        p["b_ih"].reshape(1, -1),
        p["b_hh"].reshape(1, -1),
    )
