"""Pallas TPU kernel: window-local scatter-argmax (voxel dedup + payload
adoption) for the world-map accumulator.

The XLA lowering of ops/scatter.py::scatter_argmax_grid_update issues six
grid-sized scatter/gather passes over HBM per frame (max-scatter, two
gathers, min-scatter, winner gather, payload scatter). This kernel instead
holds the active window of the world grid in VMEM and performs the whole
read-modify-write sequentially on-chip in ONE pass:

    for each point i (ascending):
        if valid[i] and key[i] > height[cell(i)]:
            height[cell(i)] = key[i]
            payload[cell(i), :] = point_payload[i, :]

Sequential ascending order gives exactly the reference tie semantics
(ties keep the incumbent; among equal new points the lowest index wins —
torch_scatter leaves this implementation-defined, reference
mapper.py:428-474).

Mosaic layout note: dynamic VMEM addressing must be 128-aligned in the
minor (lane) dimension, so all dynamically indexed buffers are laid out
(rows, channels) with the dynamic index in the SUBLANE dimension — the
window grids flatten to (W*W, 1) / (W*W, P) and stores are (1, channels)
row-slices.

Grid = one program per batch lane. VMEM per program at the default window
(512 cells, 65536 points, P=3): 1 MB window heights + 3 MB window payload
(x2 for outputs) + ~2 MB shared point data — under the ~16 MB/core VMEM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_LANE = 128  # point streams fold to (N/_LANE, _LANE) for SMEM tiling


def _kernel(rc_ref, k_ref, pay_ref, grid_h_ref, grid_p_ref,
            out_h_ref, out_p_ref):
    # every ref is blocked per-lane (grid dim 0). rc/k are this lane's
    # points folded to (N/128, 128) in SMEM — a full (B, N) int32 block
    # would blow the ~1 MB SMEM budget at production sizes (16 x 65536 x
    # 4 B = 4 MB), and 2D blocks must tile (8, 128).
    # copy incumbents into the output window, then RMW in place
    out_h_ref[:, :] = grid_h_ref[:, :]
    out_p_ref[:, :] = grid_p_ref[:, :]

    n = rc_ref.shape[0] * _LANE
    n_cells = out_h_ref.shape[0]

    def body(i, _):
        hi = i // _LANE
        lo = i % _LANE
        rc = rc_ref[hi, lo]
        k = k_ref[hi, lo]

        # invalid points are pre-routed to rc == n_cells by the caller,
        # so a single bounds check drops them
        @pl.when(jnp.logical_and(rc < n_cells, k > out_h_ref[rc, 0]))
        def _():
            out_h_ref[pl.ds(rc, 1), :] = k.reshape(1, 1)
            out_p_ref[pl.ds(rc, 1), :] = pay_ref[pl.ds(i, 1), :].reshape(
                1, -1
            )

        return 0

    jax.lax.fori_loop(0, n, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def scatter_argmax_window_update(
    window_h: jnp.ndarray,  # (B, W, W) f32 incumbent keys (-inf empty)
    window_p: jnp.ndarray,  # (B, W, W, P) f32 incumbent payloads
    rows: jnp.ndarray,  # (B, N) i32 window-relative rows
    cols: jnp.ndarray,  # (B, N) i32 window-relative cols
    keys: jnp.ndarray,  # (B, N) f32
    payload: jnp.ndarray,  # (B, N, P) f32
    valid: jnp.ndarray,  # (B, N) bool
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-lane argmax-by-key window update (semantics identical to
    ops/scatter.py::scatter_argmax_grid_update on the window)."""
    b, w, _ = window_h.shape
    p = window_p.shape[-1]
    n_cells = w * w

    # flatten cells; route invalid points out of range
    in_window = valid & (rows >= 0) & (rows < w) & (cols >= 0) & (cols < w)
    rc = jnp.where(in_window, rows * w + cols, n_cells).astype(jnp.int32)

    h_flat = window_h.reshape(b, n_cells, 1)
    p_flat = window_p.reshape(b, n_cells, p)

    # pad the point dim to a multiple of 128 and fold for SMEM tiling;
    # padded slots route out of range (rc = n_cells)
    n = rc.shape[1]
    n_pad = (-n) % _LANE
    if n_pad:
        rc = jnp.pad(rc, ((0, 0), (0, n_pad)), constant_values=n_cells)
        keys = jnp.pad(keys, ((0, 0), (0, n_pad)))
        payload = jnp.pad(payload, ((0, 0), (0, n_pad), (0, 0)))
        n += n_pad
    rc = rc.reshape(b, n // _LANE, _LANE)
    keys_f = keys.astype(jnp.float32).reshape(b, n // _LANE, _LANE)

    out_h, out_p = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, n // _LANE, _LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),  # rc lane (N/128, 128)
            pl.BlockSpec((None, n // _LANE, _LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),  # keys lane
            pl.BlockSpec((None, n, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # payload lane row
            pl.BlockSpec((None, n_cells, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n_cells, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, n_cells, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n_cells, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_cells, 1), window_h.dtype),
            jax.ShapeDtypeStruct((b, n_cells, p), window_p.dtype),
        ),
        interpret=interpret,
    )(rc, keys_f, payload, h_flat, p_flat)
    return out_h.reshape(b, w, w), out_p.reshape(b, w, w, p)
