"""Scatter / segment argmax ops — the TPU replacement for torch-scatter.

The reference's voxel dedup keeps, per (batch, row, col) 2D voxel, the
point with maximum height via ``torch_scatter.scatter_max``
(reference: ivlnce_baselines/common/mapping_module/mapper.py:428-474), and
rasterizes maps with last-write-wins scatter assignment (mapper.py:569-571).

TPU-native design: everything is expressed as fixed-shape masked scatters
(``Array.at[...].max/min/set``) which XLA lowers to on-chip scatter loops,
plus a deterministic argmax-payload recovery trick:

1. scatter-max the key values into the output grid;
2. gather back; a point is a *winner* iff it is valid and its value equals
   the post-update grid value;
3. break ties deterministically by scatter-min of the point index;
4. scatter payloads from the unique winners.

Ties therefore resolve to the lowest point index (torch-scatter leaves the
tie choice implementation-defined, so any deterministic rule is parity-
safe). Masked-out points are parked at index 0 with -inf values so shapes
stay static under jit.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# python float, NOT jnp.float32(...): a module-level jnp scalar is a
# device-resident constant that gets captured into every executable using
# it — on the axon (TPU tunnel) backend such captured-buffer executables
# permanently drop the whole process out of the fast dispatch path
# (~30x slowdown on every subsequent jit call, measured).
NEG_INF = float("-inf")


class SegmentArgmax(NamedTuple):
    max_values: jnp.ndarray  # (num_segments,) max per segment (-inf if empty)
    argmax: jnp.ndarray  # (num_segments,) winning point index (or N if empty)
    winner_mask: jnp.ndarray  # (N,) True for the unique winner of its segment


def segment_argmax(
    values: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    valid: jnp.ndarray,
) -> SegmentArgmax:
    """Per-segment max + deterministic argmax with validity masking.

    Args:
        values: (N,) float32.
        segment_ids: (N,) int32 in [0, num_segments). Invalid points may
            hold any in-range id.
        num_segments: static segment count.
        valid: (N,) bool.
    """
    n = values.shape[0]
    ids = jnp.where(valid, segment_ids, 0)
    vals = jnp.where(valid, values, NEG_INF)

    maxes = jnp.full((num_segments,), NEG_INF, values.dtype)
    maxes = maxes.at[ids].max(vals, mode="drop")

    gathered = maxes[ids]
    is_max = valid & (vals == gathered)

    idx = jnp.arange(n, dtype=jnp.int32)
    argmaxes = jnp.full((num_segments,), n, dtype=jnp.int32)
    argmaxes = argmaxes.at[ids].min(
        jnp.where(is_max, idx, n), mode="drop"
    )

    winner = is_max & (argmaxes[ids] == idx)
    return SegmentArgmax(maxes, argmaxes, winner)


def keep_highest_dedup(
    heights: jnp.ndarray,
    cell_ids: jnp.ndarray,
    num_cells: int,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Voxel dedup mask: True for the single highest valid point per cell.

    Functional equivalent of the reference's KeepHighestSemanticPointcloud
    (mapper.py:428-474) with masking instead of gather-compaction (XLA
    needs static shapes; downstream consumers honor the mask).
    """
    return segment_argmax(heights, cell_ids, num_cells, valid).winner_mask


def scatter_argmax_grid_update(
    grid_key: jnp.ndarray,
    grid_payload: jnp.ndarray,
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    keys: jnp.ndarray,
    payload: jnp.ndarray,
    valid: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched argmax-by-key grid update (the world-map accumulator).

    For every valid point, if ``key > grid_key[b, r, c]`` the cell adopts
    the point's key and payload vector. Ties keep the incumbent;
    simultaneous new points tie-break to the lowest point index.
    Out-of-grid points must be pre-masked via ``valid``.

    The payload is a single packed (B, R, C, P) float tensor: one scatter
    op per step instead of one per channel — each TPU scatter is its own
    serialized HBM pass and its own (expensive) compile, so P-channel
    packing is ~P x cheaper on both axes. Callers keep their state packed.

    Args:
        grid_key: (B, R, C) float32 per-cell key (max height; empty =
            -inf).
        grid_payload: (B, R, C, P) float32.
        rows, cols: (B, N) int32 target cells.
        keys: (B, N) float32.
        payload: (B, N, P) float32 per-point payload vectors.
        valid: (B, N) bool.
    Returns:
        (new_grid_key, new_grid_payload)
    """
    grid_key = jnp.asarray(grid_key)
    grid_payload = jnp.asarray(grid_payload)
    b, n = keys.shape
    batch_idx = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], (b, n)
    )
    r = jnp.where(valid, rows, 0)
    c = jnp.where(valid, cols, 0)
    k = jnp.where(valid, keys, NEG_INF)

    new_key = grid_key.at[batch_idx, r, c].max(k, mode="drop")

    gathered = new_key[batch_idx, r, c]
    # strictly-greater-than-incumbent semantics: a point wins only if it
    # raised the cell's key above the previous value OR matched the new max
    # while the incumbent was lower (tie among new points).
    prev = grid_key[batch_idx, r, c]
    is_max = valid & (k == gathered) & (k > prev)

    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (b, n))
    first_idx = jnp.full(grid_key.shape, n, dtype=jnp.int32)
    first_idx = first_idx.at[batch_idx, r, c].min(
        jnp.where(is_max, idx, n), mode="drop"
    )
    winner = is_max & (first_idx[batch_idx, r, c] == idx)

    # Route non-winners out of bounds so mode="drop" discards them — each
    # cell then receives at most one update (scatter order is unspecified
    # for duplicate indices, so losers must not write at all).
    r_w = jnp.where(winner, r, grid_key.shape[1])
    new_payload = grid_payload.at[batch_idx, r_w, c].set(
        payload, mode="drop"
    )
    return new_key, new_payload


def rasterize_argmax(
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    keys: jnp.ndarray,
    values: jnp.ndarray,
    valid: jnp.ndarray,
    num_rows: int,
    num_cols: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rasterize per-point values into a fresh (B, R, C) grid.

    Occupancy = any valid point in the cell; value = the value of the
    argmax-key (highest) point. The reference writes values last-write-wins
    (mapper.py:569-571) over an arbitrary point order; we use the
    deterministic highest-point rule instead (documented divergence — the
    reference order is implementation-defined).

    Returns:
        occupancy (B, R, C) uint8, value_map (B, R, C) same dtype as values.
    """
    b, n = keys.shape
    batch_idx = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], (b, n)
    )
    r = jnp.where(valid, rows, 0)
    c = jnp.where(valid, cols, 0)
    k = jnp.where(valid, keys, NEG_INF)

    occupancy = jnp.zeros((b, num_rows, num_cols), jnp.uint8)
    occupancy = occupancy.at[batch_idx, r, c].max(
        valid.astype(jnp.uint8), mode="drop"
    )

    key_grid = jnp.full((b, num_rows, num_cols), NEG_INF, keys.dtype)
    key_grid = key_grid.at[batch_idx, r, c].max(k, mode="drop")
    is_max = valid & (k == key_grid[batch_idx, r, c])

    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (b, n))
    first_idx = jnp.full((b, num_rows, num_cols), n, dtype=jnp.int32)
    first_idx = first_idx.at[batch_idx, r, c].min(
        jnp.where(is_max, idx, n), mode="drop"
    )
    winner = is_max & (first_idx[batch_idx, r, c] == idx)

    # only winners may write (see scatter_argmax_grid_update note)
    r_w = jnp.where(winner, r, num_rows)
    value_map = jnp.zeros((b, num_rows, num_cols), values.dtype)
    value_map = value_map.at[batch_idx, r_w, c].set(values, mode="drop")
    return occupancy, value_map


def _expand_like(mask: jnp.ndarray, arr: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a (B, N) mask against (B, N, ...) payloads."""
    extra = arr.ndim - mask.ndim
    return mask.reshape(mask.shape + (1,) * extra)


# -----------------------------------------------------------------------------
# sort-based packed grid update (the production world-map accumulator)
# -----------------------------------------------------------------------------
# Empty-cell sentinel for packed key grids: below sortable(-inf).
EMPTY_KEY = -(2 ** 31)

# aux packing layout: | qx : 14 | qz : 14 | sem : 4 |  (uint32)
_Q_BITS = 14
_Q_MAX = (1 << _Q_BITS) - 1


def sortable_from_float(x: jnp.ndarray) -> jnp.ndarray:
    """EXACT monotone f32 -> int32 key (IEEE total-order trick): integer
    comparison of the result matches float comparison, including -inf.
    Roundtrips bit-exactly through float_from_sortable."""
    s = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    return jnp.where(s >= 0, s, jnp.bitwise_xor(s, jnp.int32(0x7FFFFFFF)))


def float_from_sortable(k: jnp.ndarray) -> jnp.ndarray:
    s = jnp.where(k >= 0, k, jnp.bitwise_xor(k, jnp.int32(0x7FFFFFFF)))
    return jax.lax.bitcast_convert_type(s, jnp.float32)


def pack_aux(
    x: jnp.ndarray,
    z: jnp.ndarray,
    sem: jnp.ndarray,
    cell_r: jnp.ndarray,
    cell_c: jnp.ndarray,
    half_res: float,
) -> jnp.ndarray:
    """Pack a point's world (x, z) + semantic label into one uint32.

    Coordinates are stored as 14-bit offsets from the point's half-res
    cell center (rows keyed by z, cols by x): ~1.5 um precision at the
    default 0.05 m cell — on the order of a single f32 ulp at room
    scale, i.e. numerically equivalent to the reference's raw floats
    (documented divergence; numpy parity references share this exact
    roundtrip via quantize_xz)."""
    dx = x - cell_c.astype(jnp.float32) * half_res
    dz = z - cell_r.astype(jnp.float32) * half_res
    qx = jnp.clip(
        jnp.round((dx / half_res + 0.5) * _Q_MAX), 0, _Q_MAX
    ).astype(jnp.uint32)
    qz = jnp.clip(
        jnp.round((dz / half_res + 0.5) * _Q_MAX), 0, _Q_MAX
    ).astype(jnp.uint32)
    return (
        (qx << (4 + _Q_BITS)) | (qz << 4) | (sem.astype(jnp.uint32) & 0xF)
    )


def unpack_aux(
    aux: jnp.ndarray,
    cell_r: jnp.ndarray,
    cell_c: jnp.ndarray,
    half_res: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Inverse of pack_aux -> (x, z, sem uint8)."""
    qx = (aux >> (4 + _Q_BITS)) & _Q_MAX
    qz = (aux >> 4) & _Q_MAX
    sem = (aux & 0xF).astype(jnp.uint8)
    x = (
        cell_c.astype(jnp.float32) * half_res
        + (qx.astype(jnp.float32) / _Q_MAX - 0.5) * half_res
    )
    z = (
        cell_r.astype(jnp.float32) * half_res
        + (qz.astype(jnp.float32) / _Q_MAX - 0.5) * half_res
    )
    return x, z, sem


def quantize_xz(x, z, cell_r, cell_c, half_res: float):
    """The exact (x, z) roundtrip applied by pack/unpack — numpy parity
    references apply this to their stored floats so both sides share one
    coordinate spec."""
    aux = pack_aux(
        jnp.asarray(x), jnp.asarray(z), jnp.zeros_like(jnp.asarray(cell_r)),
        jnp.asarray(cell_r), jnp.asarray(cell_c), half_res,
    )
    xq, zq, _ = unpack_aux(
        aux, jnp.asarray(cell_r), jnp.asarray(cell_c), half_res
    )
    return xq, zq


# Compact-list sentinel: sorts after every real cell id and is dropped by
# out-of-bounds scatters (any real grid has < 2^31 - 1 cells).
LIST_EMPTY = 2 ** 31 - 1


def merge_points_into_list(
    list_cell: jnp.ndarray,  # (B, M) i32 sorted unique cell ids; LIST_EMPTY pad
    list_key: jnp.ndarray,  # (B, M) i32 sortable keys
    list_aux: jnp.ndarray,  # (B, M) u32 payloads
    cells: jnp.ndarray,  # (B, N) i32 point cell ids (any value if invalid)
    keys_f32: jnp.ndarray,  # (B, N) f32 argmax keys (heights)
    aux: jnp.ndarray,  # (B, N) u32 payloads
    valid: jnp.ndarray,  # (B, N) bool
    compact: str = "sort",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Merge a frame's points into a sorted compact per-lane cell list —
    the scatter-free world-map accumulator.

    Measured motivation (BASELINE.md r3): XLA TPU scatter costs ~8 ns and
    gather ~20 ns PER UPDATE SLOT (serialized, update-count-bound), so the
    old dense-window scatter burned ~2 s/step at B=768 x 65k points, while
    lax.sort runs at vector speed (~0.4 ns/element/operand). Two stable
    sorts replace the scatter+gather entirely:

    1. concatenate [points (REVERSED), list] and sort by (cell, key):
       per cell run, the LAST element is the winner. Stability + the
       ordering make ties exact: equal-key points resolve to the LOWEST
       original point index (reversal), and an equal-key incumbent list
       entry sorts after all equal points, so INCUMBENTS WIN ties —
       identical semantics to sorted_argmax_grid_update.
    2. compact the winners to the front in cell order = the new sorted
       list; pads carry LIST_EMPTY. Two equivalent implementations
       selected by ``compact``: "sort" re-sorts by
       (winner ? cell : LIST_EMPTY); "scatter" computes each winner's
       output slot as cumsum(win) - 1 (winners already appear in
       ascending cell order, so the result is identically sorted) and
       issues three (N+M)-slot scatter-sets — cheaper whenever a
       scatter pass beats a 3-operand sort of the same width (A/B via
       scripts/profile_fused_step.py --compact).

    Returns (list_cell, list_key, list_aux, fill) where ``fill`` is the
    per-lane winner count. Callers must flush the list into the dense
    grid before ``fill + N`` can exceed M (mapper.mapper_step) — the
    truncation to M below is only safe under that invariant. (Both
    variants drop the HIGHEST cell ids on overflow.)
    """
    b, m = list_cell.shape
    key_i = sortable_from_float(keys_f32)
    pc = jnp.where(valid, cells, LIST_EMPTY)[:, ::-1]
    pk = key_i[:, ::-1]
    pa = aux[:, ::-1]
    mc = jnp.concatenate([pc, list_cell], axis=1)
    mk = jnp.concatenate([pk, list_key], axis=1)
    ma = jnp.concatenate([pa, list_aux], axis=1)
    sc, sk, sa = jax.lax.sort((mc, mk, ma), num_keys=2, is_stable=True)
    is_last = jnp.concatenate(
        [sc[:, :-1] != sc[:, 1:], jnp.ones((b, 1), bool)], axis=1
    )
    win = is_last & (sc != LIST_EMPTY)
    fill = jnp.sum(win, axis=1).astype(jnp.int32)
    if compact == "scatter":
        pos = jnp.cumsum(win.astype(jnp.int32), axis=1) - 1
        tgt = jnp.where(win, pos, m)  # losers / overflow -> dropped
        bidx = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.int32)[:, None], tgt.shape
        )
        c2 = (
            jnp.full((b, m), LIST_EMPTY, jnp.int32)
            .at[bidx, tgt].set(sc, mode="drop")
        )
        k2 = (
            jnp.full((b, m), EMPTY_KEY, jnp.int32)
            .at[bidx, tgt].set(sk, mode="drop")
        )
        a2 = (
            jnp.zeros((b, m), jnp.uint32)
            .at[bidx, tgt].set(sa, mode="drop")
        )
        return c2, k2, a2, fill
    tgt = jnp.where(win, sc, LIST_EMPTY)
    c2, k2, a2 = jax.lax.sort((tgt, sk, sa), num_keys=1, is_stable=True)
    return c2[:, :m], k2[:, :m], a2[:, :m], fill


def sorted_argmax_grid_update(
    key_grid: jnp.ndarray,  # (B, C) int32 sortable keys; EMPTY_KEY empty
    aux_grid: jnp.ndarray,  # (B, C) uint32 packed payloads
    cells: jnp.ndarray,  # (B, N) int32 flat cell ids (any value if invalid)
    keys_f32: jnp.ndarray,  # (B, N) f32 argmax keys (heights)
    aux: jnp.ndarray,  # (B, N) uint32 packed payloads
    valid: jnp.ndarray,  # (B, N) bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Argmax-by-key grid update via sort + run detection + two
    1-channel scatter-sets.

    Replaces the 6-pass scatter/gather scheme of
    scatter_argmax_grid_update for the production mapper: on this
    hardware a scatter pass costs ~grid-size x bandwidth while a 65k-
    point 4-operand sort costs ~10 ms, so pre-reducing the frame to
    unique per-cell winners and issuing exactly two scatter-sets (key +
    payload word) is ~6x cheaper than scatter-max / gather / scatter-min
    / gather / 3-channel scatter-set (measured on v5e via the tunnel;
    see BASELINE.md).

    Semantics identical to scatter_argmax_grid_update: a valid point
    whose key exceeds the cell's incumbent adopts the cell; ties keep the
    incumbent; equal-key points within the frame tie-break to the lowest
    point index.
    """
    b, n = cells.shape
    c_total = key_grid.shape[1]
    key_i = sortable_from_float(keys_f32)
    cells = jnp.where(valid, cells, c_total).astype(jnp.int32)
    neg_idx = jnp.broadcast_to(
        -jnp.arange(n, dtype=jnp.int32)[None, :], (b, n)
    )
    # ascending (cell, key, -idx): the last element of each cell run is
    # the max-key point, lowest index among equals
    sc, sk, _, sa = jax.lax.sort(
        (cells, key_i, neg_idx, aux), num_keys=3
    )
    is_last = jnp.concatenate(
        [sc[:, :-1] != sc[:, 1:], jnp.ones((b, 1), bool)], axis=1
    )
    win = is_last & (sc < c_total)
    old = jnp.take_along_axis(
        key_grid, jnp.minimum(sc, c_total - 1), axis=1
    )
    win &= sk > old

    target = jnp.where(win, sc, c_total)
    bidx = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], (b, n)
    )
    new_key = key_grid.at[bidx, target].set(sk, mode="drop")
    new_aux = aux_grid.at[bidx, target].set(sa, mode="drop")
    return new_key, new_aux


def rasterize_occupancy_semantic_sorted(
    rows: jnp.ndarray,  # (B, N) i32 map rows
    cols: jnp.ndarray,  # (B, N) i32 map cols
    heights: jnp.ndarray,  # (B, N) f32 argmax keys
    labels: jnp.ndarray,  # (B, N) uint8 semantic labels (0 = floor)
    valid: jnp.ndarray,  # (B, N) bool
    num_rows: int,
    num_cols: int,
    floor_label: int = 0,
    compact: str = "sort",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Occupancy + semantic egocentric maps from ONE sort.

    Replaces the pair of rasterize_argmax calls (2 x ~5 scatter/gather
    passes over all points) in the mapper's rasterize phase: sorting by
    (cell, is-non-floor, height, -idx) makes the LAST element of each
    cell run simultaneously (a) proof the cell is occupied and (b) the
    semantic winner — the max-height non-floor point when one exists
    (floor points sort below all non-floor in the same cell), with
    equal heights tie-breaking to the lowest point index. Exactly the
    semantics of:

        occupancy = rasterize_argmax(..., valid).occupancy
        semantic  = rasterize_argmax(..., valid & label != floor).value

    Tie rule: among equal (cell, non-floor, height) the winner is the
    LOWEST point index (points are fed to the stable sort reversed) —
    the reference's own order is implementation-defined scatter order
    (mapper.py:569-571), so any deterministic rule is parity-safe.

    The final scatters are COMPACTED: winners number at most one per map
    cell (<= R*C, typically << N), so a cheap third sort moves them to
    the front and the scatter covers min(N, R*C) slots instead of N —
    TPU scatter cost is per-slot (~8 ns, BASELINE.md r3), which made the
    uncompacted scatter the dominant rasterize cost at production sizes.

    Returns (occupancy (B, R, C) uint8, semantic (B, R, C) uint8).
    """
    b, n = heights.shape
    c_total = num_rows * num_cols
    cells = jnp.where(
        valid, rows * num_cols + cols, c_total
    ).astype(jnp.int32)
    nonfloor = (labels != floor_label).astype(jnp.int32)
    key_i = sortable_from_float(heights)
    # reversed input: stable sort leaves the lowest original index LAST
    # within equal (cell, nonfloor, key) runs, i.e. as the run winner
    sc, snf, sk, sl = jax.lax.sort(
        (
            cells[:, ::-1],
            nonfloor[:, ::-1],
            key_i[:, ::-1],
            labels[:, ::-1].astype(jnp.int32),
        ),
        num_keys=3,
        is_stable=True,
    )
    is_last = jnp.concatenate(
        [sc[:, :-1] != sc[:, 1:], jnp.ones((b, 1), bool)], axis=1
    )
    win = is_last & (sc < c_total)
    # an all-floor cell's winner is a floor point: the old two-call path
    # (semantic rasterize over valid & non-floor) left such cells at 0,
    # so mask the written label rather than emitting floor_label
    sem_val = jnp.where(win & (snf == 1), sl, 0).astype(jnp.int32)
    target = jnp.where(win, sc, c_total)

    k = min(n, c_total)
    if k < n and compact == "scatter":
        # winners number <= one per map cell (<= c_total = k), so every
        # cumsum position fits: compact via an N-slot scatter instead of
        # a 2-operand N-wide sort (same A/B rationale as
        # merge_points_into_list)
        pos = jnp.cumsum(win.astype(jnp.int32), axis=1) - 1
        tgt = jnp.where(win, pos, k)
        bidx_n = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.int32)[:, None], tgt.shape
        )
        target = (
            jnp.full((b, k), c_total, jnp.int32)
            .at[bidx_n, tgt].set(target, mode="drop")
        )
        sem_val = (
            jnp.zeros((b, k), jnp.int32)
            .at[bidx_n, tgt].set(sem_val, mode="drop")
        )
    elif k < n:  # compact winners to the front, scatter only k slots
        target, sem_val = jax.lax.sort(
            (target, sem_val), num_keys=1, is_stable=True
        )
        target = target[:, :k]
        sem_val = sem_val[:, :k]
    bidx = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], (b, k)
    )
    occupancy = (
        jnp.zeros((b, c_total), jnp.uint8)
        .at[bidx, target].set(jnp.uint8(1), mode="drop")
        .reshape(b, num_rows, num_cols)
    )
    semantic = (
        jnp.zeros((b, c_total), jnp.uint8)
        .at[bidx, target]
        .set(sem_val.astype(jnp.uint8), mode="drop")
        .reshape(b, num_rows, num_cols)
    )
    return occupancy, semantic
