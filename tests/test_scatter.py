"""Tests for segment/scatter argmax ops vs brute-force NumPy and
torch-scatter-equivalent semantics (reference mapper.py:428-474)."""

import jax
import numpy as np

from ivlnce_tpu.ops import scatter as S


def brute_force_argmax(values, ids, num_segments, valid):
    maxes = np.full(num_segments, -np.inf, np.float32)
    argmax = np.full(num_segments, len(values), np.int64)
    for i, (v, s, ok) in enumerate(zip(values, ids, valid)):
        if not ok:
            continue
        if v > maxes[s] or (v == maxes[s] and i < argmax[s]):
            maxes[s] = v
            argmax[s] = i
    return maxes, argmax


def test_segment_argmax_matches_brute_force(rng):
    n, num_segments = 257, 19
    values = rng.normal(size=(n,)).astype(np.float32)
    ids = rng.integers(0, num_segments, size=(n,)).astype(np.int32)
    valid = rng.random(n) > 0.3
    out = S.segment_argmax(values, ids, num_segments, valid)
    ref_max, ref_arg = brute_force_argmax(values, ids, num_segments, valid)
    np.testing.assert_allclose(np.asarray(out.max_values), ref_max)
    np.testing.assert_array_equal(np.asarray(out.argmax), ref_arg)
    winners = np.asarray(out.winner_mask)
    # exactly one winner per non-empty segment, and it is the argmax
    for s in range(num_segments):
        seg_winners = np.where(winners & (ids == s) & valid)[0]
        if np.isfinite(ref_max[s]):
            assert list(seg_winners) == [ref_arg[s]]
        else:
            assert len(seg_winners) == 0


def test_segment_argmax_ties_pick_lowest_index():
    values = np.array([1.0, 2.0, 2.0, 0.5], np.float32)
    ids = np.array([0, 0, 0, 1], np.int32)
    out = S.segment_argmax(values, ids, 2, np.ones(4, bool))
    assert int(out.argmax[0]) == 1
    np.testing.assert_array_equal(
        np.asarray(out.winner_mask), [False, True, False, True]
    )


def test_keep_highest_dedup_matches_reference_semantics(rng):
    """Replicates KeepHighestSemanticPointcloud on a synthetic cloud."""
    n = 500
    res = 0.1
    xyz = (rng.random((n, 3)) * 4 - 2).astype(np.float32)
    half = res / 2
    rows = np.round(xyz[:, 2] / half).astype(np.int64)
    cols = np.round(xyz[:, 0] / half).astype(np.int64)
    rows -= rows.min()
    cols -= cols.min()
    ncols = cols.max() + 1
    flat = (rows * ncols + cols).astype(np.int32)
    num_cells = int(flat.max()) + 1

    mask = np.asarray(
        S.keep_highest_dedup(
            xyz[:, 1], flat, num_cells, np.ones(n, bool)
        )
    )
    # per surviving cell, height equals the cell's max height
    for cell in np.unique(flat):
        sel = flat == cell
        kept = mask & sel
        assert kept.sum() == 1
        assert xyz[kept, 1][0] == xyz[sel, 1].max()


def test_scatter_argmax_grid_update_incremental_equals_batch(rng):
    """Streaming points into the grid must equal a single brute-force pass
    (this is the property that makes the world grid replace the reference's
    concat + re-dedup, mapper.py:844-847)."""
    B, R, C, P = 2, 16, 16, 2
    grid_key = np.full((B, R, C), -np.inf, np.float32)
    grid_payload = np.zeros((B, R, C, P), np.float32)

    all_pts = []
    for _ in range(3):  # three "frames"
        n = 64
        rows = rng.integers(0, R, size=(B, n)).astype(np.int32)
        cols = rng.integers(0, C, size=(B, n)).astype(np.int32)
        keys = rng.normal(size=(B, n)).astype(np.float32)
        payload = rng.normal(size=(B, n, P)).astype(np.float32)
        valid = rng.random((B, n)) > 0.2
        all_pts.append((rows, cols, keys, payload, valid))
        grid_key, grid_payload = jax.tree_util.tree_map(
            np.asarray,
            S.scatter_argmax_grid_update(
                grid_key, grid_payload, rows, cols, keys, payload, valid
            ),
        )

    # brute force over the full stream
    ref_key = np.full((B, R, C), -np.inf, np.float32)
    ref_payload = np.zeros((B, R, C, P), np.float32)
    for rows, cols, keys, payload, valid in all_pts:
        for b in range(B):
            for i in range(rows.shape[1]):
                if not valid[b, i]:
                    continue
                r, c = rows[b, i], cols[b, i]
                if keys[b, i] > ref_key[b, r, c]:
                    ref_key[b, r, c] = keys[b, i]
                    ref_payload[b, r, c] = payload[b, i]

    np.testing.assert_allclose(grid_key, ref_key)
    np.testing.assert_allclose(grid_payload, ref_payload)


def test_rasterize_argmax(rng):
    B, n, R, C = 2, 200, 8, 8
    rows = rng.integers(0, R, size=(B, n)).astype(np.int32)
    cols = rng.integers(0, C, size=(B, n)).astype(np.int32)
    keys = rng.normal(size=(B, n)).astype(np.float32)
    values = rng.integers(1, 13, size=(B, n)).astype(np.uint8)
    valid = rng.random((B, n)) > 0.5

    occ, val = S.rasterize_argmax(rows, cols, keys, values, valid, R, C)
    occ, val = np.asarray(occ), np.asarray(val)

    for b in range(B):
        for r in range(R):
            for c in range(C):
                sel = (rows[b] == r) & (cols[b] == c) & valid[b]
                if sel.any():
                    assert occ[b, r, c] == 1
                    best = np.argmax(np.where(sel, keys[b], -np.inf))
                    assert val[b, r, c] == values[b, best]
                else:
                    assert occ[b, r, c] == 0
                    assert val[b, r, c] == 0


def test_ops_jit_and_vmap_compatible(rng):
    """The ops must trace under jit (static shapes, no python branching)."""
    B, n, R, C = 2, 32, 8, 8
    f = jax.jit(
        lambda *a: S.rasterize_argmax(*a, num_rows=R, num_cols=C)
    )
    occ, val = f(
        rng.integers(0, R, size=(B, n)).astype(np.int32),
        rng.integers(0, C, size=(B, n)).astype(np.int32),
        rng.normal(size=(B, n)).astype(np.float32),
        rng.integers(0, 13, size=(B, n)).astype(np.uint8),
        np.ones((B, n), bool),
    )
    assert occ.shape == (B, R, C)
    assert val.shape == (B, R, C)


def test_rasterize_sorted_all_floor_cell_writes_zero(rng):
    """With a nonzero floor_label, an all-floor cell must still emit 0
    in the semantic map (old two-call semantics: the semantic rasterize
    only saw non-floor points). ADVICE r2 regression."""
    B, R, C = 1, 4, 4
    floor = 7
    rows = np.array([[0, 0, 1]], np.int32)
    cols = np.array([[0, 0, 0]], np.int32)
    heights = np.array([[0.5, 0.9, 0.3]], np.float32)
    labels = np.array([[floor, floor, 3]], np.uint8)  # cell(0,0) all-floor
    valid = np.ones((B, 3), bool)
    occ, sem = S.rasterize_occupancy_semantic_sorted(
        rows, cols, heights, labels, valid, R, C, floor_label=floor
    )
    occ, sem = np.asarray(occ), np.asarray(sem)
    assert occ[0, 0, 0] == 1 and sem[0, 0, 0] == 0  # occupied, label void
    assert occ[0, 1, 0] == 1 and sem[0, 1, 0] == 3  # non-floor winner


def test_merge_compact_variants_identical(rng):
    """merge_points_into_list's "scatter" compaction (cumsum + scatter-
    set) must produce the exact same list as the "sort" path, including
    pads-as-LIST_EMPTY cells and the fill count, across random merges."""
    import jax.numpy as jnp

    b, m, n = 3, 32, 24
    lcell = np.full((b, m), S.LIST_EMPTY, np.int32)
    lkey = np.full((b, m), S.EMPTY_KEY, np.int32)
    laux = np.zeros((b, m), np.uint32)
    args_sort = (jnp.asarray(lcell), jnp.asarray(lkey), jnp.asarray(laux))
    args_scat = (jnp.asarray(lcell), jnp.asarray(lkey), jnp.asarray(laux))
    for step in range(4):
        cells = rng.integers(0, 40, size=(b, n)).astype(np.int32)
        keys = rng.normal(size=(b, n)).astype(np.float32)
        aux = rng.integers(0, 2**32, size=(b, n), dtype=np.uint64).astype(
            np.uint32
        )
        valid = rng.random((b, n)) > 0.3
        out_sort = S.merge_points_into_list(
            *args_sort, jnp.asarray(cells), jnp.asarray(keys),
            jnp.asarray(aux), jnp.asarray(valid), compact="sort",
        )
        out_scat = S.merge_points_into_list(
            *args_scat, jnp.asarray(cells), jnp.asarray(keys),
            jnp.asarray(aux), jnp.asarray(valid), compact="scatter",
        )
        fill = np.asarray(out_sort[3])
        np.testing.assert_array_equal(fill, np.asarray(out_scat[3]))
        np.testing.assert_array_equal(
            np.asarray(out_sort[0]), np.asarray(out_scat[0])
        )
        for lane in range(b):
            f = fill[lane]
            np.testing.assert_array_equal(
                np.asarray(out_sort[1])[lane, :f],
                np.asarray(out_scat[1])[lane, :f],
            )
            np.testing.assert_array_equal(
                np.asarray(out_sort[2])[lane, :f],
                np.asarray(out_scat[2])[lane, :f],
            )
        args_sort = out_sort[:3]
        args_scat = out_scat[:3]


def test_merge_compact_variants_same_overflow_rule(rng):
    """On overflow both variants keep the M lowest cell ids."""
    import jax.numpy as jnp

    b, m, n = 1, 8, 16
    lcell = jnp.full((b, m), S.LIST_EMPTY, jnp.int32)
    lkey = jnp.full((b, m), S.EMPTY_KEY, jnp.int32)
    laux = jnp.zeros((b, m), jnp.uint32)
    cells = jnp.asarray(np.arange(n, dtype=np.int32)[None] * 3)  # 16 unique
    keys = jnp.asarray(rng.normal(size=(b, n)).astype(np.float32))
    aux = jnp.asarray(
        rng.integers(0, 2**31, size=(b, n)).astype(np.uint32)
    )
    valid = jnp.ones((b, n), bool)
    outs = {}
    for compact in ("sort", "scatter"):
        c2, k2, a2, fill = S.merge_points_into_list(
            lcell, lkey, laux, cells, keys, aux, valid, compact=compact
        )
        assert int(fill[0]) == n  # reported pre-truncation
        np.testing.assert_array_equal(
            np.asarray(c2[0]), np.arange(m) * 3  # lowest m cells kept
        )
        outs[compact] = (np.asarray(k2), np.asarray(a2))
    np.testing.assert_array_equal(outs["sort"][0], outs["scatter"][0])
    np.testing.assert_array_equal(outs["sort"][1], outs["scatter"][1])


def test_rasterize_compact_variants_identical(rng):
    """rasterize_occupancy_semantic_sorted: "scatter" winner compaction
    must reproduce the "sort" path's maps exactly (incl. floor cells)."""
    import jax.numpy as jnp

    b, n, r, c = 2, 400, 5, 5  # n >> r*c so the compaction path engages
    rows = rng.integers(0, r, size=(b, n)).astype(np.int32)
    cols = rng.integers(0, c, size=(b, n)).astype(np.int32)
    heights = rng.normal(size=(b, n)).astype(np.float32)
    labels = rng.integers(0, 5, size=(b, n)).astype(np.uint8)
    valid = rng.random((b, n)) > 0.2
    out = {}
    for compact in ("sort", "scatter"):
        occ, sem = S.rasterize_occupancy_semantic_sorted(
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(heights),
            jnp.asarray(labels), jnp.asarray(valid), r, c,
            floor_label=0, compact=compact,
        )
        out[compact] = (np.asarray(occ), np.asarray(sem))
    np.testing.assert_array_equal(out["sort"][0], out["scatter"][0])
    np.testing.assert_array_equal(out["sort"][1], out["scatter"][1])
