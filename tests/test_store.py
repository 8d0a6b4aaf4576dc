"""Trajectory store + native DTW tests (serialization round trips,
SURVEY.md section 4.4)."""

import os

import numpy as np
import pytest

from ivlnce_tpu.trainers.trajectory_store import (
    TrajectoryStore,
    _PyStore,
    packb,
    unpackb,
)


def test_msgpack_numpy_round_trip(rng):
    obj = [
        {
            "depth_features": rng.normal(size=(7, 192, 4, 4)).astype(
                np.float16
            ),
            "instruction": rng.integers(0, 2504, (7, 200)),
            "occupancy_map": rng.integers(0, 2, (7, 64, 64)).astype(np.uint8),
        },
        np.arange(7, dtype=np.int64),
        np.arange(7, dtype=np.int64) * 2,
    ]
    out = unpackb(packb(obj))
    np.testing.assert_array_equal(
        out[0]["depth_features"], obj[0]["depth_features"]
    )
    np.testing.assert_array_equal(out[1], obj[1])
    assert out[0]["occupancy_map"].dtype == np.uint8


def test_store_round_trip_and_reopen(tmp_path, rng):
    path = str(tmp_path / "trajectories.lmdb")
    with TrajectoryStore(path, writable=True) as store:
        for i in range(20):
            store.put(i, {"x": rng.normal(size=(3,)), "i": i})
        store.sync()
        assert store.count() == 20

    with TrajectoryStore(path, writable=False) as store:
        assert store.count() == 20
        assert store.get(7)["i"] == 7
        assert 19 in store and 20 not in store
        with pytest.raises(KeyError):
            store.get(99)


def test_store_last_write_wins_and_refresh(tmp_path):
    path = str(tmp_path / "t.lmdb")
    w = TrajectoryStore(path, writable=True)
    w.put("k", 1)
    w.sync()
    r = TrajectoryStore(path, writable=False)
    assert r.get("k") == 1
    w.put("k", 2)
    w.sync()
    r.refresh()
    assert r.get("k") == 2
    w.close()
    r.close()


def test_python_engine_reads_native_file(tmp_path):
    path = str(tmp_path / "t.lmdb")
    with TrajectoryStore(path, writable=True) as w:
        w.put("a", [1, 2, 3])
        w.sync()
        file_path = w.path
    py = _PyStore(file_path, writable=False)
    assert unpackb(py.get(b"a")) == [1, 2, 3]
    py.close()


def test_drop(tmp_path):
    path = str(tmp_path / "t.lmdb")
    with TrajectoryStore(path, writable=True) as w:
        w.put("a", 1)
    TrajectoryStore.drop(path)
    with TrajectoryStore(path, writable=True) as w:
        assert w.count() == 0


def test_native_dtw_matches_numpy(rng):
    from ivlnce_tpu import native
    from ivlnce_tpu.tasks.tour_ndtw import (
        _windowed_dtw_dispatch,
        window_from_alignments,
    )
    from ivlnce_tpu.tasks.dtw import windowed_dtw

    lib = native.dtw_library()
    if lib is None:
        pytest.skip("no native toolchain")

    n, m = 40, 55
    ap = rng.normal(size=(n, 3))
    gtp = rng.normal(size=(m, 3))
    aligns = [(10, 13), (11, 14), (30, 40)]
    got = _windowed_dtw_dispatch(list(ap), list(gtp), aligns)
    window = window_from_alignments(n, m, aligns)
    ref = windowed_dtw(ap, gtp, window)
    assert got == pytest.approx(ref, rel=1e-9)
