"""Prefetch iterator + vector-env async stepping."""

import time

import numpy as np
import pytest

from ivlnce_tpu.utils.prefetch import PrefetchIterator, prefetch


def test_prefetch_preserves_order_and_values():
    items = list(range(57))
    assert list(prefetch(iter(items), depth=4)) == items


def test_prefetch_propagates_exceptions():
    def gen():
        yield 1
        yield 2
        raise ValueError("decode failed")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="decode failed"):
        next(it)


def test_prefetch_overlaps_production():
    """Producer runs ahead while the consumer is busy."""
    produced = []

    def gen():
        for i in range(4):
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=3)
    first = next(it)
    time.sleep(0.2)  # consumer "trains"; producer should fill the queue
    assert first == 0
    assert len(produced) == 4  # all items decoded ahead


def test_prefetch_close_stops_producer():
    def gen():
        for i in range(10_000):
            yield i

    it = PrefetchIterator(gen(), depth=2)
    next(it)
    it.close()  # must not hang


@pytest.mark.parametrize("use_processes", [False, True])
def test_vector_env_step_async_wait(use_processes, monkeypatch):
    """step_async/step_wait equals step, over BOTH transports — including
    the real multiprocess pipe protocol (VERDICT item 4c)."""
    import os

    import ivlnce_tpu.envs.env  # noqa: F401 — registry side effects
    from ivlnce_tpu.config import get_config
    from ivlnce_tpu.envs.vector_env import construct_envs
    from ivlnce_tpu.utils.registry import registry

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.chdir(repo)
    config = get_config("configs/fake/map_cma_eval_episodic.yaml").clone()
    config.defrost()
    config.NUM_ENVIRONMENTS = 2
    config.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT = 32
    config.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH = 32
    config.TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT = 32
    config.TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH = 32
    config.freeze()
    env_class = registry.get_env(config.ENV_NAME)
    envs = construct_envs(
        config, env_class, use_processes=use_processes
    )
    try:
        obs = envs.reset()
        assert len(obs) == 2
        envs.step_async([1, 2])
        outputs = envs.step_wait()
        assert len(outputs) == 2
        obs0 = outputs[0][0]
        assert "depth" in obs0
        outputs2 = envs.step([1, 1])
        assert len(outputs2) == len(outputs)
    finally:
        envs.close()


def test_prefetch_abandoned_consumer_releases_producer():
    """Breaking out of the consumer loop must not leave the producer
    blocked on a full queue forever (ADVICE r2)."""
    import threading
    import time

    from ivlnce_tpu.utils.prefetch import prefetch

    started = threading.active_count()
    with prefetch(iter(range(10_000)), depth=1) as it:
        for x in it:
            if x >= 2:
                break
    deadline = time.time() + 5.0
    while threading.active_count() > started and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= started


# -- multi-process decode (ProcessWindowIterator + batches_parallel) ---------
def _square_range(task):
    lo, hi = task
    return [i * i for i in range(lo, hi)]


def _boom(task):
    if task == 2:
        raise ValueError("boom")
    return [task]


def test_process_windows_ordered_across_workers():
    from ivlnce_tpu.utils.prefetch import ProcessWindowIterator

    tasks = [(i * 3, i * 3 + 3) for i in range(5)]
    with ProcessWindowIterator(_square_range, tasks, workers=2) as it:
        got = list(it)
    assert got == [i * i for i in range(15)]  # flattened, task order


def test_process_windows_propagates_worker_errors():
    import pytest

    from ivlnce_tpu.utils.prefetch import ProcessWindowIterator

    with ProcessWindowIterator(_boom, [0, 1, 2, 3], workers=2) as it:
        with pytest.raises(ValueError, match="boom"):
            list(it)


def test_dataset_parallel_batches_match_serial_coverage(tmp_path):
    """batches_parallel must deliver the same epoch: same batch count,
    same padded shapes discipline, and the same multiset of oracle-action
    trajectories as the serial path (ordering may differ — the reference
    DataLoader's worker sharding has the same property)."""
    import numpy as np

    from ivlnce_tpu.trainers.dagger_trainer import IWTrajectoryDataset
    from ivlnce_tpu.trainers.trajectory_store import TrajectoryStore

    path = str(tmp_path / "traj.lmdb")
    rng = np.random.default_rng(0)
    with TrajectoryStore(path, writable=True) as store:
        for i in range(12):
            t = int(rng.integers(3, 9))
            obs = {"depth_features": rng.normal(size=(t, 4)).astype(np.float32)}
            prev = rng.integers(0, 4, size=(t,)).astype(np.int64)
            oracle = np.full((t,), i, np.int64)  # traceable per-episode tag
            store.put(i, (obs, prev, oracle))
        store.sync()

    def signature(batches):
        sigs = []
        n = 0
        for obs, prev, masks, corrected, weights in batches:
            n += 1
            b = prev.shape[0] if prev.ndim == 2 else 2
            # corrected is T-major flattened; recover per-sample tags
            sigs.extend(sorted(np.unique(corrected).tolist()))
        return n, sorted(sigs)

    ds = IWTrajectoryDataset(path, use_iw=True, batch_size=2)
    serial = signature(ds.batches())
    with ds.batches_parallel(workers=2) as it:
        par = signature(it)
    assert par == serial


class _Unpicklable(Exception):
    def __init__(self):
        super().__init__("nope")
        self.fh = open(__file__)  # file handles don't pickle


def _raise_unpicklable(task):
    if task == 1:
        raise _Unpicklable()
    return [task]


def _die_hard(task):
    if task == 1:
        import os
        import signal

        os.kill(os.getpid(), signal.SIGKILL)
    return [task]


def test_process_windows_unpicklable_error_still_propagates():
    import pytest

    from ivlnce_tpu.utils.prefetch import ProcessWindowIterator

    with ProcessWindowIterator(_raise_unpicklable, [0, 1], workers=1) as it:
        with pytest.raises(RuntimeError, match="_Unpicklable"):
            list(it)


def test_process_windows_detects_killed_worker():
    """A worker killed without delivering (OOM/segfault class) must fail
    the consumer with a diagnostic instead of hanging forever."""
    import pytest

    from ivlnce_tpu.utils.prefetch import ProcessWindowIterator

    with ProcessWindowIterator(_die_hard, [0, 1], workers=1) as it:
        with pytest.raises(RuntimeError, match="died"):
            list(it)
