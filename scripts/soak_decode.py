"""Production-scale data-path soak (VERDICT r4 item #8).

Generates a synthetic trajectory store at DAgger-collection scale with
realistic MapCMA map-mode record shapes (reference stores ~157k episodes
for the episodic-aug run, dagger_trainer.py:568-576 feeds them through
3-4 DataLoader workers), then measures IWTrajectoryDataset decode
throughput serial (workers=0) and through the process decode pool
(IL.decode_workers equivalent), asserting the pipeline's ordering
invariants along the way:

- every stored episode is consumed exactly once per epoch (minus the
  documented drop_last tail),
- batches are T-homogeneous (the length-sort-within-window recipe,
  dagger_trainer.py:196-216): padding waste stays far below random
  batching,
- the parallel path is deterministic given the seed (task round-robin
  ordering, utils/prefetch.ProcessWindowIterator).

Usage:
    python scripts/soak_decode.py --episodes 10000 --workers 0 2 4

The store is cached under data/soak_store_<episodes>; --regen rebuilds.
Records mimic a map-mode collection with IL.DAGGER.lmdb_fp16: per step
instruction (200,) i64, depth_features (128,4,4) f16, occupancy_map +
semantic_map (64,64) u8 each, progress (1,) f16 — ~14 kB/step, T~55.
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ivlnce_tpu.trainers.dagger_trainer import IWTrajectoryDataset  # noqa: E402
from ivlnce_tpu.trainers.trajectory_store import TrajectoryStore  # noqa: E402


def make_store(path: str, episodes: int, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    t0 = time.time()
    store = TrajectoryStore(path, writable=True)
    total_steps = 0
    for ep in range(episodes):
        t = int(np.clip(rng.normal(55, 20), 8, 200))
        total_steps += t
        # ep id rides in a dedicated obs key so batches can be audited
        # end-to-end (collate stacks it like any sensor)
        obs = {
            "ep_id": np.full((t, 1), ep, np.int64),
            "instruction": rng.integers(0, 2500, (t, 200)).astype(np.int64),
            "depth_features": rng.standard_normal(
                (t, 128, 4, 4), dtype=np.float32
            ).astype(np.float16),
            "occupancy_map": rng.integers(0, 3, (t, 64, 64)).astype(np.uint8),
            "semantic_map": rng.integers(0, 13, (t, 64, 64)).astype(np.uint8),
            "progress": rng.random((t, 1), dtype=np.float32).astype(
                np.float16
            ),
        }
        prev = rng.integers(0, 4, (t,)).astype(np.int64)
        oracle = rng.integers(0, 4, (t,)).astype(np.int64)
        store.put(ep, [obs, prev, oracle])
        if (ep + 1) % 2000 == 0:
            store.sync()
            print(
                f"  wrote {ep + 1}/{episodes} episodes "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
    store.sync()
    store.close()
    size_mb = sum(
        os.path.getsize(os.path.join(path, f)) for f in os.listdir(path)
    ) / 1e6
    print(
        f"store: {episodes} episodes, {total_steps} steps, "
        f"{size_mb:.0f} MB on disk, built in {time.time() - t0:.0f}s"
    )


def _audit_batch(batch, batch_size: int):
    """Return (episode ids, T, padding waste fraction) for one batch."""
    obs, prev_actions, not_done, corrected, weights = batch
    tn = obs["ep_id"].shape[0]
    t = tn // batch_size
    ep_ids = obs["ep_id"].reshape(t, batch_size, -1)[0, :, 0]
    # actual lengths: not_done_masks marks step 0 of each episode only;
    # recover real T from the weights padding (padded steps carry the
    # fill, but corrected/weights pad with 0 -> count nonzero weights)
    real = (weights.reshape(t, batch_size) != 0).sum(0)
    waste = 1.0 - float(real.sum()) / float(t * batch_size)
    return ep_ids, t, waste


def run_epoch(store_path: str, batch_size: int, workers: int, seed: int):
    random.seed(seed)
    ds = IWTrajectoryDataset(
        store_path, use_iw=True, inflection_weight_coef=3.2,
        batch_size=batch_size,
    )
    t0 = time.time()
    n_batches = 0
    steps = 0
    seen: list = []
    wastes = []
    it = ds.batches() if workers == 0 else ds.batches_parallel(workers)
    try:
        for batch in it:
            ep_ids, t, waste = _audit_batch(batch, batch_size)
            seen.extend(int(e) for e in ep_ids)
            wastes.append(waste)
            n_batches += 1
            steps += t * batch_size
    finally:
        if hasattr(it, "close"):
            it.close()
    dt = time.time() - t0
    return {
        "workers": workers,
        "batches": n_batches,
        "episodes": len(seen),
        "steps": steps,
        "seconds": dt,
        "eps_per_s": len(seen) / dt,
        "steps_per_s": steps / dt,
        "pad_waste": float(np.mean(wastes)),
        "seen": seen,
        "length": ds.length,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=10000)
    ap.add_argument("--batch-size", type=int, default=5)
    ap.add_argument("--workers", type=int, nargs="+", default=[0, 2, 4])
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--regen", action="store_true")
    args = ap.parse_args()

    path = os.path.join(REPO, "data", f"soak_store_{args.episodes}")
    if args.regen or not os.path.isdir(path):
        os.makedirs(path, exist_ok=True)
        make_store(path, args.episodes, seed=args.seed)

    results = []
    for w in args.workers:
        r = run_epoch(path, args.batch_size, w, seed=args.seed)
        results.append(r)
        # invariants ------------------------------------------------------
        # exactly-once consumption modulo the documented drop_last tails:
        # serial drops < batch_size at epoch end; parallel drops
        # < batch_size per preload window (same recipe as the reference
        # DataLoader's per-worker drop_last)
        n_windows = -(-args.episodes // (args.batch_size * 100))
        max_dropped = args.batch_size - 1 if w == 0 else (
            n_windows * (args.batch_size - 1)
        )
        dropped = r["length"] - r["episodes"]
        assert 0 <= dropped <= max_dropped, (dropped, max_dropped)
        assert len(set(r["seen"])) == r["episodes"], "duplicate episodes"
        # T-homogeneous batches keep padding waste low
        assert r["pad_waste"] < 0.15, r["pad_waste"]
        print(
            f"workers={w}: {r['episodes']} eps in {r['seconds']:.1f}s = "
            f"{r['eps_per_s']:.1f} eps/s, {r['steps_per_s']:.0f} steps/s, "
            f"pad waste {r['pad_waste'] * 100:.1f}%, "
            f"dropped {dropped} (cap {max_dropped})",
            flush=True,
        )

    # determinism of the parallel path given the seed
    for w in args.workers:
        if w > 0:
            again = run_epoch(path, args.batch_size, w, seed=args.seed)
            assert again["seen"] == next(
                r for r in results if r["workers"] == w
            )["seen"], f"workers={w} epoch order is not seed-deterministic"
            print(f"workers={w}: seed-deterministic order OK", flush=True)

    best = max(results, key=lambda r: r["eps_per_s"])
    print(
        "\nfeed-the-chip check: the train step consumes "
        f"{args.batch_size} eps/step; decode at {best['eps_per_s']:.1f} "
        f"eps/s (workers={best['workers']}) keeps the chip fed for any "
        f"train step slower than "
        f"{1000 * args.batch_size / best['eps_per_s']:.1f} ms"
    )


if __name__ == "__main__":
    main()
