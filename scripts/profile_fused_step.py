#!/usr/bin/env python3
"""On-chip phase breakdown of the fused MapCMA env step (perf tuning).

Splits the fused step (bench.py's operating point) into separately jitted,
separately timed phases so BASELINE.md's cost table can name the dominant
cost at any lane count:

    A  accumulate: geometry + pack + frame merge into the compact list
    B  flush: compact list -> dense world grid (amortized)
    C  rasterize: window slice + list merge + egocentric maps
    D  encoders+policy: depth ResNet (bf16) + map CNN + CMA GRU + action
    F  full fused step (all of the above in ONE executable)

Unlike bench.py, the observation stream MOVES: poses advance along a
straight walk and the depth pattern cycles, so the compact list grows and
flushes fire at a realistic cadence (a static frame would never flush and
the list merge would see a constant fill).

Usage:
    python scripts/profile_fused_step.py [--lanes 768] [--iters 30]
        [--list-capacity 131072 ...]    # sweeps each capacity
        [--phases]                      # also time A/B/C/D separately

One line per measurement to stderr; a final JSON summary to stdout.
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEPTH_HW = 256
MAP_HW = 64
TOKENS = 80


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build(b, list_capacity, steps_pool=8, compact="sort", grid=1024):
    import jax
    import jax.numpy as jnp

    from ivlnce_tpu.config import get_config
    from ivlnce_tpu.mapping import camera as cam
    from ivlnce_tpu.mapping import mapper as M
    from ivlnce_tpu.models import instruction_encoder as IE
    from ivlnce_tpu.models.policy import MapCMAPolicy

    config = get_config().clone()
    config.defrost()
    config.MODEL.policy_name = "MapCMAPolicy"
    config.TPU.compute_dtype = "bfloat16"
    config.freeze()
    policy = MapCMAPolicy.from_config(
        config, {"depth_hw": DEPTH_HW, "map_hw": MAP_HW}
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = policy.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(params)

    mp = M.MapperParams(
        camera=cam.CameraParameters(
            vertical_fov_radians=cam.vertical_fov_radians(
                90.0, DEPTH_HW, DEPTH_HW
            ),
            features_spatial_dimensions=(DEPTH_HW, DEPTH_HW),
            height_clip=0.1,
        ),
        map_height_meters=6.4,
        map_width_meters=6.4,
        resolution_meters=0.1,
        grid_cells=grid,
        window_cells=192,
        list_capacity=list_capacity,
        compact=compact,
    )
    mstate = M.init_state(b, mp.grid_cells, mp.list_capacity)

    rng = np.random.default_rng(0)
    # a pool of depth/semantic frames + poses advancing 0.25 m/step:
    # every step contributes new unique world cells like a real walk
    pool = []
    for i in range(steps_pool):
        depth = jnp.asarray(
            rng.random((b, DEPTH_HW, DEPTH_HW, 1), np.float32) * 0.5 + 0.05
        )
        semantics = jnp.asarray(
            rng.integers(0, 14, size=(b, DEPTH_HW, DEPTH_HW)).astype(np.uint8)
        )
        pose = jnp.asarray(
            np.stack(
                [
                    rng.normal(size=b).astype(np.float32) * 2 + 0.25 * i,
                    np.zeros(b, np.float32),
                    rng.normal(size=b).astype(np.float32) * 2,
                ],
                axis=1,
            )
        )
        heading = jnp.asarray(rng.random(b).astype(np.float32) * 6.28)
        pool.append((depth, semantics, pose, heading))

    tokens = jnp.asarray(
        np.concatenate(
            [
                rng.integers(1, 2000, size=(b, TOKENS // 2)),
                np.zeros((b, TOKENS - TOKENS // 2), np.int64),
            ],
            axis=1,
        ).astype(np.int32)
    )
    ie_cfg = policy.model_config.INSTRUCTION_ENCODER
    txt = jax.jit(
        lambda p, t: IE.apply_instruction_encoder(
            p["instruction_encoder"], ie_cfg, {"instruction": t}
        )
    )(params, tokens)

    elevation = jnp.zeros((b,), jnp.float32)
    masks1 = jnp.ones((b,), jnp.float32)
    masks2 = jnp.ones((b, 1), jnp.float32)
    rnn0 = policy.initial_rnn_states(b)
    prev0 = jnp.zeros((b, 1), jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def full_step(params, mstate, rnn, prev, depth, semantics, pose, heading):
        mstate, occ, sem_map = M.mapper_step(
            mp, mstate, depth, semantics, pose, elevation, heading, masks1
        )
        pobs = {
            "depth": depth,
            "instruction_features": txt,
            "occupancy_map": occ,
            "semantic_map": sem_map,
        }
        out = policy.act(params, pobs, rnn, prev, masks2, deterministic=True)
        return mstate, out.rnn_states, out.actions

    @functools.partial(jax.jit, donate_argnums=(0,))
    def accumulate_only(mstate, depth, semantics, pose, heading):
        return M._accumulate_frame(
            mp, mstate, depth[..., 0], semantics, pose, elevation, heading
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def flush_only(mstate):
        return M._flush_list(mstate)

    @jax.jit
    def rasterize_only(mstate, pose, heading):
        return M._rasterize_egocentric(mp, mstate, pose, heading)

    @jax.jit
    def policy_only(params, rnn, prev, depth, occ, sem_map):
        pobs = {
            "depth": depth,
            "instruction_features": txt,
            "occupancy_map": occ,
            "semantic_map": sem_map,
        }
        out = policy.act(params, pobs, rnn, prev, masks2, deterministic=True)
        return out.rnn_states, out.actions

    return dict(
        jax=jax, mp=mp, mstate=mstate, params=params, pool=pool,
        rnn0=rnn0, prev0=prev0,
        full_step=full_step, accumulate_only=accumulate_only,
        flush_only=flush_only, rasterize_only=rasterize_only,
        policy_only=policy_only,
    )


def time_loop(fn_step, sync, iters, warmup, label):
    for _ in range(warmup):
        fn_step()
    sync()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn_step()
    sync()
    dt = (time.perf_counter() - t0) / iters
    log(f"{label}: {dt * 1000:.1f} ms/step-batch")
    return dt


def run(b, list_capacity, iters, warmup, phases, compact="sort", grid=1024):
    ctx = build(b, list_capacity, compact=compact, grid=grid)
    pool = ctx["pool"]
    res = {
        "lanes": b, "list_capacity": list_capacity, "compact": compact,
        "grid": grid,
    }

    state = {
        "m": ctx["mstate"], "rnn": ctx["rnn0"], "prev": ctx["prev0"], "i": 0
    }

    def full():
        d, s, p, h = pool[state["i"] % len(pool)]
        state["i"] += 1
        state["m"], state["rnn"], state["prev"] = ctx["full_step"](
            ctx["params"], state["m"], state["rnn"], state["prev"],
            d, s, p, h,
        )

    def sync():
        np.asarray(state["prev"][0, 0])

    t0 = time.time()
    full()
    sync()
    log(
        f"B={b} M={list_capacity} {compact} compile+first: "
        f"{time.time() - t0:.1f}s"
    )
    dt = time_loop(
        full, sync, iters, warmup,
        f"F full (B={b} M={list_capacity} {compact})",
    )
    res["full_ms"] = dt * 1000
    res["steps_per_sec"] = b / dt

    if phases:
        # fresh state per phase; accumulate a few frames first so the
        # list has realistic fill for rasterize/flush. FREE the
        # full-step state first — two live B-lane grid states OOM'd the
        # chip at B=768 (r4 session)
        from ivlnce_tpu.mapping import mapper as M

        state["m"] = None
        mst = M.init_state(b, ctx["mp"].grid_cells, list_capacity)
        for i in range(4):
            d, s, p, h = pool[i % len(pool)]
            mst = ctx["accumulate_only"](mst, d, s, p, h)
        fill = int(np.asarray(mst.fill).max())
        log(f"list fill after 4 frames: {fill}")
        res["fill_after_4"] = fill

        holder = {"m": mst, "i": 0}

        def acc():
            d, s, p, h = pool[holder["i"] % len(pool)]
            holder["i"] += 1
            holder["m"] = ctx["accumulate_only"](holder["m"], d, s, p, h)

        def sync_acc():
            np.asarray(holder["m"].fill[0])

        res["accumulate_ms"] = time_loop(
            acc, sync_acc, iters, warmup, "A accumulate"
        ) * 1000

        # rasterize over the accumulated state (non-donated)
        out = {}

        def rast():
            d, s, p, h = pool[holder["i"] % len(pool)]
            holder["i"] += 1
            out["occ"], out["sem"] = ctx["rasterize_only"](holder["m"], p, h)

        def sync_rast():
            np.asarray(out["occ"][0, 0, 0])

        res["rasterize_ms"] = time_loop(
            rast, sync_rast, iters, warmup, "C rasterize"
        ) * 1000

        # flush (donated: re-feed its own output)
        def flush():
            holder["m"] = ctx["flush_only"](holder["m"])

        res["flush_ms"] = time_loop(
            flush, sync_acc, max(3, iters // 3), 2, "B flush"
        ) * 1000

        d0, s0, p0, h0 = pool[0]
        occ, sem = out.get("occ"), out.get("sem")
        pol = {"rnn": ctx["rnn0"], "prev": ctx["prev0"]}

        def poli():
            pol["rnn"], pol["prev"] = ctx["policy_only"](
                ctx["params"], pol["rnn"], pol["prev"], d0, occ, sem
            )

        def sync_pol():
            np.asarray(pol["prev"][0, 0])

        res["policy_ms"] = time_loop(
            poli, sync_pol, iters, warmup, "D encoders+policy"
        ) * 1000

    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=768)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=15)
    ap.add_argument(
        "--list-capacity", type=int, nargs="+", default=[131072]
    )
    ap.add_argument(
        "--compact", nargs="+", default=["sort"],
        choices=["sort", "scatter"],
    )
    ap.add_argument(
        "--grid", type=int, nargs="+", default=[1024],
        help="world grid side(s) in half-res cells; sweeps each "
        "(the A/B for scene-sized auto grids, BASELINE.md r4)",
    )
    ap.add_argument("--phases", action="store_true")
    args = ap.parse_args()

    from ivlnce_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax

    log(f"device: {jax.devices()[0].device_kind}")

    results = []
    for grid in args.grid:
        for compact in args.compact:
            for m in args.list_capacity:
                results.append(
                    run(
                        args.lanes, m, args.iters, args.warmup,
                        args.phases, compact=compact, grid=grid,
                    )
                )
                print(json.dumps(results[-1]), file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
