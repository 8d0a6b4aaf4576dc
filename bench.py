#!/usr/bin/env python3
"""Headline benchmark: MapCMA observation->action pipeline steps/sec/chip.

Measures the full per-env-step device pipeline of the flagship model
(reference call stack SURVEY.md section 3.3): depth frame -> pointcloud ->
world-grid scatter-argmax -> egocentric occupancy+semantic rasterize ->
DDPPO depth ResNet -> map CNN -> CMA GRU policy -> action, with the
instruction bi-LSTM cached per episode exactly as the trainers do
(base_trainer._cache_instruction_features) — it is re-encoded only at
episode boundaries, so it is not part of the per-step executable.

``vs_baseline`` compares against the same architecture implemented with
torch.nn modules (the reference's stack: torch conv/LSTM/GRU + a
scatter_reduce(amax) world-grid mapper with real extrinsics + egocentric
window rasterization) run in this image. Torch here is CPU-only, so the
ratio is TPU-chip vs host-CPU; the reference's own GPU numbers are not
reproducible in this environment (BASELINE.md).

Measurement discipline (learned the hard way on the axon tunnel):
- executables warm up server-side over the first ~30-80 executions
  (lazy compile); timed windows start only after a long warmup;
- the headline is the MEDIAN of several trials with the spread reported
  (best-of-N overstated round 1; BENCH_r01 vs local runs disagreed 5x);
- lane count is auto-selected from a short sweep (throughput/chip is the
  metric, so the throughput-optimal batch is the right operating point);
- an MFU estimate comes from XLA's cost analysis over the fused step.

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

DEPTH_HW = 256
MAP_HW = 64
TOKENS = 80
# world grid side per lane (half-res cells, 8 bytes/cell of HBM). The
# framework auto-sizes this from the dataset's scene geometry
# (mapping/scene_bounds.py, TPU.world_grid_cells=0); the bench mirrors
# that with a scene-sized 512-cell grid (25.6 m — the synthetic walk
# stays within ~12 m of each lane's start; the run asserts ZERO dropped
# points, so the map content is identical to a 1024 grid). 512 costs
# 2 MB/lane vs 8.4, unlocking the 1024-lane sweep point.
GRID_CELLS = int(os.environ.get("IVLNCE_BENCH_GRID", "512"))
# historically-best first: the wall-clock budget cuts the tail
SWEEP_LANES = (1024, 768, 512, 384, 256)
SWEEP_ITERS = 10
WARMUP = 40
# long trials + median of 7: the tunnel's throughput wanders on ~minute
# timescales, so 30-iter windows showed 30% spread where 50-iter
# windows at the same operating point are far tighter. The reported
# spread drops the single fastest and slowest trial (documented in the
# unit string): a one-off transport stall says nothing about the chip.
TRIAL_ITERS = 50
TRIALS = 7
TORCH_B = 16
TORCH_ITERS = 8

# bf16 peak FLOP/s per chip by device kind (MXU); fallback conservative
PEAK_BF16 = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# Last-good sidecar: when the axon tunnel is down for an entire round
# (observed 2026-08-17, 6+ h outage — BENCH_r03.json is an error record),
# the driver should receive the most recent real measurement marked
# stale, not value 0.0 with no memory.
LAST_GOOD_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data", "bench_last_good.json"
)


def _save_last_good(record: dict) -> None:
    try:
        meta = dict(record)
        meta["measured_at_unix"] = time.time()
        meta["measured_at"] = time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
        )
        try:
            import subprocess

            meta["git_commit"] = (
                subprocess.run(
                    ["git", "rev-parse", "--short", "HEAD"],
                    capture_output=True,
                    timeout=10,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                )
                .stdout.decode()
                .strip()
                or None
            )
        except Exception:
            meta["git_commit"] = None
        os.makedirs(os.path.dirname(LAST_GOOD_PATH), exist_ok=True)
        tmp = LAST_GOOD_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, LAST_GOOD_PATH)
    except Exception as e:  # never let bookkeeping break the bench
        log(f"last-good save failed: {e}")


def _load_last_good() -> "dict | None":
    try:
        with open(LAST_GOOD_PATH) as f:
            return json.load(f)
    except Exception:
        return None


# -----------------------------------------------------------------------------
# TPU pipeline
# -----------------------------------------------------------------------------
class TpuPipeline:
    def __init__(self):
        import jax

        from ivlnce_tpu.utils.jax_setup import setup_jax

        setup_jax()
        self.jax = jax
        self.device_kind = jax.devices()[0].device_kind

        from ivlnce_tpu.config import get_config
        from ivlnce_tpu.models.policy import MapCMAPolicy

        config = get_config().clone()
        config.defrost()
        config.MODEL.policy_name = "MapCMAPolicy"
        # bf16 conv encoders (frozen at eval): rides the MXU
        config.TPU.compute_dtype = "bfloat16"
        config.freeze()
        self.policy = MapCMAPolicy.from_config(
            config, {"depth_hw": DEPTH_HW, "map_hw": MAP_HW}
        )
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params = self.policy.init_params(jax.random.PRNGKey(0))
        self.params = jax.device_put(params)
        self._flops = None

    def build(self, b):
        import jax
        import jax.numpy as jnp

        from ivlnce_tpu.mapping import camera as cam
        from ivlnce_tpu.mapping import mapper as M
        from ivlnce_tpu.models import instruction_encoder as IE

        policy = self.policy
        params = self.params
        rng = np.random.default_rng(0)
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
            grid_cells=GRID_CELLS,
            window_cells=192,
        )
        mstate = M.init_state(b, mp.grid_cells)
        obs = dict(
            depth=jnp.asarray(
                rng.random((b, DEPTH_HW, DEPTH_HW, 1), np.float32) * 0.5
                + 0.05
            ),
            semantics=jnp.asarray(
                rng.integers(0, 14, size=(b, DEPTH_HW, DEPTH_HW)).astype(
                    np.uint8
                )
            ),
            pose=jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32) * 2),
            elevation=jnp.zeros((b,), jnp.float32),
            heading=jnp.asarray(rng.random((b,)).astype(np.float32) * 6.28),
        )
        tokens = jnp.asarray(
            np.concatenate(
                [
                    rng.integers(1, 2000, size=(b, TOKENS // 2)),
                    np.zeros((b, TOKENS - TOKENS // 2), np.int64),
                ],
                axis=1,
            ).astype(np.int32)
        )
        # per-episode instruction features (cached out of the hot step,
        # as in base_trainer._cache_instruction_features)
        ie_cfg = policy.model_config.INSTRUCTION_ENCODER
        txt = jax.jit(
            lambda p, t: IE.apply_instruction_encoder(
                p["instruction_encoder"], ie_cfg, {"instruction": t}
            )
        )(params, tokens)
        obs["instruction_features"] = txt

        import functools

        # donate the mapper state: in-place grid updates halve peak HBM
        # (the two-level flush would otherwise double-buffer the big grid)
        @functools.partial(jax.jit, donate_argnums=(1,))
        def fused_step(params, mstate, rnn, prev, obs, masks1, masks2):
            mstate, occ, sem_map = M.mapper_step(
                mp, mstate, obs["depth"], obs["semantics"], obs["pose"],
                obs["elevation"], obs["heading"], masks1,
            )
            pobs = {
                "depth": obs["depth"],
                "instruction_features": obs["instruction_features"],
                "occupancy_map": occ,
                "semantic_map": sem_map,
            }
            out = policy.act(
                params, pobs, rnn, prev, masks2, deterministic=True
            )
            return mstate, out.rnn_states, out.actions

        rnn = policy.initial_rnn_states(b)
        prev = jnp.zeros((b, 1), jnp.int32)
        masks1 = jnp.ones((b,), jnp.float32)
        masks2 = jnp.ones((b, 1), jnp.float32)

        try:
            lowered = fused_step.lower(
                params, mstate, rnn, prev, obs, masks1, masks2
            )
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            self._flops = float(cost.get("flops", 0.0)) if cost else None
        except Exception as e:  # cost analysis is best-effort
            log(f"cost_analysis unavailable: {e}")

        state = dict(mstate=mstate, rnn=rnn, prev=prev)

        def step():
            state["mstate"], state["rnn"], state["prev"] = fused_step(
                self.params, state["mstate"], state["rnn"], state["prev"],
                obs, masks1, masks2,
            )

        def sync():
            np.asarray(state["prev"][0, 0])

        def dropped():
            return int(np.asarray(state["mstate"].dropped).sum())

        return step, sync, dropped

    def measure(self, b, warmup, iters, trials):
        step, sync, dropped = self.build(b)
        t0 = time.time()
        step()
        sync()
        log(f"B={b} compile+first: {time.time() - t0:.1f}s")
        t0 = time.time()
        for _ in range(warmup):
            step()
        sync()
        log(f"B={b} warmup x{warmup}: {time.time() - t0:.1f}s")
        rates = []
        for t in range(trials):
            t0 = time.perf_counter()
            for _ in range(iters):
                step()
            sync()
            dt = time.perf_counter() - t0
            rates.append(b * iters / dt)
            log(
                f"B={b} trial{t}: {rates[-1]:.1f} steps/s "
                f"({dt / iters * 1000:.1f} ms/step-batch)"
            )
        # the scene-sized grid claim (GRID_CELLS) holds only if no map
        # point ever left the extent — a drop means the workload and a
        # full-size grid diverged, so fail LOUDLY rather than report a
        # number for a different computation
        n_dropped = dropped()
        if n_dropped > 0:
            raise RuntimeError(
                f"B={b}: {n_dropped} map points fell outside the "
                f"{GRID_CELLS}-cell world grid — raise IVLNCE_BENCH_GRID"
            )
        return np.array(rates)


def _init_pipeline_bounded(deadline_s: float) -> "TpuPipeline":
    """Construct TpuPipeline with a hard timeout: a downed axon tunnel
    makes the first jax.devices() block FOREVER in a C-level reconnect
    loop (observed 2026-08-17; SIGALRM cannot interrupt it), which would
    leave the driver with no JSON at all. Probe backend init in a
    KILLABLE subprocess and retry until the deadline; only init
    in-process once a probe has succeeded."""
    import subprocess

    attempt = 0
    while True:
        remaining = deadline_s - time.time()
        if remaining <= 10:
            raise RuntimeError(
                "device init deadline exhausted (backend unreachable)"
            )
        attempt += 1
        try:
            subprocess.run(
                [
                    sys.executable,
                    "-c",
                    "import jax; jax.devices(); print('ok')",
                ],
                timeout=min(remaining - 5, 150),
                check=True,
                capture_output=True,
            )
            return TpuPipeline()
        except subprocess.TimeoutExpired:
            log(f"device probe attempt {attempt} timed out; retrying")
        except subprocess.CalledProcessError as e:
            log(
                f"device probe attempt {attempt} failed: "
                f"{e.stderr.decode(errors='replace')[-200:]}"
            )
            time.sleep(min(20, max(1, remaining * 0.05)))


def bench_tpu():
    # wall-clock budget: the tunnel's speed varies ~10x between runs and
    # the driver must always receive the JSON line — skip remaining sweep
    # points (and shrink the final measurement) when running long
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    t_start = time.time()
    pipe = _init_pipeline_bounded(t_start + budget_s * 0.4)
    log(f"device: {pipe.device_kind}")

    # short sweep to find the throughput-optimal lane count (lane counts
    # that exhaust HBM are skipped)
    best_b, best_rate, best_rates = None, -1.0, None
    for b in SWEEP_LANES:
        if best_b is not None and time.time() - t_start > budget_s * 0.55:
            log(f"sweep B={b}: skipped (budget)")
            continue
        try:
            rates = pipe.measure(b, warmup=25, iters=SWEEP_ITERS, trials=2)
        except Exception as e:
            log(f"sweep B={b}: skipped ({type(e).__name__})")
            continue
        rate = float(np.median(rates))
        log(f"sweep B={b}: {rate:.1f} steps/s")
        if rate > best_rate:
            best_b, best_rate, best_rates = b, rate, rates

    remaining = budget_s - (time.time() - t_start)
    if remaining < 120:
        log("budget exhausted: reporting sweep medians")
        rates = best_rates
    else:
        trials = TRIALS if remaining > 900 else (3 if remaining > 400 else 2)
        try:
            rates = pipe.measure(
                best_b, warmup=WARMUP, iters=TRIAL_ITERS, trials=trials
            )
        except Exception as e:
            log(f"final measurement failed ({type(e).__name__}); "
                "using sweep rates")
            rates = best_rates
    med = float(np.median(rates))
    # trimmed spread: with >= 5 trials, drop the single fastest and
    # slowest window before computing the range — one transport stall
    # through the tunnel otherwise dominates a statistic meant to
    # describe the chip's repeatability
    trimmed = len(rates) >= 5
    core = np.sort(rates)[1:-1] if trimmed else np.sort(rates)
    spread = float((core.max() - core.min()) / max(med, 1e-9))
    flops_step = pipe._flops  # per fused-step dispatch (covers best_b lanes)
    peak = PEAK_BF16.get(pipe.device_kind, 197e12)
    mfu = (
        flops_step * (med / best_b) / peak if flops_step else None
    )
    return {
        "steps_per_sec": med,
        "lanes": best_b,
        "trials": len(rates),
        "spread_kind": "middle-trials range" if trimmed else "full range",
        "trial_spread": spread,
        "flops_per_step_batch": flops_step,
        "mfu": mfu,
        "device": pipe.device_kind,
    }


# -----------------------------------------------------------------------------
# torch-CPU baseline (reference architecture: torch conv/LSTM/GRU stack)
# -----------------------------------------------------------------------------
def bench_torch(B) -> float:
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    torch.set_grad_enabled(False)

    class GNBottleneck(nn.Module):
        def __init__(self, inp, planes, stride, ng=16):
            super().__init__()
            self.net = nn.Sequential(
                nn.Conv2d(inp, planes, 1, bias=False),
                nn.GroupNorm(ng, planes),
                nn.ReLU(True),
                nn.Conv2d(planes, planes, 3, stride, 1, bias=False),
                nn.GroupNorm(ng, planes),
                nn.ReLU(True),
                nn.Conv2d(planes, planes * 4, 1, bias=False),
                nn.GroupNorm(ng, planes * 4),
            )
            self.down = (
                nn.Sequential(
                    nn.Conv2d(inp, planes * 4, 1, stride, bias=False),
                    nn.GroupNorm(ng, planes * 4),
                )
                if stride != 1 or inp != planes * 4
                else None
            )

        def forward(self, x):
            idn = x if self.down is None else self.down(x)
            return torch.relu(self.net(x) + idn)

    def gn_resnet50(in_ch=1, base=32):
        layers = [
            nn.Conv2d(in_ch, base, 7, 2, 3, bias=False),
            nn.GroupNorm(16, base),
            nn.ReLU(True),
            nn.MaxPool2d(3, 2, 1),
        ]
        inp = base
        for si, (planes, blocks) in enumerate(
            zip([base, base * 2, base * 4, base * 8], [3, 4, 6, 3])
        ):
            for bi in range(blocks):
                s = (1 if si == 0 else 2) if bi == 0 else 1
                layers.append(GNBottleneck(inp, planes, s))
                inp = planes * 4
        layers += [
            nn.Conv2d(inp, 128, 3, 1, 1, bias=False),
            nn.GroupNorm(1, 128),
            nn.ReLU(True),
        ]
        return nn.Sequential(*layers)

    depth_net = gn_resnet50().eval()
    spatial_emb = torch.randn(1, 64, 4, 4)
    map_net = nn.Sequential(
        *[
            m
            for i, (ci, co) in enumerate(
                zip([14, 32, 64, 128], [32, 64, 128, 128])
            )
            for m in (
                nn.Conv2d(ci, co, 7, 1, 3),
                nn.BatchNorm2d(co),
                nn.ReLU(True),
                nn.AvgPool2d(2),
            )
        ]
    ).eval()
    gru1 = nn.GRUCell(128 + 256 + 32, 512)
    gru2 = nn.GRUCell(512, 512)
    dep_lin = nn.Linear(192 * 16, 128)
    map_lin = nn.Linear(128 * 16, 256)
    compress = nn.Linear(512 + 128 + 256 + 256 + 32, 512)
    head = nn.Linear(512, 4)
    act_emb = nn.Embedding(5, 32)
    dep_kv = nn.Conv1d(192, 256 + 128, 1)
    map_kv = nn.Conv1d(128, 256 + 256, 1)
    text_k = nn.Conv1d(256, 256, 1)
    state_q = nn.Linear(512, 256)
    text_q = nn.Linear(256, 256)

    # per-episode text features, cached exactly like the TPU pipeline
    embed = nn.Embedding(2504, 50)
    lstm = nn.LSTM(50, 128, bidirectional=True, batch_first=True)
    rng = np.random.default_rng(0)
    tokens = torch.from_numpy(rng.integers(1, 2000, size=(B, TOKENS)))
    txt = lstm(embed(tokens))[0].permute(0, 2, 1)  # (B, 256, T)

    G = 1024
    RES = 0.05
    grid_h = torch.full((B, G * G), -1e30)
    grid_sem = torch.zeros((B, G * G), dtype=torch.int64)

    depth = torch.from_numpy(
        rng.random((B, 1, DEPTH_HW, DEPTH_HW), dtype=np.float32) * 0.5 + 0.05
    )
    sem = torch.from_numpy(
        rng.integers(0, 14, size=(B, DEPTH_HW * DEPTH_HW))
    )
    # precomputed unprojection rays (camera intrinsics), as the reference
    # precomputes per-pixel scaling (projector/core.py:79-115)
    hfov = np.radians(90.0)
    fx = DEPTH_HW / (2 * np.tan(hfov / 2))
    us = (np.arange(DEPTH_HW) + 0.5 - DEPTH_HW / 2) / fx
    uu, vv = np.meshgrid(us, us)
    rays = torch.from_numpy(
        np.stack([uu.ravel(), vv.ravel(), np.ones(DEPTH_HW * DEPTH_HW)])
        .astype(np.float32)
    )
    pose = torch.from_numpy(rng.normal(size=(B, 3)).astype(np.float32) * 2)
    heading = torch.from_numpy(rng.random(B).astype(np.float32) * 6.28)
    # real extrinsics: yaw rotation + translation per lane
    cosh, sinh = torch.cos(heading), torch.sin(heading)
    rot = torch.zeros(B, 3, 3)
    rot[:, 0, 0] = cosh
    rot[:, 0, 2] = sinh
    rot[:, 1, 1] = 1
    rot[:, 2, 0] = -sinh
    rot[:, 2, 2] = cosh

    h1 = torch.zeros(B, 512)
    h2 = torch.zeros(B, 512)
    prev = torch.zeros(B, dtype=torch.int64)

    def step():
        nonlocal h1, h2, prev, grid_h, grid_sem
        # --- mapper: unproject + extrinsic transform + scatter amax dedup
        pts = depth.reshape(B, 1, -1) * 10.0 * rays.unsqueeze(0)
        world = torch.bmm(rot, pts) + pose.unsqueeze(-1)
        gr = ((world[:, 0] / RES).round().long() + G // 2).clamp(0, G - 1)
        gc = ((world[:, 2] / RES).round().long() + G // 2).clamp(0, G - 1)
        cells = gr * G + gc
        grid_h = grid_h.scatter_reduce(
            1, cells, world[:, 1], reduce="amax", include_self=True
        )
        grid_sem = grid_sem.scatter(1, cells, sem)
        # egocentric window rasterize: slice the window around each
        # robot's cell and pool to the 64^2 egocentric maps
        W = 192
        occ_list, sem_list = [], []
        for b in range(B):
            r0 = int(
                ((pose[b, 0] / RES).round().long() + G // 2)
                .clamp(W // 2, G - W // 2)
            ) - W // 2
            c0 = int(
                ((pose[b, 2] / RES).round().long() + G // 2)
                .clamp(W // 2, G - W // 2)
            ) - W // 2
            win_h = grid_h.reshape(B, G, G)[b, r0:r0 + W, c0:c0 + W]
            win_s = grid_sem.reshape(B, G, G)[b, r0:r0 + W, c0:c0 + W]
            occ_b = (win_h > -1e29).float()[None, None]
            occ_list.append(
                torch.nn.functional.adaptive_max_pool2d(occ_b, MAP_HW)
            )
            sem_list.append(
                torch.nn.functional.adaptive_max_pool2d(
                    win_s.float()[None, None], MAP_HW
                )
            )
        occ = torch.cat(occ_list).reshape(B, MAP_HW * MAP_HW)
        sem_map = torch.cat(sem_list).reshape(B, MAP_HW * MAP_HW).long()
        # --- encoders
        dfeat = depth_net(torch.nn.functional.avg_pool2d(depth, 2))
        dfeat = torch.cat([dfeat, spatial_emb.expand(B, 64, 4, 4)], 1)
        dfeat = dfeat.reshape(B, 192, -1)
        onehot = torch.nn.functional.one_hot(
            sem_map.reshape(B, MAP_HW, MAP_HW).clamp(0, 12), 13
        ).permute(0, 3, 1, 2).float()
        mapin = torch.cat([occ.reshape(B, 1, MAP_HW, MAP_HW), onehot], 1)
        mfeat = map_net(mapin).reshape(B, 128, -1)
        # --- CMA recurrent step (txt cached per episode)
        pa = act_emb(prev + 1)
        din = torch.relu(dep_lin(dfeat.reshape(B, -1)))
        min_ = torch.relu(map_lin(mfeat.reshape(B, -1)))
        h1 = gru1(torch.cat([din, min_, pa], 1), h1)
        q = state_q(h1)
        att = torch.softmax(
            torch.einsum("nc,nct->nt", q, text_k(txt)), -1
        )
        temb = torch.einsum("nt,nct->nc", att, txt)
        tq = text_q(temb)
        dk = dep_kv(dfeat)
        mk = map_kv(mfeat)
        da = torch.einsum(
            "nt,nct->nc",
            torch.softmax(torch.einsum("nc,nct->nt", tq, dk[:, :256]), -1),
            dk[:, 256:],
        )
        ma = torch.einsum(
            "nt,nct->nc",
            torch.softmax(torch.einsum("nc,nct->nt", tq, mk[:, :256]), -1),
            mk[:, 256:],
        )
        x = torch.relu(compress(torch.cat([h1, temb, da, ma, pa], 1)))
        h2 = gru2(x, h2)
        prev = head(h2).argmax(-1)

    step()  # warmup
    rates = []
    for trial in range(3):
        t0 = time.time()
        for _ in range(TORCH_ITERS):
            step()
        dt = time.time() - t0
        sps = B * TORCH_ITERS / dt
        log(
            f"torch-cpu trial {trial}: {TORCH_ITERS} steps x {B} lanes in "
            f"{dt:.2f}s = {sps:.1f} steps/s"
        )
        rates.append(sps)
    return float(np.median(rates))


def main():
    try:
        tpu = bench_tpu()
    except Exception as e:
        # the driver must ALWAYS get one JSON line, even with the device
        # unreachable. Degrade to the last successful measurement marked
        # stale; only with no history emit an explicit error record.
        log(f"bench_tpu failed: {type(e).__name__}: {e}")
        cached = _load_last_good()
        if cached is not None and cached.get("value"):
            out = {
                "metric": cached.get(
                    "metric", "mapcma_pipeline_env_steps_per_sec_per_chip"
                ),
                "value": cached["value"],
                "unit": (
                    f"STALE (device unreachable this run: "
                    f"{type(e).__name__}) — last good "
                    f"{cached.get('measured_at', '?')} @ commit "
                    f"{cached.get('git_commit', '?')}: "
                    f"{cached.get('unit', '')}"
                ),
                "vs_baseline": cached.get("vs_baseline"),
                "stale": True,
                "measured_at": cached.get("measured_at"),
                "outage": f"{type(e).__name__}: {e}",
            }
            for k in ("mfu", "lanes", "trial_spread", "device"):
                if k in cached:
                    out[k] = cached[k]
            print(json.dumps(out))
        else:
            print(
                json.dumps(
                    {
                        "metric": (
                            "mapcma_pipeline_env_steps_per_sec_per_chip"
                        ),
                        "value": 0.0,
                        "unit": f"ERROR: {type(e).__name__}: {e}",
                        "vs_baseline": None,
                        "stale": True,
                    }
                )
            )
        return
    try:
        torch_sps = bench_torch(TORCH_B)
    except Exception as e:  # torch baseline is best-effort
        log(f"torch baseline failed: {e}")
        torch_sps = None
    vs = tpu["steps_per_sec"] / torch_sps if torch_sps else None
    record = {
        "metric": "mapcma_pipeline_env_steps_per_sec_per_chip",
        "value": round(tpu["steps_per_sec"], 2),
        "unit": (
            f"env steps/s (B={tpu['lanes']} lanes; mapper+"
            f"encoders+policy; median of {tpu['trials']} trials, "
            f"{tpu['spread_kind']} spread "
            f"{tpu['trial_spread']:.2f})"
        ),
        "vs_baseline": round(vs, 2) if vs else None,
        "mfu": round(tpu["mfu"], 5) if tpu["mfu"] else None,
        "lanes": tpu["lanes"],
        "trial_spread": round(tpu["trial_spread"], 3),
        "torch_cpu_steps_per_sec": (
            round(torch_sps, 2) if torch_sps else None
        ),
        "device": tpu["device"],
    }
    print(json.dumps(record))
    _save_last_good(record)


if __name__ == "__main__":
    main()
