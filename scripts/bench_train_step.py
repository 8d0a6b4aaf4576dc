#!/usr/bin/env python3
"""On-chip IL training-step throughput (VERDICT r3 next #4).

Times the exact train executable the trainers run — make_train_step
(inflection-weighted CE + progress-monitor aux + Adam, the compute of
reference base_il_trainer.py:173-219) — on DAgger-collection batch
shapes: flattened (T*N) observations carrying instruction tokens,
cached frozen depth features (dagger_trainer.py:301-323 stores features,
not pixels), and the two uint8 maps. Measured at the reference's
IL.batch_size (5 lanes) and at TPU-right lane counts, plus a torch-CPU
mirror of the same training graph (biLSTM + CBRA map CNN + 2 GRUs +
attention + CE backward + Adam) as the vs-baseline.

Usage:
    python scripts/bench_train_step.py [--lanes 5 64] [--T 64]
        [--iters 10] [--trials 3] [--torch-lanes 5] [--skip-torch]

One line per measurement to stderr; a JSON summary to stdout.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TOKENS = 200
MAP_HW = 64
NUM_SEM = 13


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_batch(rng, t, n):
    tn = t * n
    obs = {
        "instruction": rng.integers(1, 2300, (tn, TOKENS)).astype(np.int32),
        "depth_features": rng.standard_normal((tn, 192, 4, 4)).astype(
            np.float16
        ),
        "occupancy_map": rng.integers(0, 2, (tn, MAP_HW, MAP_HW)).astype(
            np.uint8
        ),
        "semantic_map": rng.integers(
            0, NUM_SEM, (tn, MAP_HW, MAP_HW)
        ).astype(np.uint8),
        "progress": rng.random((tn, 1)).astype(np.float32),
    }
    prev = rng.integers(0, 4, (tn, 1)).astype(np.int32)
    masks = (rng.random((t, n)) > 0.02).astype(np.float32)  # sparse resets
    corrected = rng.integers(0, 4, (t, n)).astype(np.int32)
    weights = np.where(
        rng.random((t, n)) > 0.2, 1.0, 3.2
    ).astype(np.float32)
    return obs, prev, masks, corrected, weights


def bench_jax(t, n, iters, trials, encode_chunk=0):
    from ivlnce_tpu.utils.jax_setup import setup_jax

    setup_jax()  # persistent compile cache + IVLNCE_PLATFORM override
    import jax
    import jax.numpy as jnp
    import optax

    from ivlnce_tpu.config import get_config
    from ivlnce_tpu.models.policy import MapCMAPolicy
    from ivlnce_tpu.trainers.base_trainer import make_train_step

    config = get_config().clone()
    config.defrost()
    config.MODEL.policy_name = "MapCMAPolicy"
    config.MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings = False
    config.TPU.train_encode_chunk = encode_chunk
    config.freeze()
    policy = MapCMAPolicy.from_config(config, {"depth_hw": 256, "map_hw": MAP_HW})
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = policy.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(params)
    optimizer = optax.adam(config.IL.lr)
    opt_state = optimizer.init(params)
    step = jax.jit(
        make_train_step(
            policy,
            optimizer,
            use_progress=True,
            alpha=config.MODEL.PROGRESS_MONITOR.alpha,
            update_map_bn=config.MODEL.SEMANTIC_MAP_ENCODER.trainable,
        ),
        donate_argnums=(0, 1),
    )

    rng = np.random.default_rng(0)
    obs, prev, masks, corrected, weights = make_batch(rng, t, n)
    obs = {k: jnp.asarray(v) for k, v in obs.items()}
    # hoisted OUT of the timed loop (ADVICE r4): none of these are
    # donated, so the same device arrays serve every step — re-building
    # them per iteration timed H2D transfer + host allocation, not the
    # train step. The real trainers overlap those uploads with the
    # previous step anyway (prefetch thread, utils/prefetch.py).
    args = (
        jnp.asarray(prev),
        jnp.asarray(masks),
        jnp.asarray(masks),
        jnp.asarray(corrected),
        jnp.asarray(weights),
        policy.initial_rnn_states(n),
    )

    t0 = time.time()
    params, opt_state, loss, *_ = step(params, opt_state, obs, *args)
    float(loss)
    log(f"jax T={t} N={n}: compile+first {time.time() - t0:.1f}s")
    # warmup past the transport's lazy server-side warmup
    for _ in range(3):
        params, opt_state, loss, *_ = step(params, opt_state, obs, *args)
    float(loss)

    rates = []
    for _ in range(trials):
        t0 = time.time()
        for _ in range(iters):
            params, opt_state, loss, *_ = step(
                params, opt_state, obs, *args
            )
        float(loss)  # one sync per window
        dt = time.time() - t0
        rates.append(iters / dt)
        log(
            f"jax T={t} N={n}: {rates[-1]:.2f} updates/s "
            f"({rates[-1] * t * n:.0f} frames/s)"
        )
    med = float(np.median(rates))
    return {
        "updates_per_sec": med,
        "frames_per_sec": med * t * n,
        "trials": [float(r) for r in rates],
    }


def bench_dp(t, n, iters, trials, n_devices):
    """DP scaling efficiency of the sharded train step (VERDICT r4 #5).

    One real chip is available here, so the DP figure is measured the
    way the multichip dryrun validates sharding: a virtual N-device CPU
    mesh (xla_force_host_platform_device_count). The number reported is
    the RELATIVE speedup of the same sharded_train_step over a
    ``(data=N)`` mesh vs a ``(data=1)`` mesh at fixed global batch —
    i.e. strong-scaling efficiency of the XLA-inserted grad psum +
    batch split, not absolute chip throughput.
    """
    # IVLNCE_PLATFORM (not JAX_PLATFORMS: the axon sitecustomize stomps
    # the env var — see .claude/skills/verify/SKILL.md) + the forced
    # host device count, both bound before the first backend use
    os.environ["IVLNCE_PLATFORM"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    )
    from ivlnce_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import optax

    from ivlnce_tpu.config import get_config
    from ivlnce_tpu.models.policy import MapCMAPolicy
    from ivlnce_tpu.parallel.mesh import make_mesh
    from ivlnce_tpu.parallel.train import sharded_train_step

    assert n % n_devices == 0, (n, n_devices)
    config = get_config().clone()
    config.defrost()
    config.MODEL.policy_name = "MapCMAPolicy"
    config.MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings = False
    config.freeze()
    policy = MapCMAPolicy.from_config(
        config, {"depth_hw": 256, "map_hw": MAP_HW}
    )
    params_host = jax.device_get(policy.init_params(jax.random.PRNGKey(0)))
    optimizer = optax.adam(config.IL.lr)

    rng = np.random.default_rng(0)
    obs_np, prev, masks, corrected, weights = make_batch(rng, t, n)

    out = {}
    for nd in (1, n_devices):
        mesh = make_mesh(nd)
        params = jax.tree_util.tree_map(jnp.asarray, params_host)
        opt_state = optimizer.init(params)
        step = sharded_train_step(
            policy,
            optimizer,
            mesh,
            params,
            opt_state,
            use_progress=True,
            alpha=config.MODEL.PROGRESS_MONITOR.alpha,
            update_map_bn=config.MODEL.SEMANTIC_MAP_ENCODER.trainable,
        )
        obs = {k: jnp.asarray(v) for k, v in obs_np.items()}
        args = (
            jnp.asarray(prev),
            jnp.asarray(masks),
            jnp.asarray(masks),
            jnp.asarray(corrected),
            jnp.asarray(weights),
            policy.initial_rnn_states(n),
        )
        t0 = time.time()
        params, opt_state, loss, *_ = step(params, opt_state, obs, *args)
        loss0 = float(loss)
        log(f"dp={nd} T={t} N={n}: compile+first {time.time() - t0:.1f}s")
        rates = []
        for _ in range(trials):
            t0 = time.time()
            for _ in range(iters):
                params, opt_state, loss, *_ = step(
                    params, opt_state, obs, *args
                )
            float(loss)
            rates.append(iters / (time.time() - t0))
            log(f"dp={nd} T={t} N={n}: {rates[-1]:.3f} updates/s")
        out[str(nd)] = {
            "updates_per_sec": float(np.median(rates)),
            "first_loss": loss0,
            "trials": [float(r) for r in rates],
        }
    out["dp_speedup"] = (
        out[str(n_devices)]["updates_per_sec"] / out["1"]["updates_per_sec"]
    )
    out["dp_efficiency"] = out["dp_speedup"] / n_devices
    # same data + params on both meshes: the loss must agree bit-for-bit
    # modulo reduction order (psum over data vs single-device sum)
    out["loss_parity"] = abs(
        out["1"]["first_loss"] - out[str(n_devices)]["first_loss"]
    )
    return out


def bench_torch(t, n, iters, trials):
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    hidden, half = 512, 256

    class CBRA(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.net = nn.Sequential(
                nn.Conv2d(cin, cout, 7, padding=3),
                nn.BatchNorm2d(cout),
                nn.ReLU(True),
                nn.AvgPool2d(2),
            )

        def forward(self, x):
            return self.net(x)

    class TrainNet(nn.Module):
        """The reference MapCMA training graph (map_cma_policy.py:276-368)
        at our config dims, sequence-batched the favorable-to-torch way
        (GRUs via nn.GRU over (T, N, C), attention batched over T*N)."""

        def __init__(self):
            super().__init__()
            self.embed = nn.Embedding(2504, 50, padding_idx=0)
            self.lstm = nn.LSTM(50, 128, batch_first=True, bidirectional=True)
            self.dep_lin = nn.Linear(192 * 16, 128)
            self.map_cnn = nn.Sequential(
                CBRA(14, 32), CBRA(32, 64), CBRA(64, 128), CBRA(128, 128)
            )
            self.map_lin = nn.Linear(128 * 16, 256)
            self.prev_embed = nn.Embedding(5, 32)
            self.gru1 = nn.GRU(128 + 256 + 32, hidden)
            self.state_q = nn.Linear(hidden, half)
            self.text_k = nn.Conv1d(256, half, 1)
            self.text_q = nn.Linear(256, half)
            self.dep_kv = nn.Conv1d(192, hidden, 1)
            self.map_kv = nn.Conv1d(128, hidden, 1)
            self.compress = nn.Linear(hidden + 256 + half + half + 32, hidden)
            self.gru2 = nn.GRU(hidden, hidden)
            self.head = nn.Linear(hidden, 4)
            self.progress = nn.Linear(hidden, 1)

        @staticmethod
        def _attn(q, k, v):
            a = torch.softmax(
                torch.einsum("nc,nct->nt", q, k) / (half ** 0.5), -1
            )
            return torch.einsum("nt,nct->nc", a, v)

        def forward(self, tokens, dep_feats, occ, sem, prev, t, n):
            tn = tokens.shape[0]
            txt, _ = self.lstm(self.embed(tokens))  # (TN, 200, 256)
            txt = txt.transpose(1, 2)
            dep = dep_feats.reshape(tn, 192, 16)
            one_hot = torch.nn.functional.one_hot(
                sem.long(), NUM_SEM
            ).permute(0, 3, 1, 2)
            maps = torch.cat([occ[:, None].float(), one_hot.float()], 1)
            map_f = self.map_cnn(maps).reshape(tn, 128, 16)
            dep_in = torch.relu(self.dep_lin(dep.reshape(tn, -1)))
            map_in = torch.relu(self.map_lin(map_f.reshape(tn, -1)))
            prev_a = self.prev_embed(prev.reshape(-1) + 1)
            x = torch.cat([dep_in, map_in, prev_a], 1).reshape(t, n, -1)
            s1, _ = self.gru1(x)
            s1 = s1.reshape(tn, hidden)
            tk = self.text_k(txt)
            te = self._attn(self.state_q(s1), tk, txt)
            tq = self.text_q(te)
            dkv, mkv = self.dep_kv(dep), self.map_kv(map_f)
            v1 = self._attn(tq, dkv[:, :half], dkv[:, half:])
            v2 = self._attn(tq, mkv[:, :half], mkv[:, half:])
            y = torch.relu(
                self.compress(torch.cat([s1, te, v1, v2, prev_a], 1))
            )
            s2, _ = self.gru2(y.reshape(t, n, -1))
            s2 = s2.reshape(tn, hidden)
            return self.head(s2), torch.tanh(self.progress(s2))

    net = TrainNet()
    opt = torch.optim.Adam(net.parameters(), lr=2.5e-4)
    rng = np.random.default_rng(0)
    obs, prev, masks, corrected, weights = make_batch(rng, t, n)
    tokens = torch.from_numpy(obs["instruction"]).long()
    dep = torch.from_numpy(obs["depth_features"]).float()
    occ = torch.from_numpy(obs["occupancy_map"])
    sem = torch.from_numpy(obs["semantic_map"])
    prog = torch.from_numpy(obs["progress"])
    prev_t = torch.from_numpy(prev)
    corr = torch.from_numpy(corrected.reshape(-1)).long()
    w = torch.from_numpy(weights.reshape(-1))

    def one_step():
        opt.zero_grad()
        logits, p = net(tokens, dep, occ, sem, prev_t, t, n)
        ce = torch.nn.functional.cross_entropy(
            logits, corr, reduction="none"
        )
        loss = (ce * w).sum() / w.sum()
        loss = loss + torch.nn.functional.mse_loss(p, prog)
        loss.backward()
        opt.step()
        return float(loss)

    one_step()
    rates = []
    for _ in range(trials):
        t0 = time.time()
        for _ in range(iters):
            one_step()
        dt = time.time() - t0
        rates.append(iters / dt)
        log(
            f"torch T={t} N={n}: {rates[-1]:.2f} updates/s "
            f"({rates[-1] * t * n:.0f} frames/s)"
        )
    med = float(np.median(rates))
    return {
        "updates_per_sec": med,
        "frames_per_sec": med * t * n,
        "trials": [float(r) for r in rates],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, nargs="*", default=[5, 64])
    ap.add_argument("--T", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--torch-lanes", type=int, nargs="+", default=[5])
    ap.add_argument("--torch-iters", type=int, default=3)
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument(
        "--encode-chunk",
        type=int,
        default=0,
        help="TPU.train_encode_chunk: frames per rematerialized encoder "
        "chunk (0 = reference-shaped single-batch encode; T=64 x N=64 "
        "OOMs a 16G chip without it — the map-encoder conv activations "
        "alone need >6.5G at T*N=4096)",
    )
    ap.add_argument(
        "--dp",
        type=int,
        default=0,
        metavar="N_DEVICES",
        help="measure DP strong-scaling on a virtual N-device CPU mesh "
        "INSTEAD of the on-chip benches (must run in its own process: "
        "the device-count XLA flag binds at first jax import)",
    )
    args = ap.parse_args()

    if args.dp:
        out = {"T": args.T, "dp": {}}
        for n in args.lanes:
            out["dp"][str(n)] = bench_dp(
                args.T, n, args.iters, args.trials, args.dp
            )
        print(json.dumps(out))
        return

    out = {"T": args.T, "jax": {}, "torch": {}}
    for n in args.lanes:
        out["jax"][str(n)] = bench_jax(
            args.T, n, args.iters, args.trials, args.encode_chunk
        )
    if not args.skip_torch:
        for n in args.torch_lanes:
            out["torch"][str(n)] = bench_torch(
                args.T, n, args.torch_iters, args.trials
            )
    ref = out["torch"].get(str(args.torch_lanes[0]))
    if ref and out["jax"]:
        best = max(v["frames_per_sec"] for v in out["jax"].values())
        out["vs_torch_cpu_frames"] = best / ref["frames_per_sec"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
