"""Chunked + rematerialized BPTT encode (TPU.train_encode_chunk).

T=64 x N=64 DAgger batches OOM a 16G chip on stored map-encoder conv
activations (measured: >6.5G of f32[4096,64,64,*] HLO temps). The fix
scans net_encode over jax.checkpoint'd chunks in build_distribution —
these tests pin that the chunked path is numerically the plain path:
same logits/features/final-rnn and same grads, including when tn does
not divide the chunk (zero-padded rows must never reach the loss).

With a TRAINABLE map encoder the train-mode BatchNorm normalizes per
chunk (ghost batch norm), so exact-parity tests freeze it; a separate
test pins that the trainable path still runs chunked.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ivlnce_tpu.config import get_config
from ivlnce_tpu.models.policy import MapCMAPolicy
from ivlnce_tpu.trainers.base_trainer import make_train_step

B, T, MHW = 3, 4, 64


def _make_policy(encode_chunk, trainable_map=False):
    config = get_config().clone()
    config.defrost()
    config.MODEL.policy_name = "MapCMAPolicy"
    config.MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings = False
    config.MODEL.INSTRUCTION_ENCODER.vocab_size = 32
    config.MODEL.SEMANTIC_MAP_ENCODER.trainable = trainable_map
    config.TPU.train_encode_chunk = encode_chunk
    config.freeze()
    return config, MapCMAPolicy.from_config(
        config, {"depth_hw": 256, "map_hw": MHW}
    )


def _batch(rng, t=T, n=B):
    tn = t * n
    obs = {
        "instruction": rng.integers(1, 30, (tn, 12)).astype(np.int32),
        # cached frozen depth features (the DAgger train-batch shape)
        "depth_features": rng.standard_normal((tn, 192, 4, 4)).astype(
            np.float32
        ),
        "occupancy_map": rng.integers(0, 2, (tn, MHW, MHW)).astype(np.uint8),
        "semantic_map": rng.integers(0, 13, (tn, MHW, MHW)).astype(np.uint8),
        "progress": rng.random((tn, 1)).astype(np.float32),
    }
    prev = rng.integers(0, 4, (tn, 1)).astype(np.int32)
    masks = (rng.random((tn, 1)) > 0.1).astype(np.float32)
    corrected = rng.integers(0, 4, (t, n)).astype(np.int32)
    weights = np.ones((t, n), np.float32)
    return obs, prev, masks, corrected, weights


@pytest.mark.parametrize("chunk", [4, 5])  # tn=12: divides / pads to 15
def test_chunked_build_distribution_matches_plain(chunk):
    _, plain = _make_policy(0)
    _, chunked = _make_policy(chunk)
    params = plain.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    obs, prev, masks, *_ = _batch(rng)
    rnn0 = plain.initial_rnn_states(B)

    outs = []
    for policy in (plain, chunked):
        logits, feats, rnn = jax.jit(
            lambda p, o, r, pa, m, pol=policy: pol.build_distribution(
                p, o, r, pa, m, training=True
            )
        )(params, obs, rnn0, jnp.asarray(prev), jnp.asarray(masks))
        outs.append((np.asarray(logits), np.asarray(feats), np.asarray(rnn)))
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_chunked_grads_match_plain():
    import optax

    grads = []
    for chunk in (0, 5):
        config, policy = _make_policy(chunk)
        params = policy.init_params(jax.random.PRNGKey(0))
        optimizer = optax.adam(1e-3)
        step = jax.jit(
            make_train_step(
                policy,
                optimizer,
                use_progress=True,
                alpha=config.MODEL.PROGRESS_MONITOR.alpha,
                update_map_bn=False,
            )
        )
        rng = np.random.default_rng(1)
        obs, prev, masks, corrected, weights = _batch(rng)
        new_params, _, loss, *_ = step(
            params,
            optimizer.init(params),
            {k: jnp.asarray(v) for k, v in obs.items()},
            jnp.asarray(prev),
            jnp.asarray(masks),
            jnp.asarray(masks),
            jnp.asarray(corrected),
            jnp.asarray(weights),
            policy.initial_rnn_states(B),
        )
        grads.append((float(loss), new_params))
    assert np.isclose(grads[0][0], grads[1][0], rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves(grads[0][1])
    flat1 = jax.tree_util.tree_leaves(grads[1][1])
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_chunked_trainable_map_bn_runs():
    """Ghost-batch BN (per-chunk stats) is an accepted divergence — pin
    that the trainable-map chunked path compiles and yields finite
    outputs rather than exact parity."""
    _, policy = _make_policy(4, trainable_map=True)
    params = policy.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    obs, prev, masks, *_ = _batch(rng)
    logits, _, _ = policy.build_distribution(
        params,
        obs,
        policy.initial_rnn_states(B),
        jnp.asarray(prev),
        jnp.asarray(masks),
        training=True,
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_chunking_off_outside_training():
    """Eval-path encodes (training=False) never chunk — act/act_iterative
    stay a single fused batch regardless of the knob."""
    _, policy = _make_policy(2)
    params = policy.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    obs, prev, masks, *_ = _batch(rng, t=1, n=B)
    out = policy.act(
        params,
        obs,
        policy.initial_rnn_states(B),
        jnp.asarray(prev),
        jnp.asarray(masks),
    )
    assert out.actions.shape == (B, 1)
