"""Fused mapper+policy step tests: the trainer's _policy_step must agree
with the legacy two-stage path (obs transform forward + separate act)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ivlnce_tpu.config import get_config
from ivlnce_tpu.ops import scatter as S
from ivlnce_tpu.mapping.obs_transforms import GTSemanticsIterativeMapper
from ivlnce_tpu.models.policy import MapCMAPolicy

B, DHW, MHW = 2, 64, 64


@pytest.fixture(scope="module")
def setup():
    config = get_config().clone()
    config.defrost()
    config.MODEL.policy_name = "MapCMAPolicy"
    config.MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings = False
    config.MODEL.INSTRUCTION_ENCODER.vocab_size = 32
    config.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT = DHW
    config.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH = DHW
    config.TPU.world_grid_cells = 512
    config.freeze()
    policy = MapCMAPolicy.from_config(
        config, {"depth_hw": DHW, "map_hw": MHW}
    )
    params = policy.init_params(jax.random.PRNGKey(0))
    return config, policy, params


def _obs(rng):
    return {
        "depth": rng.random((B, DHW, DHW, 1), np.float32) * 0.5 + 0.05,
        "semantic12": rng.integers(0, 14, (B, DHW, DHW)).astype(np.uint8),
        "world_robot_pose": rng.normal(size=(B, 3)).astype(np.float32),
        "world_robot_orientation": np.stack(
            [np.zeros(B), rng.random(B) * 6.28], 1
        ).astype(np.float32),
        "instruction": rng.integers(1, 30, (B, 12)).astype(np.int32),
    }


def test_fused_step_matches_two_stage(setup):
    config, policy, params = setup
    rng = np.random.default_rng(0)
    obs = _obs(rng)
    masks = np.ones((B, 1), np.float32)

    # legacy path: transform.forward then policy.act
    t1 = GTSemanticsIterativeMapper.from_config(config)
    legacy_obs = dict(obs)
    legacy_obs["not_done_masks"] = masks
    legacy_obs = t1.forward(legacy_obs)
    rnn = policy.initial_rnn_states(B)
    prev = np.zeros((B, 1), np.int32)
    out_legacy = policy.act(
        params,
        {k: jnp.asarray(v) for k, v in legacy_obs.items()},
        rnn, jnp.asarray(prev), jnp.asarray(masks),
    )

    # fused path
    t2 = GTSemanticsIterativeMapper.from_config(config)
    t2.host_prepare(obs, masks.reshape(-1))
    device_step = t2.make_device_step()

    @jax.jit
    def fused(params, state, obs, reset_masks, rnn, prev, masks):
        state, occ, sem = device_step(state, obs, reset_masks, {})
        pobs = dict(obs)
        pobs["occupancy_map"] = occ
        pobs["semantic_map"] = sem
        return state, occ, sem, policy.act(
            params, pobs, rnn, prev, masks
        )

    dobs = {k: jnp.asarray(v) for k, v in obs.items()}
    state, occ, sem, out_fused = fused(
        params, t2.state, dobs, jnp.asarray(masks.reshape(-1)),
        rnn, jnp.asarray(prev), jnp.asarray(masks),
    )

    np.testing.assert_array_equal(
        np.asarray(occ), np.asarray(legacy_obs["occupancy_map"])
    )
    np.testing.assert_array_equal(
        np.asarray(sem), np.asarray(legacy_obs["semantic_map"])
    )
    np.testing.assert_allclose(
        np.asarray(out_fused.logits),
        np.asarray(out_legacy.logits),
        rtol=1e-5,
        atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(out_fused.actions), np.asarray(out_legacy.actions)
    )


def test_fused_step_mask_clears_world(setup):
    config, policy, params = setup
    rng = np.random.default_rng(1)
    t = GTSemanticsIterativeMapper.from_config(config)
    obs = _obs(rng)
    t.host_prepare(obs, np.ones(B, np.float32))
    device_step = jax.jit(
        lambda s, o, m: t.make_device_step()(s, o, m, {})
    )
    dobs = {k: jnp.asarray(v) for k, v in obs.items()}
    def occupied(state):
        # points live in the compact list until a capacity flush merges
        # them into the big grid (two-level accumulation)
        return (
            (np.asarray(state.key) != S.EMPTY_KEY).sum()
            + (np.asarray(state.lcell) != S.LIST_EMPTY).sum()
        )

    state1, _, _ = device_step(t.state, dobs, jnp.ones(B))
    assert occupied(state1) > 0
    # mask 0 clears the lane's accumulated world state before the frame
    state2, _, _ = device_step(state1, dobs, jnp.zeros(B))
    # after clearing, only the current frame's points remain
    n1 = occupied(state1)
    obs2 = _obs(rng)  # different pose -> different cells
    dobs2 = {k: jnp.asarray(v) for k, v in obs2.items()}
    state3, _, _ = device_step(state1, dobs2, jnp.ones(B))
    n3 = occupied(state3)
    assert n3 >= n1  # accumulation grows without reset


def test_predicted_semantics_fused_step_runs_and_matches_forward():
    """The RedNet-fused device step (PredictedSemanticsIterativeMapper)
    must execute and agree with the transform's legacy .forward path —
    the pred pipeline previously had no execution coverage (only
    RedNet-module parity tests)."""
    from ivlnce_tpu.mapping.obs_transforms import (
        PredictedSemanticsIterativeMapper,
    )
    from ivlnce_tpu.models.rednet import init_rednet

    config = get_config().clone()
    config.defrost()
    config.MODEL.policy_name = "MapCMAPolicy"
    config.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT = DHW
    config.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH = DHW
    config.TPU.world_grid_cells = 256
    config.freeze()

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        rednet_params = init_rednet(jax.random.PRNGKey(0))

    rng = np.random.default_rng(2)
    obs = {
        "depth": rng.random((B, DHW, DHW, 1), np.float32) * 0.5 + 0.05,
        "rgb": rng.integers(0, 255, (B, DHW, DHW, 3)).astype(np.uint8),
        "world_robot_pose": rng.normal(size=(B, 3)).astype(np.float32),
        "world_robot_orientation": np.stack(
            [np.zeros(B), rng.random(B) * 6.28], 1
        ).astype(np.float32),
    }
    masks = np.ones((B, 1), np.float32)

    t1 = PredictedSemanticsIterativeMapper.from_config(
        config, rednet_params=rednet_params
    )
    legacy = dict(obs)
    legacy["not_done_masks"] = masks
    legacy = t1.forward(legacy)
    occ_legacy = np.asarray(legacy["occupancy_map"])
    sem_legacy = np.asarray(legacy["semantic_map"])
    assert occ_legacy.shape == (B, MHW, MHW)
    assert occ_legacy.any(), "random scene produced an empty map"

    t2 = PredictedSemanticsIterativeMapper.from_config(
        config, rednet_params=rednet_params
    )
    t2.host_prepare(obs, masks.reshape(-1))
    device_step = jax.jit(t2.make_device_step())
    state, occ, sem = device_step(
        t2.state,
        {k: jnp.asarray(v) for k, v in obs.items()},
        jnp.asarray(masks.reshape(-1)),
        rednet_params,
    )
    np.testing.assert_array_equal(np.asarray(occ), occ_legacy)
    np.testing.assert_array_equal(np.asarray(sem), sem_legacy)
