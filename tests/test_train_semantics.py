"""Training/eval semantics added in round 2:

- trainable map-encoder BatchNorm running statistics must move during
  training (torch train-mode BN semantics, reference
  ivlnce_baselines/models/encoders/map_encoder.py:8-23);
- EVAL.SAMPLE switches eval action selection from argmax to sampling
  (reference base_il_trainer.py:452,699);
- EVAL.USE_CKPT_CONFIG merges the checkpoint's saved config with
  habitat-lab's overwrite priority.
"""

import numpy as np
import optax
import pytest

import jax

from ivlnce_tpu.config import get_config
from ivlnce_tpu.models.policy import MapCMAPolicy
from ivlnce_tpu.trainers.base_trainer import (
    BaseVLNCETrainer,
    make_train_step,
)

B, T, DHW, MHW = 2, 3, 64, 64


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


def _train_batch(rng):
    tn = T * B
    obs = {
        "depth": rng.random((tn, DHW, DHW, 1), np.float32) * 0.5 + 0.05,
        "occupancy_map": rng.integers(0, 2, (tn, MHW, MHW)).astype(np.uint8),
        "semantic_map": rng.integers(0, 13, (tn, MHW, MHW)).astype(np.uint8),
        "instruction": rng.integers(1, 30, (tn, 12)).astype(np.int32),
    }
    prev = rng.integers(0, 4, (tn, 1)).astype(np.int32)
    masks = np.ones((tn, 1), np.float32)
    corrected = rng.integers(0, 4, (T, B)).astype(np.int32)
    weights = np.ones((T, B), np.float32)
    return obs, prev, masks, corrected, weights


def test_map_bn_running_stats_move(setup):
    config, policy, params = setup
    optimizer = optax.adam(1e-3)
    opt_state = jax.jit(optimizer.init)(params)
    step = jax.jit(
        make_train_step(
            policy, optimizer, use_progress=False, alpha=1.0,
            update_map_bn=True,
        )
    )
    rng = np.random.default_rng(0)
    obs, prev, masks, corrected, weights = _train_batch(rng)
    rnn = policy.initial_rnn_states(B)

    bn0 = params["map_encoder"]["cnn"]["0"]["conv"]["1"]
    assert np.allclose(np.asarray(bn0["mean"]), 0.0)
    assert np.allclose(np.asarray(bn0["var"]), 1.0)

    new_params, *_ = step(
        params, opt_state, obs, prev, masks, masks, corrected, weights, rnn
    )
    bn1 = new_params["map_encoder"]["cnn"]["0"]["conv"]["1"]
    # momentum 0.1 toward batch stats: mean moves off 0, var off 1
    assert not np.allclose(np.asarray(bn1["mean"]), 0.0)
    assert not np.allclose(np.asarray(bn1["var"]), 1.0)
    assert np.all(np.isfinite(np.asarray(bn1["mean"])))

    # a second step moves the stats further (they keep tracking batches)
    newer_params, *_ = step(
        new_params, opt_state, obs, prev, masks, masks, corrected, weights,
        rnn,
    )
    bn2 = newer_params["map_encoder"]["cnn"]["0"]["conv"]["1"]
    assert not np.allclose(np.asarray(bn2["mean"]), np.asarray(bn1["mean"]))


def test_train_step_without_bn_update_keeps_stats(setup):
    config, policy, params = setup
    optimizer = optax.adam(1e-3)
    opt_state = jax.jit(optimizer.init)(params)
    step = jax.jit(
        make_train_step(
            policy, optimizer, use_progress=False, alpha=1.0,
            update_map_bn=False,
        )
    )
    rng = np.random.default_rng(0)
    obs, prev, masks, corrected, weights = _train_batch(rng)
    rnn = policy.initial_rnn_states(B)
    new_params, *_ = step(
        params, opt_state, obs, prev, masks, masks, corrected, weights, rnn
    )
    bn = new_params["map_encoder"]["cnn"]["0"]["conv"]["1"]
    assert np.allclose(np.asarray(bn["mean"]), 0.0)
    assert np.allclose(np.asarray(bn["var"]), 1.0)


def _eval_obs(rng, n):
    return {
        "depth": rng.random((n, DHW, DHW, 1), np.float32) * 0.5 + 0.05,
        "occupancy_map": rng.integers(0, 2, (n, MHW, MHW)).astype(np.uint8),
        "semantic_map": rng.integers(0, 13, (n, MHW, MHW)).astype(np.uint8),
        "instruction": rng.integers(1, 30, (n, 12)).astype(np.int32),
    }


def _make_trainer(config):
    trainer = BaseVLNCETrainer.__new__(BaseVLNCETrainer)
    trainer.config = config
    trainer._jit_cache = {}
    trainer.obs_transforms = []
    trainer._lane_rows = None
    return trainer


def test_eval_sample_actions(setup):
    config, policy, params = setup
    config = config.clone()
    config.EVAL.SAMPLE = True
    config.freeze()
    trainer = _make_trainer(config)
    trainer.policy = policy
    trainer.params = params
    trainer._step_counter = 7

    rng = np.random.default_rng(1)
    batch = _eval_obs(rng, B)
    # host copy: TPU.donate_state deletes device inputs after a step,
    # and this test deliberately reuses the same carry twice
    rnn = np.asarray(policy.initial_rnn_states(B))
    prev = np.zeros((B, 1), np.int64)
    masks = np.ones((B, 1), np.uint8)

    out1, _ = trainer._policy_step(
        dict(batch), masks, rnn, prev, (masks,), iterative=False
    )
    assert out1.actions.shape == (B, 1)
    assert np.all((out1.actions >= 0) & (out1.actions < 4))

    # same step counter (same key) => identical draws
    trainer2 = _make_trainer(config)
    trainer2.policy = policy
    trainer2.params = params
    trainer2._step_counter = 7
    out2, _ = trainer2._policy_step(
        dict(batch), masks, rnn, prev, (masks,), iterative=False
    )
    np.testing.assert_array_equal(
        np.asarray(out1.actions), np.asarray(out2.actions)
    )


def test_setup_eval_config_priority(setup):
    config, policy, params = setup
    trainer = _make_trainer(config)

    ckpt_cfg = config.clone()
    ckpt_cfg.IL.lr = 9.9e-1  # differs from eval config
    ckpt_cfg.CMD_TRAILING_OPTS = ["IL.epochs", "17"]
    merged = trainer._setup_eval_config(ckpt_cfg.to_dict())
    # eval_cfg beats ckpt_cfg for plain keys
    assert merged.IL.lr == config.IL.lr
    # ckpt cmd opts beat eval_cfg
    assert merged.IL.epochs == 17
    # eval SENSORS are forced onto the sim agent
    assert merged.TASK_CONFIG.SIMULATOR.AGENT_0.SENSORS == list(
        config.SENSORS
    )
