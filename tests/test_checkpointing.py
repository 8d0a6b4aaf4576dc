"""Checkpoint save/load round-trips: pickle (reference-layout) and orbax
async (TPU.async_checkpointing)."""

import numpy as np
import pytest

import jax

from ivlnce_tpu.config import get_config


def _make_trainer(tmp_path, async_ckpt):
    from ivlnce_tpu.trainers.base_trainer import BaseVLNCETrainer

    config = get_config().clone()
    config.defrost()
    config.MODEL.policy_name = "MapCMAPolicy"
    config.MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings = False
    config.MODEL.INSTRUCTION_ENCODER.vocab_size = 16
    config.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT = 64
    config.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH = 64
    config.CHECKPOINT_FOLDER = str(tmp_path)
    config.EVAL.SAVE_RESULTS = False
    config.TPU.async_checkpointing = async_ckpt
    config.freeze()
    trainer = BaseVLNCETrainer(config)
    trainer._initialize_policy(config, load_from_ckpt=False)
    return trainer


@pytest.mark.parametrize("async_ckpt", [False, True])
def test_checkpoint_roundtrip(tmp_path, async_ckpt):
    if async_ckpt:
        pytest.importorskip("orbax.checkpoint")
    trainer = _make_trainer(tmp_path, async_ckpt)
    trainer.save_checkpoint("ckpt.7.pth", dagger_it=1, epoch=7, step_id=42)
    if async_ckpt and getattr(trainer, "_orbax", None) is not None:
        trainer._orbax.wait_until_finished()

    loaded = trainer.load_checkpoint(str(tmp_path / "ckpt.7.pth"))
    assert loaded["epoch"] == 7
    assert loaded["step_id"] == 42
    orig = jax.tree_util.tree_leaves(trainer.params)
    restored = jax.tree_util.tree_leaves(loaded["params"])
    assert len(orig) == len(restored)
    for a, b in zip(orig, restored):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
