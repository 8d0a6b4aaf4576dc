"""Per-episode instruction-feature caching (base_trainer.
_cache_instruction_features): the bi-LSTM runs only at episode
boundaries, and cached features are numerically identical to inline
encoding."""

import numpy as np
import pytest

import jax

from ivlnce_tpu.config import get_config
from ivlnce_tpu.models import instruction_encoder as IE
from ivlnce_tpu.models.policy import MapCMAPolicy
from ivlnce_tpu.trainers.base_trainer import BaseVLNCETrainer


@pytest.fixture(scope="module")
def trainer():
    config = get_config().clone()
    config.defrost()
    config.MODEL.policy_name = "MapCMAPolicy"
    config.MODEL.INSTRUCTION_ENCODER.vocab_size = 60
    config.MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings = False
    config.RL.POLICY.OBS_TRANSFORMS.ENABLED_TRANSFORMS = []
    config.freeze()
    t = BaseVLNCETrainer.__new__(BaseVLNCETrainer)
    t.config = config
    t.policy = MapCMAPolicy.from_config(
        config, {"depth_hw": 64, "map_hw": 64}
    )
    t.params = t.policy.init_params(jax.random.PRNGKey(0))
    t._jit_cache = {}
    t._txt_cache_tokens = None
    return t


def _tokens(rng, b=2, t=9):
    tok = rng.integers(1, 60, (b, t)).astype(np.int32)
    tok[0, 6:] = 0
    return tok


def test_cache_hits_within_episode_and_invalidates_on_change(trainer, rng):
    tok1 = _tokens(rng)
    d1 = trainer._cache_instruction_features({"instruction": tok1})
    assert "instruction_features" in d1 and "instruction" not in d1
    feats1 = d1["instruction_features"]

    # same tokens -> cache hit (the exact same device array comes back)
    d2 = trainer._cache_instruction_features({"instruction": tok1.copy()})
    assert d2["instruction_features"] is feats1

    # new episode (different tokens) -> re-encode
    tok2 = _tokens(np.random.default_rng(99))
    d3 = trainer._cache_instruction_features({"instruction": tok2})
    assert d3["instruction_features"] is not feats1
    assert not np.allclose(
        np.asarray(d3["instruction_features"]), np.asarray(feats1)
    )


def test_cached_features_match_inline_encoding(trainer, rng):
    tok = _tokens(rng)
    d = trainer._cache_instruction_features({"instruction": tok})
    cfg = trainer.policy.model_config.INSTRUCTION_ENCODER
    inline = IE.apply_instruction_encoder(
        trainer.params["instruction_encoder"], cfg, {"instruction": tok}
    )
    np.testing.assert_allclose(
        np.asarray(d["instruction_features"]), np.asarray(inline),
        atol=1e-6,
    )


def test_cache_invalidates_after_param_update(trainer, rng):
    tok = _tokens(rng)
    trainer._cache_instruction_features({"instruction": tok})
    # _update_agent resets the cache marker (params changed)
    trainer._txt_cache_tokens = None
    d = trainer._cache_instruction_features({"instruction": tok})
    assert d["instruction_features"] is not None
