"""End-to-end trainer tests on FakeSim (VERDICT item 4).

(a) a full DAgger collect -> train -> checkpoint cycle through the
    registered trainer (reference dagger_trainer.py:506-649);
(b) episodic eval of that checkpoint producing stats_ckpt JSON
    (base_il_trainer.py:313-583);
(c) iterative eval producing iterative_stats/all_stats/dtw_data JSONs
    with a finite tour-nDTW (base_il_trainer.py:585-928).

Everything runs at miniature scale (64^2 depth, 2 lanes, 2-4 episodes)
so the whole file stays within a CI-friendly budget; compile time
dominates, not simulation.
"""

import glob
import json
import os

import numpy as np
import pytest

import ivlnce_tpu.envs.env  # noqa: F401 — registration side effects
import ivlnce_tpu.mapping.obs_transforms  # noqa: F401
import ivlnce_tpu.models  # noqa: F401
import ivlnce_tpu.tasks  # noqa: F401
import ivlnce_tpu.trainers  # noqa: F401
from ivlnce_tpu.config import get_config
from ivlnce_tpu.utils.registry import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_config(tmp_path, trainer_name, iterative):
    os.chdir(REPO)
    config = get_config(
        "configs/fake/map_cma_train_tf.yaml"
        if iterative
        else "configs/fake/map_cma_train_tf.yaml"
    ).clone()
    config.defrost()
    config.TRAINER_NAME = trainer_name
    config.NUM_ENVIRONMENTS = 2
    config.CHECKPOINT_FOLDER = str(tmp_path / "ckpts")
    config.TENSORBOARD_DIR = str(tmp_path / "tb")
    config.RESULTS_DIR = str(tmp_path / "results")
    config.EVAL_CKPT_PATH_DIR = str(tmp_path / "ckpts" / "ckpt.0.pth")
    config.LOG_FILE = str(tmp_path / "log")
    config.VIDEO_OPTION = []
    config.IL.epochs = 1
    config.IL.batch_size = 2
    config.IL.DAGGER.iterations = 1
    config.IL.DAGGER.update_size = 3
    config.IL.DAGGER.lmdb_features_dir = str(tmp_path / "traj")
    config.EVAL.SPLIT = "val_seen"
    config.EVAL.EPISODE_COUNT = 2
    config.EVAL.SAVE_RESULTS = True
    # miniature sensors: compile time scales with frame size
    t = config.TASK_CONFIG
    t.ENVIRONMENT.MAX_EPISODE_STEPS = 25
    t.SIMULATOR.DEPTH_SENSOR.HEIGHT = 64
    t.SIMULATOR.DEPTH_SENSOR.WIDTH = 64
    t.SIMULATOR.RGB_SENSOR.HEIGHT = 64
    t.SIMULATOR.RGB_SENSOR.WIDTH = 64
    t.ENVIRONMENT.ITERATIVE.ENABLED = iterative
    if not iterative:
        config.ENV_NAME = "VLNCEDaggerEnv"
    return config


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """One collect+train cycle shared by the eval tests."""
    tmp_path = tmp_path_factory.mktemp("e2e")
    config = _tiny_config(tmp_path, "iterative_collection_dagger", True)
    config.freeze()
    trainer = registry.get_trainer(config.TRAINER_NAME)(config)
    trainer.train()
    ckpts = sorted(glob.glob(str(tmp_path / "ckpts" / "*.pth")))
    assert ckpts, "training produced no checkpoint"
    return tmp_path, config, ckpts


def test_dagger_cycle_produces_checkpoint_and_store(trained):
    tmp_path, config, ckpts = trained
    # iterative_collection_dagger trains EPISODICALLY: the store holds
    # plain episode records and NO tours index (only iterative_dagger
    # passes save_tour_idx_data=True, reference
    # iterative_dagger_trainer.py:179-182)
    from ivlnce_tpu.trainers.trajectory_store import TrajectoryStore

    with TrajectoryStore(str(tmp_path / "traj")) as store:
        assert store.count() >= 3
        obs, prev_actions, oracle_actions = store.get(0)
        assert len(prev_actions) == len(oracle_actions) > 0
        assert "occupancy_map" in obs and "semantic_map" in obs
    # checkpoint loads through the trainer's own loader
    trainer = registry.get_trainer(config.TRAINER_NAME)(config)
    ckpt = trainer.load_checkpoint(ckpts[0])
    assert "params" in ckpt


def test_episodic_eval_writes_stats(trained):
    tmp_path, config, ckpts = trained
    config = config.clone()
    config.defrost()
    config.IL.ckpt_to_load = ckpts[0]
    config.EVAL_CKPT_PATH_DIR = ckpts[0]
    config.TASK_CONFIG.ENVIRONMENT.ITERATIVE.ENABLED = False
    config.ENV_NAME = "VLNCEDaggerEnv"
    config.freeze()
    trainer = registry.get_trainer(config.TRAINER_NAME)(config)
    trainer.eval()

    stats_files = glob.glob(
        str(tmp_path / "results" / "stats_ckpt_*_val_seen.json")
    )
    assert stats_files, "episodic eval wrote no stats JSON"
    with open(stats_files[0]) as f:
        stats = json.load(f)
    for key in ("success", "spl", "distance_to_goal", "ndtw"):
        assert key in stats and np.isfinite(stats[key]), (key, stats)


def test_iterative_eval_writes_stats_and_tndtw(trained):
    tmp_path, config, ckpts = trained
    config = config.clone()
    config.defrost()
    config.IL.ckpt_to_load = ckpts[0]
    config.EVAL_CKPT_PATH_DIR = ckpts[0]
    config.EVAL.ITERATIVE_GT_PATHS = "data/datasets/fake/gt_ndtw.json"
    config.freeze()
    trainer = registry.get_trainer(config.TRAINER_NAME)(config)
    trainer.eval()

    it_stats = glob.glob(
        str(tmp_path / "results" / "iterative_stats_ckpt_*_val_seen.json")
    )
    assert it_stats, "iterative eval wrote no stats JSON"
    with open(it_stats[0]) as f:
        stats = json.load(f)
    assert "tndtw" in stats and np.isfinite(stats["tndtw"]), stats
    all_stats = glob.glob(
        str(
            tmp_path / "results" / "iterative_all_stats_ckpt_*_val_seen.json"
        )
    )
    assert all_stats
    dtw_files = glob.glob(
        str(tmp_path / "results" / "dtw_data_ckpt_*_val_seen.json")
    )
    assert dtw_files
    with open(dtw_files[0]) as f:
        dtw = json.load(f)
    # dtw data records (position, phase, episode_id) rows per tour
    assert dtw and all(len(v) > 0 for v in dtw.values())


def test_iterative_dagger_tour_bptt_cycle(tmp_path_factory):
    """The third trainer family end to end: iterative collection with the
    tours index at store key 0, TourSampler binpacking, and the
    truncated-BPTT train loop with the rnn carry across batches
    (reference iterative_dagger_trainer.py:96-253)."""
    tmp_path = tmp_path_factory.mktemp("tour")
    os.chdir(REPO)
    config = get_config("configs/fake/tour_cma_train.yaml").clone()
    config.defrost()
    config.NUM_ENVIRONMENTS = 2
    config.CHECKPOINT_FOLDER = str(tmp_path / "ckpts")
    config.TENSORBOARD_DIR = str(tmp_path / "tb")
    config.RESULTS_DIR = str(tmp_path / "results")
    config.LOG_FILE = str(tmp_path / "log")
    config.IL.epochs = 1
    config.IL.batch_size = 2
    config.IL.DAGGER.iterations = 1
    config.IL.DAGGER.update_size = 3
    config.IL.DAGGER.lmdb_features_dir = str(tmp_path / "traj")
    t = config.TASK_CONFIG
    t.ENVIRONMENT.MAX_EPISODE_STEPS = 20
    t.SIMULATOR.DEPTH_SENSOR.HEIGHT = 64
    t.SIMULATOR.DEPTH_SENSOR.WIDTH = 64
    t.SIMULATOR.RGB_SENSOR.HEIGHT = 64
    t.SIMULATOR.RGB_SENSOR.WIDTH = 64
    config.freeze()

    trainer = registry.get_trainer(config.TRAINER_NAME)(config)
    trainer.train()

    ckpts = glob.glob(str(tmp_path / "ckpts" / "*.pth"))
    assert ckpts, "tour-BPTT training produced no checkpoint"
    # the tours index lives at store key 0 for this trainer
    from ivlnce_tpu.trainers.trajectory_store import TrajectoryStore

    with TrajectoryStore(str(tmp_path / "traj")) as store:
        idx = store.get(0)
        assert "tours_to_idxs" in idx
        assert sum(len(v) for v in idx["tours_to_idxs"].values()) >= 3


def test_known_maps_eval_preloads_and_writes_stats(trained):
    """Fourth e2e scenario (VERDICT r2 item 7): known-maps eval drives
    GTSemanticsKnownMapper through _eval_checkpoint — per-scene npz
    preloads (reference mapper.py:851-881) populate lanes instead of
    frame accumulation, and the stats JSON lands."""
    tmp_path, config, ckpts = trained
    results = str(tmp_path / "results_known")
    config = config.clone()
    config.defrost()
    config.IL.ckpt_to_load = ckpts[0]
    config.EVAL_CKPT_PATH_DIR = ckpts[0]
    config.RESULTS_DIR = results
    config.EVAL.ITERATIVE_GT_PATHS = "data/datasets/fake/gt_ndtw.json"
    config.RL.POLICY.OBS_TRANSFORMS.ENABLED_TRANSFORMS = [
        "GTSemanticsKnownMapper"
    ]
    config.freeze()
    trainer = registry.get_trainer(config.TRAINER_NAME)(config)
    trainer.eval()

    it_stats = glob.glob(
        os.path.join(results, "iterative_stats_ckpt_*_val_seen.json")
    )
    assert it_stats, "known-maps eval wrote no stats JSON"
    with open(it_stats[0]) as f:
        stats = json.load(f)
    assert "tndtw" in stats and np.isfinite(stats["tndtw"]), stats

    # the known mapper actually loaded scene clouds into lanes
    mapper = trainer.obs_transforms[0]
    assert mapper.known_maps
    loaded = [n for n in mapper._loaded_env_names if n is not None]
    assert loaded, "no lane ever preloaded a known map"
    from ivlnce_tpu.ops.scatter import EMPTY_KEY

    occupied = int((np.asarray(mapper.state.key) != EMPTY_KEY).sum())
    assert occupied > 0, "preloaded world grids are empty"
    # known-map lanes never accumulate frames -> zero dropped telemetry
    assert mapper.dropped_point_count() == 0


def test_episodic_eval_with_videos_writes_files(trained):
    """VIDEO_OPTION=['disk'] drives the full qualitative-eval surface:
    TopDownMapVLNCE measure + frame composition with occupancy/semantic
    map panels + metric-stamped video files (reference
    base_il_trainer.py:476-486, habitat_extensions/utils.py:103-143)."""
    tmp_path, config, ckpts = trained
    config = config.clone()
    config.defrost()
    config.IL.ckpt_to_load = ckpts[0]
    config.EVAL_CKPT_PATH_DIR = ckpts[0]
    config.TASK_CONFIG.ENVIRONMENT.ITERATIVE.ENABLED = False
    config.ENV_NAME = "VLNCEDaggerEnv"
    config.VIDEO_OPTION = ["disk"]
    config.VIDEO_DIR = str(tmp_path / "videos")
    # own results dir: the module-shared one already holds the episodic
    # test's stats JSON, and eval resume-by-skip (reference
    # base_il_trainer.py:383-390) would skip this checkpoint entirely
    config.RESULTS_DIR = str(tmp_path / "results_video")
    config.EVAL.EPISODE_COUNT = 1
    config.freeze()
    trainer = registry.get_trainer(config.TRAINER_NAME)(config)
    trainer.eval()

    videos = glob.glob(str(tmp_path / "videos" / "*"))
    assert videos, "video eval wrote no files"
    # metric-stamped filename (utils.py:103-143 naming convention)
    assert any("episode" in os.path.basename(v) for v in videos), videos
    assert os.path.getsize(videos[0]) > 0


def test_rxr_eval_end_to_end(tmp_path_factory):
    """Fifth e2e scenario (VERDICT r3 missing #5): RxR episodic eval —
    role-split dataset loading (reference task.py:208-315), precomputed
    (512, 768) instruction features through RXR_INSTRUCTION_SENSOR
    (sensors.py:118-158), the rxr_instruction wire path, and the
    per-episode feature cache — through _eval_checkpoint to a stats JSON."""
    tmp_path = tmp_path_factory.mktemp("rxr")
    os.chdir(REPO)
    config = get_config("configs/fake/rxr_eval.yaml").clone()
    config.defrost()
    config.NUM_ENVIRONMENTS = 2
    config.CHECKPOINT_FOLDER = str(tmp_path / "ckpts")
    config.EVAL_CKPT_PATH_DIR = str(tmp_path / "ckpts" / "ckpt.0.pth")
    config.TENSORBOARD_DIR = str(tmp_path / "tb")
    config.RESULTS_DIR = str(tmp_path / "results")
    config.LOG_FILE = str(tmp_path / "log")
    config.VIDEO_OPTION = []
    t = config.TASK_CONFIG
    t.ENVIRONMENT.MAX_EPISODE_STEPS = 15
    t.SIMULATOR.DEPTH_SENSOR.HEIGHT = 64
    t.SIMULATOR.DEPTH_SENSOR.WIDTH = 64
    t.SIMULATOR.RGB_SENSOR.HEIGHT = 64
    t.SIMULATOR.RGB_SENSOR.WIDTH = 64
    config.freeze()

    # the RxR model is architecturally distinct (768-wide bi-LSTM input,
    # no token embedding): save a fresh checkpoint and eval it
    trainer = registry.get_trainer(config.TRAINER_NAME)(config)
    trainer._initialize_policy(config, load_from_ckpt=False)
    trainer.save_checkpoint("ckpt.0.pth")
    trainer.eval()

    stats_files = glob.glob(
        str(tmp_path / "results" / "stats_ckpt_*_val_seen.json")
    )
    assert stats_files, "RxR eval wrote no stats JSON"
    with open(stats_files[0]) as f:
        stats = json.load(f)
    for key in ("success", "spl", "distance_to_goal", "ndtw"):
        assert key in stats and np.isfinite(stats[key]), (key, stats)

    # the encoder consumed cached rxr features (not token embeddings)
    assert "embedding" not in trainer.params["instruction_encoder"]
    assert trainer._txt_cache_tokens.shape[1:] == (512, 768)
