"""Experiment-level config defaults.

Mirrors the reference's two-tier config (reference:
ivlnce_baselines/config/default.py:14-212): experiment keys + an embedded
TASK_CONFIG tree built from BASE_TASK_CONFIG_PATH. TPU-specific additions
live under the ``TPU`` node and default to values that change no reference
behavior.
"""

from typing import List, Optional, Union

from ivlnce_tpu.config.node import ConfigNode as CN
from ivlnce_tpu.config.task_default import get_extended_config as get_task_config

CONFIG_FILE_SEPARATOR = ","

_C = CN()
_C.BASE_TASK_CONFIG_PATH = "configs/task/vlnce_task.yaml"
_C.TASK_CONFIG = CN()
_C.CMD_TRAILING_OPTS = []
_C.TRAINER_NAME = "dagger"
_C.ENV_NAME = "VLNCEDaggerEnv"
_C.SIMULATOR_GPU_IDS = [0]
_C.TORCH_GPU_ID = 0
_C.VIDEO_OPTION = []  # options: "disk", "tensorboard"
_C.VIDEO_DIR = "data/videos/debug"
_C.TENSORBOARD_DIR = "data/tensorboard_dirs/debug"
_C.RESULTS_DIR = "data/checkpoints/pretrained/evals"
_C.NUM_ENVIRONMENTS = 4
_C.SENSORS = ["DEPTH_SENSOR", "RGB_SENSOR"]
_C.CHECKPOINT_FOLDER = "data/checkpoints"
_C.EVAL_CKPT_PATH_DIR = "data/checkpoints"
_C.LOG_FILE = "train.log"
_C.LOG_INTERVAL = 10
_C.CHECKPOINT_INTERVAL = -1
_C.NUM_CHECKPOINTS = 10
_C.NUM_UPDATES = 10000
_C.TOTAL_NUM_STEPS = -1.0
_C.VERBOSE = True

# -----------------------------------------------------------------------------
# EVAL
# -----------------------------------------------------------------------------
_C.EVAL = CN()
_C.EVAL.SPLIT = "val_seen"
_C.EVAL.EPISODE_COUNT = -1
_C.EVAL.LANGUAGES = ["en-US", "en-IN"]
_C.EVAL.SAMPLE = False
_C.EVAL.USE_CKPT_CONFIG = False
_C.EVAL.SAVE_RESULTS = True
_C.EVAL.ITERATIVE_MAP_RESET = "iterative"  # "episodic" or "iterative"
_C.EVAL.ITERATIVE_GT_PATHS = "data/gt_ndtw.json"
_C.EVAL.START_FROM = -1

# -----------------------------------------------------------------------------
# IMITATION LEARNING
# -----------------------------------------------------------------------------
_C.IL = CN()
_C.IL.lr = 2.5e-4
_C.IL.batch_size = 5
_C.IL.epochs = 4
_C.IL.use_iw = True
# inflection coefficient: 1.9 for RxR GT trajectories, 3.2 for R2R
_C.IL.inflection_weight_coef = 3.2
_C.IL.load_from_ckpt = False
_C.IL.ckpt_to_load = "data/checkpoints/ckpt.0.pth"
_C.IL.is_requeue = False
# trajectory decode worker PROCESSES (the reference DataLoader's
# num_workers=3, dagger_trainer.py:568-576). 0 = in-process decode behind
# the prefetch thread — right on few-core hosts; set 2-4 in production
_C.IL.decode_workers = 0

_C.IL.DAGGER = CN()
_C.IL.DAGGER.iterations = 10
_C.IL.DAGGER.update_size = 5000
_C.IL.DAGGER.p = 0.75
_C.IL.DAGGER.expert_policy_sensor = "SHORTEST_PATH_SENSOR"
_C.IL.DAGGER.expert_policy_sensor_uuid = "shortest_path_sensor"
_C.IL.DAGGER.lmdb_map_size = 1.0e13
_C.IL.DAGGER.lmdb_fp16 = False
_C.IL.DAGGER.lmdb_commit_frequency = 500
_C.IL.DAGGER.preload_lmdb_features = False
_C.IL.DAGGER.lmdb_features_dir = (
    "data/trajectories_dirs/debug/trajectories.lmdb"
)
_C.IL.DAGGER.drop_existing_lmdb_features = True

# -----------------------------------------------------------------------------
# POLICY / OBS TRANSFORMS
# -----------------------------------------------------------------------------
_C.RL = CN()
_C.RL.POLICY = CN()
_C.RL.POLICY.OBS_TRANSFORMS = CN()
_C.RL.POLICY.OBS_TRANSFORMS.ENABLED_TRANSFORMS = []
_C.RL.POLICY.OBS_TRANSFORMS.EGOCENTRIC_MAPPER = CN()
_C.RL.POLICY.OBS_TRANSFORMS.EGOCENTRIC_MAPPER.resolution_meters = 0.1
_C.RL.POLICY.OBS_TRANSFORMS.EGOCENTRIC_MAPPER.height_clip = 0.1
_C.RL.POLICY.OBS_TRANSFORMS.EGOCENTRIC_MAPPER.height_meters = 6.4
_C.RL.POLICY.OBS_TRANSFORMS.EGOCENTRIC_MAPPER.width_meters = 6.4

# -----------------------------------------------------------------------------
# MODEL
# -----------------------------------------------------------------------------
_C.MODEL = CN()
_C.MODEL.policy_name = "CMAPolicy"

_C.MODEL.ablate_depth = False
_C.MODEL.ablate_rgb = False
_C.MODEL.ablate_map = False
_C.MODEL.ablate_instruction = False
_C.MODEL.tour_memory = False
_C.MODEL.tour_memory_variant = False
_C.MODEL.memory_at_end = False
_C.MODEL.train_unrolled = False
_C.MODEL.disable_tour_memory = False

_C.MODEL.INSTRUCTION_ENCODER = CN()
_C.MODEL.INSTRUCTION_ENCODER.sensor_uuid = "instruction"
_C.MODEL.INSTRUCTION_ENCODER.vocab_size = 2504
_C.MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings = True
_C.MODEL.INSTRUCTION_ENCODER.embedding_file = (
    "data/datasets/R2R_VLNCE_v1-3_preprocessed/embeddings.json.gz"
)
_C.MODEL.INSTRUCTION_ENCODER.dataset_vocab = (
    "data/datasets/R2R_VLNCE_v1-3_preprocessed/train/train.json.gz"
)
_C.MODEL.INSTRUCTION_ENCODER.fine_tune_embeddings = False
_C.MODEL.INSTRUCTION_ENCODER.embedding_size = 50
_C.MODEL.INSTRUCTION_ENCODER.hidden_size = 128
_C.MODEL.INSTRUCTION_ENCODER.rnn_type = "LSTM"
_C.MODEL.INSTRUCTION_ENCODER.final_state_only = True
_C.MODEL.INSTRUCTION_ENCODER.bidirectional = True
_C.MODEL.INSTRUCTION_ENCODER.max_length = 200

_C.MODEL.RGB_ENCODER = CN()
_C.MODEL.RGB_ENCODER.cnn_type = "TorchVisionResNet50"
_C.MODEL.RGB_ENCODER.output_size = 256
_C.MODEL.RGB_ENCODER.trainable = False

_C.MODEL.DEPTH_ENCODER = CN()
_C.MODEL.DEPTH_ENCODER.cnn_type = "VlnResnetDepthEncoder"
_C.MODEL.DEPTH_ENCODER.output_size = 128
_C.MODEL.DEPTH_ENCODER.backbone = "resnet50"
_C.MODEL.DEPTH_ENCODER.ddppo_checkpoint = (
    "data/ddppo-models/gibson-2plus-resnet50.pth"
)
_C.MODEL.DEPTH_ENCODER.trainable = False

_C.MODEL.SEMANTIC_MAP_ENCODER = CN()
_C.MODEL.SEMANTIC_MAP_ENCODER.classname = "SemanticMapEncoder"
_C.MODEL.SEMANTIC_MAP_ENCODER.num_semantic_classes = 13
_C.MODEL.SEMANTIC_MAP_ENCODER.output_size = 256
_C.MODEL.SEMANTIC_MAP_ENCODER.channels = 32
_C.MODEL.SEMANTIC_MAP_ENCODER.last_ch_mult = 4
_C.MODEL.SEMANTIC_MAP_ENCODER.trainable = True
_C.MODEL.SEMANTIC_MAP_ENCODER.from_pretrained = False
_C.MODEL.SEMANTIC_MAP_ENCODER.checkpoint = ""
_C.MODEL.SEMANTIC_MAP_ENCODER.custom_lr = False
_C.MODEL.SEMANTIC_MAP_ENCODER.lr = 2.5e-6

_C.MODEL.STATE_ENCODER = CN()
_C.MODEL.STATE_ENCODER.hidden_size = 512
_C.MODEL.STATE_ENCODER.rnn_type = "GRU"

_C.MODEL.PROGRESS_MONITOR = CN()
_C.MODEL.PROGRESS_MONITOR.use = False
_C.MODEL.PROGRESS_MONITOR.alpha = 1.0

# -----------------------------------------------------------------------------
# TPU (new; no reference equivalent)
# -----------------------------------------------------------------------------
_C.TPU = CN()
# dtype for the policy compute path: "float32" (parity) or "bfloat16" (speed)
_C.TPU.compute_dtype = "float32"
# data-parallel IL update (parallel/train.sharded_train_step): 1 = off,
# N = shard batch lanes over up to N devices, -1 = all local devices.
# Auto-falls back to single-device when lanes don't divide evenly.
_C.TPU.data_parallel_devices = -1
# world voxel grid per lane: cells at half map resolution. 0 = auto-size
# from the dataset split's scene geometry AND center each lane's grid on
# its scene (mapping/scene_bounds.py) — the dense grid is 8 bytes/cell/
# lane of HBM, so scene-sized grids unlock higher lane counts
_C.TPU.world_grid_cells = 1024
# auto-sizing margin beyond the episodes' recorded positions (walls and
# furniture seen by the depth camera extend past the navigable paths).
# TOTAL meters added to the scene span: the grid is scene-centered, so
# the slack is margin/2 per side (default 2.5 m/side) — plus whatever
# the power-of-two rounding grants. Undersizing is surfaced by the
# dropped-point telemetry, never silent.
_C.TPU.world_grid_margin_meters = 5.0
# known-map preload buffer (points/lane). Scene clouds larger than this
# are truncated WITH a logged warning (the reference loads whole npz
# files, mapper.py:283-294); raise it for big production MP3D scenes
_C.TPU.known_map_max_points = 2 ** 18
# mapper compact-list capacity (entries/lane); 0 = auto (2x the depth
# frame, the safe default). Smaller values shrink the per-step sort
# volume (the fused step's dominant cost) but flush to the dense grid
# more often; values below one frame are rejected (mapper.validate)
_C.TPU.mapper_list_capacity = 0
# winner-compaction implementation in the mapper's merge/rasterize hot
# path: "sort" or "scatter" (identical results; see ops/scatter.py)
_C.TPU.mapper_compact = "sort"
# use the Pallas scatter kernel in the mapper accumulate path (falls back
# to the XLA scatter path when Mosaic cannot lower it, e.g. interpret-only)
# donate step-state buffers (mapper world grid, RNN carry) to jit for
# in-place HBM reuse; halves the mapper's peak HBM (the two-level flush
# would otherwise double-buffer the big grid). Measured working through
# the axon tunnel backend this round (round 1 rejected it).
_C.TPU.donate_state = True
# ship normalized depth to the device as uint16 (expanded inside the act
# executable; <=7.7e-6 quantization). Halves the largest sensor upload —
# the live loops are upload-bound on constrained transports (BASELINE.md)
_C.TPU.wire_depth_uint16 = True
# BPTT encode chunking: frames per rematerialized encoder chunk in
# build_distribution (0 = off: encode all T*N frames in one batch, the
# reference's shape). Large T*N (e.g. T=64 x N=64 = 4096 depth frames)
# OOMs a single chip's HBM on stored ResNet activations; a non-zero
# chunk scans the encoders over ceil(T*N/chunk) jax.checkpoint'd chunks
# so the backward recomputes them — standard TPU remat, ~1.3x encoder
# FLOPs for an order-of-magnitude activation-memory cut. Caveat: with a
# TRAINABLE map encoder the train-mode BatchNorm normalizes per chunk
# (ghost batch norm) instead of over the full T*N batch.
_C.TPU.train_encode_chunk = 0
# orbax checkpointing directory (defaults next to CHECKPOINT_FOLDER)
_C.TPU.async_checkpointing = False
# non-empty: capture a jax.profiler trace of the first eval/train steps
# into this directory (also via IVLNCE_PROFILE_DIR env var)
_C.TPU.profile_dir = ""


def purge_keys(config: CN, keys: List[str]) -> None:
    for k in keys:
        if k in config:
            del config[k]


def get_config(
    config_paths: Optional[Union[List[str], str]] = None,
    opts: Optional[list] = None,
) -> CN:
    """Create a unified config: defaults <- exp YAML(s) <- task YAML <- opts.

    Follows reference ivlnce_baselines/config/default.py:172-212: whenever a
    merged file changes BASE_TASK_CONFIG_PATH, TASK_CONFIG is rebuilt from
    that task YAML.
    """
    config = _C.clone()
    config.TASK_CONFIG = get_task_config()

    if config_paths:
        if isinstance(config_paths, str):
            if CONFIG_FILE_SEPARATOR in config_paths:
                config_paths = config_paths.split(CONFIG_FILE_SEPARATOR)
            else:
                config_paths = [config_paths]

        prev_task_config = ""
        for config_path in config_paths:
            config.merge_from_file(config_path)
            if config.BASE_TASK_CONFIG_PATH != prev_task_config:
                config.TASK_CONFIG = get_task_config(
                    config.BASE_TASK_CONFIG_PATH
                )
                prev_task_config = config.BASE_TASK_CONFIG_PATH
                # re-apply the experiment file so its TASK_CONFIG overrides
                # land on top of the freshly built task config (the rebuild
                # above would otherwise clobber them; the second merge is
                # idempotent for every other key)
                config.merge_from_file(config_path)

    if opts:
        config.CMD_TRAILING_OPTS = opts
        config.merge_from_list(opts)

    config.freeze()
    return config
