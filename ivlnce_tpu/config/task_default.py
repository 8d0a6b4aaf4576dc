"""Task-level config defaults (the habitat-side config tree).

Reproduces the key surface of habitat-lab's default config plus the
IVLN-CE task extensions (reference: habitat_extensions/config/default.py).
Only the keys consumed by this framework (and the reference's YAMLs) are
defined; unknown YAML keys merge in freely, matching habitat's permissive
Config behavior.
"""

from ivlnce_tpu.config.node import ConfigNode as CN

_C = CN()
_C.SEED = 100

# -----------------------------------------------------------------------------
# ENVIRONMENT
# -----------------------------------------------------------------------------
_C.ENVIRONMENT = CN()
_C.ENVIRONMENT.MAX_EPISODE_STEPS = 1000
_C.ENVIRONMENT.MAX_EPISODE_SECONDS = 10000000
_C.ENVIRONMENT.ITERATOR_OPTIONS = CN()
_C.ENVIRONMENT.ITERATOR_OPTIONS.CYCLE = True
_C.ENVIRONMENT.ITERATOR_OPTIONS.SHUFFLE = True
_C.ENVIRONMENT.ITERATOR_OPTIONS.GROUP_BY_SCENE = True
_C.ENVIRONMENT.ITERATOR_OPTIONS.NUM_EPISODE_SAMPLE = -1
_C.ENVIRONMENT.ITERATOR_OPTIONS.MAX_SCENE_REPEAT_EPISODES = -1
_C.ENVIRONMENT.ITERATOR_OPTIONS.MAX_SCENE_REPEAT_STEPS = 10000
_C.ENVIRONMENT.ITERATOR_OPTIONS.STEP_REPETITION_RANGE = 0.2
# tour-based iterator extensions (reference: config/default.py:13-17)
_C.ENVIRONMENT.ITERATOR_OPTIONS.SHUFFLE_TOURS = True
_C.ENVIRONMENT.ITERATOR_OPTIONS.SHUFFLE_EPISODES = True
_C.ENVIRONMENT.ITERATOR_OPTIONS.specify_episode_order = False

# iterative environment (reference: config/default.py:22-44)
_C.ENVIRONMENT.ITERATIVE = CN()
_C.ENVIRONMENT.ITERATIVE.ENABLED = False
_C.ENVIRONMENT.ITERATIVE.ENV_NAME = "VLNCEIterativeEnv"
_C.ENVIRONMENT.ITERATIVE.PRECISE_EPISODE_START = False
_C.ENVIRONMENT.ITERATIVE.ORACLE_STOP_ON_ERROR = False
_C.ENVIRONMENT.ITERATIVE.ORACLE_STEP_ERROR_LIMIT = -1
_C.ENVIRONMENT.ITERATIVE.ORACLE_GOAL_PHASE = True
_C.ENVIRONMENT.ITERATIVE.ORACLE_PHASES = True

# -----------------------------------------------------------------------------
# SIMULATOR
# -----------------------------------------------------------------------------
_C.SIMULATOR = CN()
_C.SIMULATOR.TYPE = "Sim-v0"
_C.SIMULATOR.FORWARD_STEP_SIZE = 0.25  # meters
_C.SIMULATOR.TURN_ANGLE = 15  # degrees
_C.SIMULATOR.TILT_ANGLE = 15
_C.SIMULATOR.ACTION_SPACE_CONFIG = "v0"
_C.SIMULATOR.SCENE = ""
_C.SIMULATOR.SEED = _C.SEED
_C.SIMULATOR.DEFAULT_AGENT_ID = 0
_C.SIMULATOR.HABITAT_SIM_V0 = CN()
_C.SIMULATOR.HABITAT_SIM_V0.GPU_DEVICE_ID = 0
_C.SIMULATOR.HABITAT_SIM_V0.ALLOW_SLIDING = True

_C.SIMULATOR.RGB_SENSOR = CN()
_C.SIMULATOR.RGB_SENSOR.TYPE = "HabitatSimRGBSensor"
_C.SIMULATOR.RGB_SENSOR.HEIGHT = 480
_C.SIMULATOR.RGB_SENSOR.WIDTH = 640
_C.SIMULATOR.RGB_SENSOR.HFOV = 90
_C.SIMULATOR.RGB_SENSOR.POSITION = [0, 1.25, 0]
_C.SIMULATOR.RGB_SENSOR.ORIENTATION = [0.0, 0.0, 0.0]

_C.SIMULATOR.DEPTH_SENSOR = CN()
_C.SIMULATOR.DEPTH_SENSOR.TYPE = "HabitatSimDepthSensor"
_C.SIMULATOR.DEPTH_SENSOR.HEIGHT = 480
_C.SIMULATOR.DEPTH_SENSOR.WIDTH = 640
_C.SIMULATOR.DEPTH_SENSOR.HFOV = 90
_C.SIMULATOR.DEPTH_SENSOR.POSITION = [0, 1.25, 0]
_C.SIMULATOR.DEPTH_SENSOR.ORIENTATION = [0.0, 0.0, 0.0]
_C.SIMULATOR.DEPTH_SENSOR.MIN_DEPTH = 0.0
_C.SIMULATOR.DEPTH_SENSOR.MAX_DEPTH = 10.0
_C.SIMULATOR.DEPTH_SENSOR.NORMALIZE_DEPTH = True

_C.SIMULATOR.SEMANTIC_SENSOR = CN()
_C.SIMULATOR.SEMANTIC_SENSOR.TYPE = "HabitatSimSemanticSensor"
_C.SIMULATOR.SEMANTIC_SENSOR.HEIGHT = 480
_C.SIMULATOR.SEMANTIC_SENSOR.WIDTH = 640
_C.SIMULATOR.SEMANTIC_SENSOR.HFOV = 90
_C.SIMULATOR.SEMANTIC_SENSOR.POSITION = [0, 1.25, 0]
_C.SIMULATOR.SEMANTIC_SENSOR.ORIENTATION = [0.0, 0.0, 0.0]

_C.SIMULATOR.AGENT_0 = CN()
_C.SIMULATOR.AGENT_0.HEIGHT = 1.5
_C.SIMULATOR.AGENT_0.RADIUS = 0.1
_C.SIMULATOR.AGENT_0.SENSORS = ["RGB_SENSOR"]
_C.SIMULATOR.AGENT_0.IS_SET_START_STATE = False
_C.SIMULATOR.AGENTS = ["AGENT_0"]

# -----------------------------------------------------------------------------
# TASK
# -----------------------------------------------------------------------------
_C.TASK = CN()
_C.TASK.TYPE = "VLN-v0"
_C.TASK.SENSORS = []
_C.TASK.MEASUREMENTS = []
_C.TASK.POSSIBLE_ACTIONS = [
    "STOP",
    "MOVE_FORWARD",
    "TURN_LEFT",
    "TURN_RIGHT",
]
_C.TASK.SUCCESS_DISTANCE = 3.0
_C.TASK.INSTRUCTION_SENSOR_UUID = "instruction"

_C.TASK.SUCCESS = CN()
_C.TASK.SUCCESS.TYPE = "Success"
_C.TASK.SUCCESS.SUCCESS_DISTANCE = 3.0
_C.TASK.SPL = CN()
_C.TASK.SPL.TYPE = "SPL"
_C.TASK.DISTANCE_TO_GOAL = CN()
_C.TASK.DISTANCE_TO_GOAL.TYPE = "DistanceToGoal"
_C.TASK.DISTANCE_TO_GOAL.DISTANCE_TO = "POINT"

# sensors (reference: habitat_extensions/config/default.py:59-104)
_C.TASK.GLOBAL_GPS_SENSOR = CN()
_C.TASK.GLOBAL_GPS_SENSOR.TYPE = "GlobalGPSSensor"
_C.TASK.GLOBAL_GPS_SENSOR.DIMENSIONALITY = 3

_C.TASK.SEMANTIC12_SENSOR = CN()
_C.TASK.SEMANTIC12_SENSOR.TYPE = "Semantic12Sensor"
_C.TASK.SEMANTIC12_SENSOR.DIMENSIONALITY = 3

_C.TASK.WORLD_ROBOT_POSE_SENSOR = CN()
_C.TASK.WORLD_ROBOT_POSE_SENSOR.TYPE = "WorldRobotPoseSensor"
_C.TASK.WORLD_ROBOT_POSE_SENSOR.DIMENSIONALITY = 3

_C.TASK.WORLD_ROBOT_ORIENTATION_SENSOR = CN()
_C.TASK.WORLD_ROBOT_ORIENTATION_SENSOR.TYPE = "WorldRobotOrientationSensor"
_C.TASK.WORLD_ROBOT_ORIENTATION_SENSOR.DIMENSIONALITY = 3

_C.TASK.ENV_NAME_SENSOR = CN()
_C.TASK.ENV_NAME_SENSOR.TYPE = "EnvNameSensor"
_C.TASK.ENV_NAME_SENSOR.DIMENSIONALITY = 3

_C.TASK.RXR_INSTRUCTION_SENSOR = CN()
_C.TASK.RXR_INSTRUCTION_SENSOR.TYPE = "RxRInstructionSensor"
_C.TASK.RXR_INSTRUCTION_SENSOR.features_path = (
    "data/datasets/RxR_VLNCE_v0/text_features/rxr_{split}/"
    "{id:06}_{lang}_text_features.npz"
)

_C.TASK.SHORTEST_PATH_SENSOR = CN()
_C.TASK.SHORTEST_PATH_SENSOR.TYPE = "ShortestPathSensor"
_C.TASK.SHORTEST_PATH_SENSOR.GOAL_RADIUS = 0.5

_C.TASK.VLN_ORACLE_PROGRESS_SENSOR = CN()
_C.TASK.VLN_ORACLE_PROGRESS_SENSOR.TYPE = "VLNOracleProgressSensor"

# measures (reference: habitat_extensions/config/default.py:106-164)
_C.TASK.NDTW = CN()
_C.TASK.NDTW.TYPE = "NDTW"
_C.TASK.NDTW.SPLIT = "val_seen"
_C.TASK.NDTW.FDTW = True
_C.TASK.NDTW.GT_PATH = (
    "data/datasets/R2R_VLNCE_v1-3_preprocessed/{split}/{split}_gt.json.gz"
)
_C.TASK.NDTW.SUCCESS_DISTANCE = 3.0

_C.TASK.SDTW = CN()
_C.TASK.SDTW.TYPE = "SDTW"

_C.TASK.PATH_LENGTH = CN()
_C.TASK.PATH_LENGTH.TYPE = "PathLength"

_C.TASK.ORACLE_NAVIGATION_ERROR = CN()
_C.TASK.ORACLE_NAVIGATION_ERROR.TYPE = "OracleNavigationError"

_C.TASK.ORACLE_SUCCESS = CN()
_C.TASK.ORACLE_SUCCESS.TYPE = "OracleSuccess"
_C.TASK.ORACLE_SUCCESS.SUCCESS_DISTANCE = 3.0

_C.TASK.ORACLE_SPL = CN()
_C.TASK.ORACLE_SPL.TYPE = "OracleSPL"

_C.TASK.STEPS_TAKEN = CN()
_C.TASK.STEPS_TAKEN.TYPE = "StepsTaken"

_C.TASK.TOP_DOWN_MAP_VLNCE = CN()
_C.TASK.TOP_DOWN_MAP_VLNCE.TYPE = "TopDownMapVLNCE"
_C.TASK.TOP_DOWN_MAP_VLNCE.MAX_EPISODE_STEPS = _C.ENVIRONMENT.MAX_EPISODE_STEPS
_C.TASK.TOP_DOWN_MAP_VLNCE.MAP_RESOLUTION = 1024
_C.TASK.TOP_DOWN_MAP_VLNCE.DRAW_SOURCE_AND_TARGET = True
_C.TASK.TOP_DOWN_MAP_VLNCE.DRAW_BORDER = True
_C.TASK.TOP_DOWN_MAP_VLNCE.DRAW_SHORTEST_PATH = True
_C.TASK.TOP_DOWN_MAP_VLNCE.DRAW_REFERENCE_PATH = True
_C.TASK.TOP_DOWN_MAP_VLNCE.DRAW_FIXED_WAYPOINTS = True
_C.TASK.TOP_DOWN_MAP_VLNCE.DRAW_MP3D_AGENT_PATH = True
_C.TASK.TOP_DOWN_MAP_VLNCE.GRAPHS_FILE = "data/connectivity_graphs.pkl"
_C.TASK.TOP_DOWN_MAP_VLNCE.FOG_OF_WAR = CN()
_C.TASK.TOP_DOWN_MAP_VLNCE.FOG_OF_WAR.DRAW = True
_C.TASK.TOP_DOWN_MAP_VLNCE.FOG_OF_WAR.FOV = 90
_C.TASK.TOP_DOWN_MAP_VLNCE.FOG_OF_WAR.VISIBILITY_DIST = 5.0

# -----------------------------------------------------------------------------
# DATASET
# -----------------------------------------------------------------------------
_C.DATASET = CN()
_C.DATASET.TYPE = "VLN-CE-v1"
_C.DATASET.SPLIT = "train"
_C.DATASET.SCENES_DIR = "data/scene_datasets"
_C.DATASET.CONTENT_SCENES = ["*"]
_C.DATASET.DATA_PATH = (
    "data/datasets/R2R_VLNCE_v1-3_preprocessed/{split}/{split}.json.gz"
)
# tour extensions (reference: habitat_extensions/config/default.py:49-55)
_C.DATASET.MIN_TOUR_SIZE = -1
_C.DATASET.TOURS_FILE = ""
_C.DATASET.NUM_TOURS_SAMPLE = -1
_C.DATASET.EPISODES_PER_TOUR = -1
# RxR extensions (reference: habitat_extensions/config/default.py:168-172)
_C.DATASET.ROLES = ["guide"]
_C.DATASET.LANGUAGES = ["*"]
_C.DATASET.EPISODES_ALLOWED = ["*"]


def get_task_defaults():
    return _C.clone()


def get_extended_config(config_paths=None, opts=None):
    """Build a task config: defaults <- YAML file(s) <- opts.

    Mirrors reference habitat_extensions/config/default.py:175-214 including
    the iterator-option stripping for non-iterative runs and the NDTW split
    sync.
    """
    config = _C.clone()

    if config_paths:
        if isinstance(config_paths, str):
            config_paths = [config_paths]
        for config_path in config_paths:
            config.merge_from_file(config_path)

    if opts:
        config.merge_from_list(opts)

    # habitat's plain iterator has no tour keys; strip them when non-iterative
    if not config.ENVIRONMENT.ITERATIVE.ENABLED:
        iter_opts = {
            k: v
            for k, v in config.ENVIRONMENT.ITERATOR_OPTIONS.items()
            if k not in ["SHUFFLE_EPISODES", "SHUFFLE_TOURS"]
        }
        config.ENVIRONMENT.ITERATOR_OPTIONS = iter_opts

    # set split-dependent metrics to the current split
    config.TASK.NDTW.SPLIT = config.DATASET.SPLIT

    config.freeze()
    return config
