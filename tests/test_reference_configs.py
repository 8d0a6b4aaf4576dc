"""Every vendored reference YAML must load and resolve to registered
components (VERDICT item 3: config-compat CI).

The reference's public contract is `run.py --exp-config <yaml>` over
`ivlnce_baselines/config/**` with task configs in
`habitat_extensions/config/**` (reference run.py:31-72). Each experiment
YAML here is pushed through ivlnce_tpu.config.get_config and its
TRAINER_NAME / MODEL.policy_name / obs transforms / task sensors /
measures / dataset type are resolved against the registry.
"""

import glob
import os

import pytest

import ivlnce_tpu  # noqa: F401
import ivlnce_tpu.envs.env  # noqa: F401 — registration side effects
import ivlnce_tpu.mapping.obs_transforms  # noqa: F401
import ivlnce_tpu.models  # noqa: F401
import ivlnce_tpu.tasks  # noqa: F401
import ivlnce_tpu.trainers  # noqa: F401
from ivlnce_tpu.config import get_config
from ivlnce_tpu.config.task_default import get_extended_config
from ivlnce_tpu.tasks.sensors import SENSOR_TYPE_TO_CONFIG_KEY
from ivlnce_tpu.utils.registry import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXPERIMENT_YAMLS = sorted(
    glob.glob(
        os.path.join(REPO, "ivlnce_baselines", "config", "**", "*.yaml"),
        recursive=True,
    )
)
TASK_YAMLS = sorted(
    glob.glob(
        os.path.join(REPO, "habitat_extensions", "config", "**", "*.yaml"),
        recursive=True,
    )
)

# measure config-key -> registered measure type (mirrors
# tasks/measures.py:build_measurements)
MEASURE_KEYS = {
    "DISTANCE_TO_GOAL": "DistanceToGoal",
    "SUCCESS": "Success",
    "SPL": "SPL",
    "NDTW": "NDTW",
    "SDTW": "SDTW",
    "PATH_LENGTH": "PathLength",
    "ORACLE_SUCCESS": "OracleSuccess",
    "ORACLE_NAVIGATION_ERROR": "OracleNavigationError",
    "ORACLE_SPL": "OracleSPL",
    "STEPS_TAKEN": "StepsTaken",
    "TOP_DOWN_MAP_VLNCE": "TopDownMapVLNCE",
}


def test_yaml_surface_complete():
    """The full vendored surface is present (reference ships 38 experiment
    + 16 task YAMLs)."""
    assert len(EXPERIMENT_YAMLS) == 38, EXPERIMENT_YAMLS
    assert len(TASK_YAMLS) == 16, TASK_YAMLS


# Broken in the reference itself: this YAML's BASE_TASK_CONFIG_PATH names
# habitat_extensions/config/iterative_vlnce_latent_baseline_eval.yaml, which
# does not exist upstream (renamed to latent_baselines/eval.yaml without
# updating the experiment config). Vendored verbatim; loading must fail the
# same way it does in the reference.
UPSTREAM_BROKEN = {
    os.path.join(
        "ivlnce_baselines", "config", "latent_baselines",
        "4_pool_end_cma", "1_eval.yaml",
    )
}


@pytest.mark.parametrize(
    "path", EXPERIMENT_YAMLS, ids=[os.path.relpath(p, REPO) for p in EXPERIMENT_YAMLS]
)
def test_experiment_config_resolves(path, monkeypatch):
    monkeypatch.chdir(REPO)  # BASE_TASK_CONFIG_PATH is repo-root relative
    rel = os.path.relpath(path, REPO)
    if rel in UPSTREAM_BROKEN:
        with pytest.raises(FileNotFoundError):
            get_config(rel)
        return
    config = get_config(os.path.relpath(path, REPO))

    registry.get_trainer(config.TRAINER_NAME)
    registry.get_policy(config.MODEL.policy_name)
    for t in config.RL.POLICY.OBS_TRANSFORMS.ENABLED_TRANSFORMS:
        registry.get_obs_transformer(t)

    task = config.TASK_CONFIG
    assert task.ENVIRONMENT.MAX_EPISODE_STEPS > 0
    for sensor_key in task.TASK.SENSORS:
        if sensor_key == "INSTRUCTION_SENSOR":
            continue  # built-in (sensors.py InstructionSensor)
        assert sensor_key in SENSOR_TYPE_TO_CONFIG_KEY.values(), sensor_key
        node = task.TASK.get(sensor_key)
        type_name = (
            node.TYPE
            if node is not None and "TYPE" in node
            else {v: k for k, v in SENSOR_TYPE_TO_CONFIG_KEY.items()}[
                sensor_key
            ]
        )
        registry.get_sensor(type_name)
    for m in task.TASK.MEASUREMENTS:
        registry.get_measure(MEASURE_KEYS[m])
    registry.get_dataset(task.DATASET.TYPE)

    # iterative experiments must carry the phase-machine switches
    if config.ENV_NAME == "VLNCEIterativeEnv":
        assert task.ENVIRONMENT.ITERATIVE.ENABLED in (True, False)


@pytest.mark.parametrize(
    "path", TASK_YAMLS, ids=[os.path.relpath(p, REPO) for p in TASK_YAMLS]
)
def test_task_config_loads(path, monkeypatch):
    monkeypatch.chdir(REPO)
    task = get_extended_config(os.path.relpath(path, REPO))
    assert task.SIMULATOR.FORWARD_STEP_SIZE > 0
    assert len(task.TASK.POSSIBLE_ACTIONS) == 4


def test_lowercase_iterative_map_reset_quirk_preserved():
    """The reference's eval YAMLs set lowercase `iterative_map_reset`,
    which never reaches EVAL.ITERATIVE_MAP_RESET (SURVEY §5 config quirk);
    behavior relies on the default 'iterative'. The vendored surface must
    keep loading (permissive merge) and the uppercase key must keep its
    default."""
    os.chdir(REPO)
    config = get_config(
        "ivlnce_baselines/config/map_cma/pred_semantics/iterative_maps/"
        "2_eval_iterative.yaml"
    )
    assert config.EVAL.ITERATIVE_MAP_RESET == "iterative"


def test_cli_opts_override_nested_task_config_keys():
    """run.py trailing opts must reach frozen-subtree keys: get_config
    assigns TASK_CONFIG from an already-frozen task config, so
    merge_from_list has to defrost recursively (reference run.py:61-66
    passes opts like TASK_CONFIG.DATASET.DATA_PATH through yacs)."""
    os.chdir(REPO)
    config = get_config(
        "configs/fake/map_cma_eval_iterative.yaml",
        [
            "NUM_ENVIRONMENTS",
            "64",
            "TASK_CONFIG.DATASET.DATA_PATH",
            "data/datasets/fake_big/{split}/{split}.json.gz",
        ],
    )
    assert config.NUM_ENVIRONMENTS == 64
    assert (
        config.TASK_CONFIG.DATASET.DATA_PATH
        == "data/datasets/fake_big/{split}/{split}.json.gz"
    )
    assert config.is_frozen()
