"""Task measures (reference: habitat_extensions/measures.py + the habitat
core measures the reference inherits: DistanceToGoal, Success, SPL).

Measures observe a simulator handle (anything exposing get_agent_state()
.position and geodesic_distance(a, b)) and the current episode. The
Measurements collection resolves declared dependencies by update order
like habitat's task.measurements.
"""

from __future__ import annotations

import gzip
import json
from typing import Any, Dict, List, Optional

import numpy as np

from ivlnce_tpu.tasks import dtw as dtw_mod
from ivlnce_tpu.utils.registry import registry


def euclidean_distance(pos_a, pos_b) -> float:
    return float(np.linalg.norm(np.array(pos_b) - np.array(pos_a), ord=2))


class Measure:
    cls_uuid: str = ""

    def __init__(self, sim=None, config=None, task_config=None, **kwargs):
        self._sim = sim
        self._config = config
        self._task_config = task_config
        self._metric = None

    @property
    def uuid(self) -> str:
        return self.cls_uuid

    def reset_metric(self, episode, measurements, **kwargs):
        raise NotImplementedError

    def update_metric(self, episode, measurements, **kwargs):
        raise NotImplementedError

    def get_metric(self):
        return self._metric


class Measurements:
    """Ordered measure collection; update order = registration order (the
    task YAML MEASUREMENTS list, which the reference orders so that
    dependencies come first)."""

    def __init__(self, measures: List[Measure]):
        self.measures: Dict[str, Measure] = {m.uuid: m for m in measures}

    def reset_measures(self, episode, **kwargs):
        for m in self.measures.values():
            m.reset_metric(episode=episode, measurements=self, **kwargs)

    def update_measures(self, episode, **kwargs):
        for m in self.measures.values():
            m.update_metric(episode=episode, measurements=self, **kwargs)

    def get_metrics(self) -> Dict[str, Any]:
        return {k: m.get_metric() for k, m in self.measures.items()}


# -----------------------------------------------------------------------------
# habitat core measures used by the reference
# -----------------------------------------------------------------------------
@registry.register_measure(name="DistanceToGoal")
class DistanceToGoal(Measure):
    cls_uuid = "distance_to_goal"

    def reset_metric(self, episode, measurements, **kwargs):
        self._previous_position = None
        self._start_end_distance = self._sim.geodesic_distance(
            episode.start_position, [g.position for g in episode.goals]
        )
        self.update_metric(episode=episode, measurements=measurements)

    def update_metric(self, episode, measurements, **kwargs):
        current_position = np.asarray(self._sim.get_agent_state().position)
        if self._previous_position is None or not np.allclose(
            self._previous_position, current_position, atol=1e-4
        ):
            self._metric = self._sim.geodesic_distance(
                current_position, [g.position for g in episode.goals]
            )
            self._previous_position = current_position

    @property
    def start_end_distance(self):
        return self._start_end_distance


@registry.register_measure(name="Success")
class Success(Measure):
    cls_uuid = "success"

    def reset_metric(self, episode, measurements, **kwargs):
        self._metric = 0.0
        self.update_metric(episode=episode, measurements=measurements, **kwargs)

    def update_metric(self, episode, measurements, task=None, **kwargs):
        d = measurements.measures[DistanceToGoal.cls_uuid].get_metric()
        called_stop = bool(kwargs.get("called_stop", False))
        success_distance = (
            self._config.SUCCESS_DISTANCE if self._config else 3.0
        )
        self._metric = float(called_stop and d < success_distance)


@registry.register_measure(name="SPL")
class SPL(Measure):
    """Success weighted by inverse normalized path length."""

    cls_uuid = "spl"

    def reset_metric(self, episode, measurements, **kwargs):
        self._previous_position = np.asarray(
            self._sim.get_agent_state().position
        )
        self._agent_episode_distance = 0.0
        self._start_end_distance = measurements.measures[
            DistanceToGoal.cls_uuid
        ].start_end_distance
        self._metric = 0.0

    def update_metric(self, episode, measurements, **kwargs):
        current = np.asarray(self._sim.get_agent_state().position)
        self._agent_episode_distance += euclidean_distance(
            current, self._previous_position
        )
        self._previous_position = current
        ep_success = measurements.measures[Success.cls_uuid].get_metric()
        self._metric = ep_success * (
            self._start_end_distance
            / max(self._start_end_distance, self._agent_episode_distance)
        )


# -----------------------------------------------------------------------------
# reference habitat_extensions measures
# -----------------------------------------------------------------------------
@registry.register_measure(name="PathLength")
class PathLength(Measure):
    cls_uuid = "path_length"

    def reset_metric(self, episode, measurements, **kwargs):
        self._previous_position = self._sim.get_agent_state().position
        self._metric = 0.0

    def update_metric(self, episode, measurements, **kwargs):
        current_position = self._sim.get_agent_state().position
        self._metric += euclidean_distance(
            current_position, self._previous_position
        )
        self._previous_position = current_position


@registry.register_measure(name="OracleNavigationError")
class OracleNavigationError(Measure):
    cls_uuid = "oracle_navigation_error"

    def reset_metric(self, episode, measurements, **kwargs):
        self._metric = float("inf")
        self.update_metric(episode=episode, measurements=measurements)

    def update_metric(self, episode, measurements, **kwargs):
        d = measurements.measures[DistanceToGoal.cls_uuid].get_metric()
        self._metric = min(self._metric, d)


@registry.register_measure(name="OracleSuccess")
class OracleSuccess(Measure):
    cls_uuid = "oracle_success"

    def reset_metric(self, episode, measurements, **kwargs):
        self._metric = 0.0
        self.update_metric(episode=episode, measurements=measurements)

    def update_metric(self, episode, measurements, **kwargs):
        d = measurements.measures[DistanceToGoal.cls_uuid].get_metric()
        success_distance = (
            self._config.SUCCESS_DISTANCE if self._config else 3.0
        )
        self._metric = float(self._metric or d < success_distance)


@registry.register_measure(name="OracleSPL")
class OracleSPL(Measure):
    cls_uuid = "oracle_spl"

    def reset_metric(self, episode, measurements, **kwargs):
        self._metric = 0.0

    def update_metric(self, episode, measurements, **kwargs):
        spl = measurements.measures["spl"].get_metric()
        self._metric = max(self._metric, spl)


@registry.register_measure(name="StepsTaken")
class StepsTaken(Measure):
    cls_uuid = "steps_taken"

    def reset_metric(self, episode, measurements, **kwargs):
        self._metric = 0.0

    def update_metric(self, episode, measurements, **kwargs):
        self._metric += 1.0


@registry.register_measure(name="NDTW")
class NDTW(Measure):
    """Normalized dynamic time warping to the GT path
    (measures.py:152-207). FDTW selects the fastdtw approximation like
    the reference's default."""

    cls_uuid = "ndtw"

    def __init__(self, sim=None, config=None, gt_json=None, **kwargs):
        super().__init__(sim=sim, config=config, **kwargs)
        self.dtw_func = (
            dtw_mod.fastdtw if (config is None or config.FDTW) else
            dtw_mod.exact_dtw
        )
        if gt_json is not None:
            self.gt_json = gt_json
        else:
            self.gt_json = {}
            if config is not None:
                path = config.GT_PATH.format(split=config.SPLIT)
                if "{role}" in config.GT_PATH:
                    from ivlnce_tpu.tasks.dataset import RxRVLNCEDatasetV1

                    for role in RxRVLNCEDatasetV1.annotation_roles:
                        with gzip.open(
                            config.GT_PATH.format(
                                split=config.SPLIT, role=role
                            ),
                            "rt",
                        ) as f:
                            self.gt_json.update(json.load(f))
                else:
                    with gzip.open(path, "rt") as f:
                        self.gt_json = json.load(f)

    def reset_metric(self, episode, measurements, **kwargs):
        self.locations = []
        self.gt_locations = self.gt_json[str(episode.episode_id)][
            "locations"
        ]
        self.update_metric(episode=episode, measurements=measurements)

    def update_metric(self, episode, measurements, **kwargs):
        current_position = list(
            np.asarray(self._sim.get_agent_state().position).tolist()
        )
        if len(self.locations) == 0:
            self.locations.append(current_position)
        else:
            if current_position == self.locations[-1]:
                return
            self.locations.append(current_position)

        dtw_distance = self.dtw_func(
            self.locations, self.gt_locations, dist=euclidean_distance
        )[0]
        success_distance = (
            self._config.SUCCESS_DISTANCE if self._config else 3.0
        )
        self._metric = float(
            np.exp(
                -dtw_distance / (len(self.gt_locations) * success_distance)
            )
        )


@registry.register_measure(name="SDTW")
class SDTW(Measure):
    cls_uuid = "sdtw"

    def reset_metric(self, episode, measurements, **kwargs):
        self.update_metric(episode=episode, measurements=measurements, **kwargs)

    def update_metric(self, episode, measurements, **kwargs):
        ep_success = measurements.measures[Success.cls_uuid].get_metric()
        ndtw = measurements.measures[NDTW.cls_uuid].get_metric()
        self._metric = (ep_success or 0.0) * (ndtw or 0.0)


MEASURE_TYPE_TO_CONFIG_KEY = {
    "DistanceToGoal": "DISTANCE_TO_GOAL",
    "Success": "SUCCESS",
    "SPL": "SPL",
    "PathLength": "PATH_LENGTH",
    "OracleNavigationError": "ORACLE_NAVIGATION_ERROR",
    "OracleSuccess": "ORACLE_SUCCESS",
    "OracleSPL": "ORACLE_SPL",
    "StepsTaken": "STEPS_TAKEN",
    "NDTW": "NDTW",
    "SDTW": "SDTW",
    "TopDownMapVLNCE": "TOP_DOWN_MAP_VLNCE",
}


def build_measurements(
    measure_names: List[str], sim, task_config, gt_json: Optional[dict] = None
) -> Measurements:
    """Instantiate the TASK.MEASUREMENTS list (task YAML names are config
    keys, e.g. DISTANCE_TO_GOAL; habitat maps them through TYPE)."""
    key_to_type = {v: k for k, v in MEASURE_TYPE_TO_CONFIG_KEY.items()}
    measures = []
    for name in measure_names:
        type_name = name
        cfg = None
        if name in key_to_type:
            cfg = task_config.TASK.get(name)
            type_name = cfg.TYPE if cfg is not None and "TYPE" in cfg else key_to_type[name]
        cls = registry.get_measure(type_name)
        if type_name == "NDTW":
            measures.append(
                cls(sim=sim, config=cfg, task_config=task_config,
                    gt_json=gt_json)
            )
        else:
            measures.append(cls(sim=sim, config=cfg, task_config=task_config))
    return Measurements(measures)
