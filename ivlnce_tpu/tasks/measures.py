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
import os
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


@registry.register_measure(name="TopDownMapVLNCE")
class TopDownMapVLNCE(Measure):
    """Drawn top-down map (reference measures.py:233-478): border,
    FOV-shaped fog of war, gradient agent trail, straight shortest-path
    overlay, dashed reference path, source/target markers, and — when a
    connectivity graph is available (GRAPHS_FILE pickle or per-scene
    connectivity JSONs) — MP3D node drawing plus the nearest-node agent
    path. The metric dict is consumed by utils/viz.observations_to_image.
    """

    cls_uuid = "top_down_map_vlnce"

    def __init__(self, sim=None, config=None, task_config=None, **kwargs):
        super().__init__(sim=sim, config=config, task_config=task_config)
        self._res = config.MAP_RESOLUTION if config is not None else 1024
        self._max_episode_steps = (
            config.MAX_EPISODE_STEPS if config is not None else 1000
        )
        self._map = None
        self._fog = None
        self._bounds = None
        self._meters_per_px = None
        self._step_count = 0
        self._previous_xy_location = None
        self._graph = None
        self._graphs_cache = None
        self._nearest_node = None
        self._node_rc = None

    def _cfg(self, key, default):
        return (
            getattr(self._config, key) if self._config is not None
            else default
        )

    def _world_to_grid(self, x: float, z: float):
        from ivlnce_tpu.tasks import maps as maps_util

        return maps_util.static_to_grid(
            z, x, self._map.shape[:2], self._bounds
        )

    def get_polar_angle(self) -> float:
        """Reference measures.py:386-398: angle of the agent's forward
        (-z rotated by the inverse agent rotation) in map polar space,
        plus the z/-z flip."""
        q = np.asarray(self._sim.get_agent_state().rotation, np.float64)
        x, y, z, w = q
        # heading_vector = R(q)^{-1} @ [0, 0, -1] = -(third row of R(q)):
        # hv = (2(wy - xz), -2(yz + wx), -(1 - 2(x^2 + y^2)))
        hx = 2.0 * (w * y - x * z)
        hz = -(1.0 - 2.0 * (x * x + y * y))
        phi = np.arctan2(hx, -hz)
        # for a pure yaw this is heading + pi — exactly the (row, col)
        # grid-space forward direction used by reveal_fog_of_war
        return float(phi + np.pi)

    def _load_graph(self, episode):
        """GRAPHS_FILE pickle {scene: nx.Graph} (reference layout) or a
        per-scene connectivity JSON directory; None when absent."""
        from ivlnce_tpu.tasks import maps as maps_util

        scene = os.path.basename(
            str(getattr(episode, "scene_id", ""))
        ).split(".")[0]
        graphs_file = self._cfg("GRAPHS_FILE", "")
        if graphs_file and os.path.exists(graphs_file):
            if self._graphs_cache is None:
                import pickle

                with open(graphs_file, "rb") as f:
                    self._graphs_cache = pickle.load(f)
            return self._graphs_cache.get(scene)
        conn_dir = os.path.join(
            os.path.dirname(graphs_file) if graphs_file else "data",
            "connectivity",
        )
        return maps_util.load_connectivity_graph(conn_dir, scene)

    def reset_metric(self, episode, measurements, **kwargs):
        from ivlnce_tpu.tasks import maps as maps_util

        if not hasattr(self._sim, "get_topdown_map"):
            self._metric = None
            return
        self._step_count = 0
        base = self._sim.get_topdown_map(self._res)
        lower, upper = self._sim.get_bounds()
        self._bounds = {"lower": lower, "upper": upper}
        self._meters_per_px = (
            abs(float(upper[0]) - float(lower[0])) / base.shape[1]
        )
        self._map = base.copy()
        if self._cfg("DRAW_BORDER", True):
            nav = base > 0
            edge = nav & ~(
                np.roll(nav, 1, 0) & np.roll(nav, -1, 0)
                & np.roll(nav, 1, 1) & np.roll(nav, -1, 1)
            )
            self._map[edge] = maps_util.MAP_BORDER_INDICATOR
        self._fog = np.zeros(self._map.shape[:2], np.uint8)

        state = self._sim.get_agent_state()
        a_r, a_c = self._world_to_grid(
            state.position[0], state.position[2]
        )
        self._previous_xy_location = (a_c, a_r)

        if self._cfg("FOG_OF_WAR", None) is None or self._config.FOG_OF_WAR.DRAW:
            self._fog = maps_util.reveal_fog_of_war(
                self._map,
                self._fog,
                (a_r, a_c),
                self.get_polar_angle(),
                fov=self._cfg("FOG_OF_WAR", None).FOV
                if self._config is not None else 90.0,
                max_line_len=(
                    self._cfg("FOG_OF_WAR", None).VISIBILITY_DIST
                    if self._config is not None else 5.0
                ) / self._meters_per_px,
            )

        self._graph = None
        self._nearest_node = None
        if self._cfg("DRAW_FIXED_WAYPOINTS", True) or self._cfg(
            "DRAW_MP3D_AGENT_PATH", True
        ):
            self._graph = self._load_graph(episode)
        if self._graph is not None and self._cfg(
            "DRAW_FIXED_WAYPOINTS", True
        ):
            maps_util.draw_mp3d_nodes(
                self._map,
                self._graph,
                episode.start_position,
                self._world_to_grid,
                self._meters_per_px,
            )

        if self._cfg("DRAW_SHORTEST_PATH", True) and hasattr(
            self._sim, "get_straight_shortest_path_points"
        ):
            pts = self._sim.get_straight_shortest_path_points(
                state.position, episode.goals[0].position
            )
            grid_pts = [self._world_to_grid(p[0], p[2]) for p in pts]
            maps_util.draw_path(
                self._map,
                grid_pts,
                maps_util.MAP_SHORTEST_PATH_WAYPOINT,
                max(
                    1,
                    int(0.4 * self._res / maps_util.MAP_THICKNESS_SCALAR),
                ),
                style="filled",
            )

        if self._cfg("DRAW_REFERENCE_PATH", True) and getattr(
            episode, "reference_path", None
        ):
            pts = [
                self._world_to_grid(p[0], p[2])
                for p in episode.reference_path
            ]
            thickness = max(
                1, int(0.4 * self._res / maps_util.MAP_THICKNESS_SCALAR)
            )
            maps_util.draw_path(
                self._map,
                pts,
                maps_util.MAP_SHORTEST_PATH_WAYPOINT,
                thickness,
                style="dashed",
            )
            pad = max(1, int(0.3 / self._meters_per_px))
            for p in pts:
                maps_util.drawpoint(
                    self._map, p, maps_util.MAP_SHORTEST_PATH_WAYPOINT, pad
                )

        # source and target last to avoid overlap (measures.py:337-344)
        if self._cfg("DRAW_SOURCE_AND_TARGET", True):
            src = self._world_to_grid(
                episode.start_position[0], episode.start_position[2]
            )
            tgt = self._world_to_grid(
                episode.goals[0].position[0], episode.goals[0].position[2]
            )
            pad = max(1, int(0.3 / self._meters_per_px))
            maps_util.drawpoint(
                self._map, src, maps_util.MAP_SOURCE_POINT_INDICATOR, pad
            )
            maps_util.drawpoint(
                self._map, tgt, maps_util.MAP_TARGET_POINT_INDICATOR, pad
            )

        if self._graph is not None:
            self._nearest_node = maps_util.get_nearest_node(
                self._graph,
                np.array(
                    [episode.start_position[0], episode.start_position[2]]
                ),
            )
            npos = self._graph.nodes[self._nearest_node]["position"]
            self._node_rc = self._world_to_grid(npos[0], npos[2])

        self.update_metric(episode=episode, measurements=measurements)

    def update_metric(self, episode, measurements, **kwargs):
        if self._map is None:
            return
        from ivlnce_tpu.tasks import maps as maps_util

        self._step_count += 1
        state = self._sim.get_agent_state()
        r, c = self._world_to_grid(state.position[0], state.position[2])
        r = int(np.clip(r, 0, self._map.shape[0] - 1))
        c = int(np.clip(c, 0, self._map.shape[1] - 1))

        # gradient agent trail (measures.py:402-419); never over source
        gradient_color = 15 + min(
            self._step_count * 245 // max(self._max_episode_steps, 1), 245
        )
        if (
            self._map[r, c] != maps_util.MAP_SOURCE_POINT_INDICATOR
            and self._previous_xy_location is not None
        ):
            maps_util.drawline(
                self._map,
                self._previous_xy_location,
                (c, r),
                gradient_color,
                thickness=max(
                    1,
                    int(
                        self._res * 1.4 / maps_util.MAP_THICKNESS_SCALAR
                    ),
                ),
                style="filled",
            )

        if (
            self._config is None or self._config.FOG_OF_WAR.DRAW
        ) and self._fog is not None:
            self._fog = maps_util.reveal_fog_of_war(
                self._map,
                self._fog,
                (r, c),
                self.get_polar_angle(),
                fov=self._config.FOG_OF_WAR.FOV
                if self._config is not None else 90.0,
                max_line_len=(
                    self._config.FOG_OF_WAR.VISIBILITY_DIST
                    if self._config is not None else 5.0
                ) / self._meters_per_px,
            )

        # nearest-MP3D-node agent path (measures.py:437-476)
        if self._graph is not None and self._nearest_node is not None:
            prev = self._nearest_node
            self._nearest_node = maps_util.update_nearest_node(
                self._graph,
                self._nearest_node,
                np.array([state.position[0], state.position[2]]),
            )
            if prev != self._nearest_node and self._cfg(
                "DRAW_MP3D_AGENT_PATH", True
            ):
                npos = self._graph.nodes[self._nearest_node]["position"]
                prev_rc = self._node_rc
                self._node_rc = self._world_to_grid(npos[0], npos[2])
                nr, nc = self._node_rc
                pp = max(1, int(2.0 / 3.0 * 0.2 / self._meters_per_px))
                self._map[
                    max(0, nr - pp):nr + pp + 1, max(0, nc - pp):nc + pp + 1
                ] = gradient_color
                maps_util.drawline(
                    self._map,
                    (prev_rc[1], prev_rc[0]),
                    (nc, nr),
                    gradient_color,
                    thickness=max(
                        1,
                        int(
                            0.5
                            * round(
                                self._res / maps_util.MAP_THICKNESS_SCALAR
                            )
                        ),
                    ),
                    style="filled",
                )

        self._previous_xy_location = (c, r)
        self._metric = {
            "map": self._map,
            "fog_of_war_mask": self._fog,
            "agent_map_coord": (r, c),
            "agent_angle": self.get_polar_angle(),
            "bounds": self._bounds,
            "meters_per_px": self._meters_per_px,
        }


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
