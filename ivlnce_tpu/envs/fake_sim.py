"""Deterministic procedural simulator.

Stands in for habitat-sim (unavailable in this environment, SURVEY.md
section 4.2): scenes are procedurally generated floor plans keyed by
scene_id — an open rectangle with axis-aligned box obstacles. Rendering
is an analytic raycast (cylindrical walls + floor/ceiling planes), so
depth frames are geometrically consistent with agent motion and the
mapping pipeline produces real egocentric maps. Fully deterministic:
same scene_id + pose => identical observations.

Supports the full sensor surface the reference consumes: rgb 224x224,
depth 256x256 normalized to [0, 1] over 10 m, semantic12 labels, agent
state get/set, grid-BFS geodesic distance and navigability.
"""

from __future__ import annotations

import hashlib
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ivlnce_tpu.envs.sim_api import (
    AgentState,
    SimActions,
    heading_from_quat,
    quat_from_heading,
)
from ivlnce_tpu.utils.registry import registry

MAX_DEPTH = 10.0
AGENT_HEIGHT = 1.25  # camera height (sensor POSITION y)
WALL_HEIGHT = 3.0
NAV_CELL = 0.125


def _scene_seed(scene_id: str) -> int:
    return int(hashlib.md5(scene_id.encode()).hexdigest()[:8], 16)


class SceneGeometry:
    """A floor plan: bounds + box obstacles with semantic labels."""

    def __init__(self, scene_id: str, extent: float = 16.0, n_boxes: int = 7):
        rng = np.random.default_rng(_scene_seed(scene_id))
        self.scene_id = scene_id
        self.extent = extent
        # boxes: (x0, z0, x1, z1, label 1..12)
        boxes = []
        for _ in range(n_boxes):
            cx, cz = rng.uniform(-extent / 2 + 2, extent / 2 - 2, 2)
            w, d = rng.uniform(0.5, 2.0, 2)
            label = int(rng.integers(1, 13))
            boxes.append((cx - w / 2, cz - d / 2, cx + w / 2, cz + d / 2, label))
        self.boxes = boxes
        self._nav_grid = None
        self._dist_cache: Dict[Tuple[int, int], np.ndarray] = {}

    # -- navigability ---------------------------------------------------------
    def is_navigable_xz(self, x: float, z: float, margin: float = 0.1) -> bool:
        h = self.extent / 2
        if not (-h + margin <= x <= h - margin):
            return False
        if not (-h + margin <= z <= h - margin):
            return False
        for (x0, z0, x1, z1, _) in self.boxes:
            if x0 - margin < x < x1 + margin and z0 - margin < z < z1 + margin:
                return False
        return True

    def nav_grid(self) -> np.ndarray:
        if self._nav_grid is None:
            n = int(self.extent / NAV_CELL)
            g = np.zeros((n, n), bool)
            for i in range(n):
                for j in range(n):
                    x = -self.extent / 2 + (j + 0.5) * NAV_CELL
                    z = -self.extent / 2 + (i + 0.5) * NAV_CELL
                    g[i, j] = self.is_navigable_xz(x, z)
            self._nav_grid = g
        return self._nav_grid

    def _to_cell(self, x: float, z: float) -> Tuple[int, int]:
        n = int(self.extent / NAV_CELL)
        j = int((x + self.extent / 2) / NAV_CELL)
        i = int((z + self.extent / 2) / NAV_CELL)
        return min(max(i, 0), n - 1), min(max(j, 0), n - 1)

    def distance_field(self, goal_xz: Tuple[float, float]) -> np.ndarray:
        """BFS distance field (meters) from the goal over the nav grid,
        8-connected."""
        key = self._to_cell(*goal_xz)
        if key in self._dist_cache:
            return self._dist_cache[key]
        grid = self.nav_grid()
        n = grid.shape[0]
        dist = np.full((n, n), np.inf)
        gi, gj = key
        if not grid[gi, gj]:
            # snap to nearest navigable cell
            ii, jj = np.where(grid)
            d2 = (ii - gi) ** 2 + (jj - gj) ** 2
            k = int(np.argmin(d2))
            gi, gj = int(ii[k]), int(jj[k])
        import heapq

        dist[gi, gj] = 0.0
        pq = [(0.0, gi, gj)]
        moves = [
            (-1, 0, 1.0), (1, 0, 1.0), (0, -1, 1.0), (0, 1, 1.0),
            (-1, -1, math.sqrt(2)), (-1, 1, math.sqrt(2)),
            (1, -1, math.sqrt(2)), (1, 1, math.sqrt(2)),
        ]
        while pq:
            d, i, j = heapq.heappop(pq)
            if d > dist[i, j]:
                continue
            for di, dj, w in moves:
                ni, nj = i + di, j + dj
                if 0 <= ni < n and 0 <= nj < n and grid[ni, nj]:
                    nd = d + w * NAV_CELL
                    if nd < dist[ni, nj]:
                        dist[ni, nj] = nd
                        heapq.heappush(pq, (nd, ni, nj))
        if len(self._dist_cache) > 64:
            self._dist_cache.clear()
        self._dist_cache[key] = dist
        return dist

    # -- analytic raycast ------------------------------------------------------
    def ray_wall_distance(
        self, x: float, z: float, dirs_x: np.ndarray, dirs_z: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Horizontal distance to the nearest wall/box along ray dirs.
        Returns (distance, semantic label) arrays."""
        t_best = np.full(dirs_x.shape, np.inf)
        label = np.zeros(dirs_x.shape, np.uint8)  # 0 = boundary wall/void
        h = self.extent / 2
        eps = 1e-9

        # outer walls x = +-h, z = +-h
        for wall_val, is_x in [(h, True), (-h, True), (h, False), (-h, False)]:
            d = dirs_x if is_x else dirs_z
            o = x if is_x else z
            t = np.where(np.abs(d) > eps, (wall_val - o) / d, np.inf)
            other = (z if is_x else x) + t * (dirs_z if is_x else dirs_x)
            ok = (t > eps) & (np.abs(other) <= h + 1e-6)
            hit = ok & (t < t_best)
            t_best = np.where(hit, t, t_best)
            # boundary walls keep label 0 ("void"/wall)

        # boxes: slab test per side
        for (x0, z0, x1, z1, lbl) in self.boxes:
            for side_val, is_x, lo, hi in [
                (x0, True, z0, z1), (x1, True, z0, z1),
                (z0, False, x0, x1), (z1, False, x0, x1),
            ]:
                d = dirs_x if is_x else dirs_z
                o = x if is_x else z
                t = np.where(np.abs(d) > eps, (side_val - o) / d, np.inf)
                other = (z if is_x else x) + t * (dirs_z if is_x else dirs_x)
                ok = (t > eps) & (other >= lo - 1e-6) & (other <= hi + 1e-6)
                hit = ok & (t < t_best)
                t_best = np.where(hit, t, t_best)
                label = np.where(hit, np.uint8(lbl), label)

        return t_best, label


class _SensorSpec:
    def __init__(self, height, width, hfov):
        self.height = height
        self.width = width
        self.hfov = hfov


@registry.register_simulator(name="FakeSim-v0")
class FakeSim:
    """Procedural simulator implementing the Simulator protocol."""

    # steps are microsecond-cheap numpy: the expert follower keeps its
    # exact simulate-and-restore strategy here (shortest_path.py), while
    # rendering backends get the zero-extra-step waypoint strategy
    cheap_simulation = True

    def __init__(self, config=None, scene_id: str = "fake_scene"):
        sim_cfg = config
        self.forward_step = (
            sim_cfg.FORWARD_STEP_SIZE if sim_cfg is not None else 0.25
        )
        self.turn_angle = math.radians(
            sim_cfg.TURN_ANGLE if sim_cfg is not None else 15.0
        )
        self._sensors = {
            "rgb": _SensorSpec(
                *(
                    (sim_cfg.RGB_SENSOR.HEIGHT, sim_cfg.RGB_SENSOR.WIDTH,
                     sim_cfg.RGB_SENSOR.HFOV)
                    if sim_cfg is not None
                    else (224, 224, 90)
                )
            ),
            "depth": _SensorSpec(
                *(
                    (sim_cfg.DEPTH_SENSOR.HEIGHT, sim_cfg.DEPTH_SENSOR.WIDTH,
                     sim_cfg.DEPTH_SENSOR.HFOV)
                    if sim_cfg is not None
                    else (256, 256, 90)
                )
            ),
        }
        self.scene = SceneGeometry(scene_id)
        self._position = np.array([0.0, 0.0, 0.0])
        self._heading = 0.0
        self.previous_step_collided = False
        self._ray_cache: Dict[Tuple[int, int, float], np.ndarray] = {}

    # -- protocol ---------------------------------------------------------------
    def reconfigure(self, scene_id: str) -> None:
        if scene_id != self.scene.scene_id:
            self.scene = SceneGeometry(scene_id)

    # -- topdown map (TopDownMapVLNCE measure; habitat maps.get_topdown_map) -----
    def get_topdown_map(self, map_resolution: int = 1024) -> np.ndarray:
        """(res, res) uint8 index map: 1 = navigable, 0 = not."""
        nav = self.scene.nav_grid()
        reps = max(1, map_resolution // nav.shape[0])
        grid = np.repeat(np.repeat(nav, reps, 0), reps, 1)
        return grid.astype(np.uint8)

    def get_bounds(self):
        """habitat pathfinder.get_bounds equivalent: (lower, upper) world
        xyz corners of the navigable area."""
        h = self.scene.extent / 2
        return (
            np.array([-h, 0.0, -h], np.float32),
            np.array([h, 0.0, h], np.float32),
        )

    def reset(self) -> Dict[str, np.ndarray]:
        if not self.scene.is_navigable_xz(
            self._position[0], self._position[2]
        ):
            self._position = np.array(self.sample_navigable_point())
        return self.render_observations()

    def step(self, action: int) -> Dict[str, np.ndarray]:
        self.previous_step_collided = False
        if action == SimActions.MOVE_FORWARD:
            dx = -math.sin(self._heading) * self.forward_step
            dz = -math.cos(self._heading) * self.forward_step
            nx, nz = self._position[0] + dx, self._position[2] + dz
            if self.scene.is_navigable_xz(nx, nz):
                self._position[0], self._position[2] = nx, nz
            else:
                # slide along axes like habitat ALLOW_SLIDING
                if self.scene.is_navigable_xz(nx, self._position[2]):
                    self._position[0] = nx
                    self.previous_step_collided = True
                elif self.scene.is_navigable_xz(self._position[0], nz):
                    self._position[2] = nz
                    self.previous_step_collided = True
                else:
                    self.previous_step_collided = True
        elif action == SimActions.TURN_LEFT:
            self._heading = (self._heading + self.turn_angle) % (2 * math.pi)
        elif action == SimActions.TURN_RIGHT:
            self._heading = (self._heading - self.turn_angle) % (2 * math.pi)
        return self.render_observations()

    def step_without_obs(self, action: int) -> None:
        """State-only step for simulate-and-restore probing: identical
        motion/collision semantics to step(), no sensor rendering — the
        render is ~95% of a FakeSim step and probes discard it
        (shortest_path.ShortestPathFollower._simulate_cost)."""
        render, self.render_observations = (
            self.render_observations, lambda: None
        )
        try:
            self.step(action)
        finally:
            self.render_observations = render

    def get_agent_state(self) -> AgentState:
        return AgentState(
            position=self._position.copy(),
            rotation=quat_from_heading(self._heading),
        )

    def set_agent_state(
        self, position, rotation, reset_sensors: bool = True
    ) -> None:
        self._position = np.array(position, dtype=np.float64)
        self._heading = heading_from_quat(np.asarray(rotation, np.float64))

    def geodesic_distance(self, position_a, position_b, episode=None) -> float:
        pa = np.asarray(position_a, float)
        targets = np.asarray(position_b, float)
        if targets.ndim == 1:
            targets = targets[None]
        best = np.inf
        for t in targets:
            field = self.scene.distance_field((float(t[0]), float(t[2])))
            d = self._sample_field(field, float(pa[0]), float(pa[2]))
            best = min(best, d)
        return best

    def _sample_field(self, field: np.ndarray, x: float, z: float) -> float:
        """Bilinear sample of a BFS distance field (smooth gradients so
        greedy followers descend without grid-quantization deadlocks)."""
        n = field.shape[0]
        fj = (x + self.scene.extent / 2) / NAV_CELL - 0.5
        fi = (z + self.scene.extent / 2) / NAV_CELL - 0.5
        i0 = int(np.clip(np.floor(fi), 0, n - 1))
        j0 = int(np.clip(np.floor(fj), 0, n - 1))
        i1, j1 = min(i0 + 1, n - 1), min(j0 + 1, n - 1)
        wi, wj = fi - i0, fj - j0
        corners = np.array(
            [field[i0, j0], field[i0, j1], field[i1, j0], field[i1, j1]]
        )
        finite = np.isfinite(corners)
        if not finite.any():
            return float("inf")
        fill = corners[finite].min()
        c = np.where(finite, corners, fill)
        top = c[0] * (1 - wj) + c[1] * wj
        bot = c[2] * (1 - wj) + c[3] * wj
        return float(top * (1 - wi) + bot * wi)

    def get_straight_shortest_path_points(self, position_a, position_b):
        """World waypoints of the shortest path (habitat pathfinder
        find_path().points equivalent): greedy descent of the BFS
        distance field in half-cell steps."""
        a = np.asarray(position_a, float)
        b = np.asarray(position_b, float)
        field = self.scene.distance_field((float(b[0]), float(b[2])))
        pts = [[float(a[0]), 0.0, float(a[2])]]
        x, z = float(a[0]), float(a[2])
        step = NAV_CELL / 2
        for _ in range(2048):
            if np.hypot(x - b[0], z - b[2]) <= step:
                break
            best, bx, bz = None, x, z
            for dx, dz in (
                (step, 0), (-step, 0), (0, step), (0, -step),
                (step, step), (step, -step), (-step, step), (-step, -step),
            ):
                nx, nz = x + dx, z + dz
                if not self.scene.is_navigable_xz(nx, nz):
                    continue
                d = self._sample_field(field, nx, nz)
                if best is None or d < best:
                    best, bx, bz = d, nx, nz
            if best is None or (bx == x and bz == z):
                break
            x, z = bx, bz
            pts.append([x, 0.0, z])
        pts.append([float(b[0]), 0.0, float(b[2])])
        return pts

    def is_navigable(self, position) -> bool:
        p = np.asarray(position, float)
        return self.scene.is_navigable_xz(float(p[0]), float(p[2]))

    def sample_navigable_point(self) -> List[float]:
        rng = np.random.default_rng(_scene_seed(self.scene.scene_id) + 1)
        h = self.scene.extent / 2 - 0.5
        for _ in range(256):
            x, z = rng.uniform(-h, h, 2)
            if self.scene.is_navigable_xz(x, z):
                return [float(x), 0.0, float(z)]
        return [0.0, 0.0, 0.0]

    # -- rendering ----------------------------------------------------------------
    def _pixel_rays(self, spec: _SensorSpec):
        key = (spec.height, spec.width, spec.hfov)
        if key not in self._ray_cache:
            hfov = math.radians(spec.hfov)
            vfov = hfov * spec.height / spec.width
            fx = spec.width / (2 * math.tan(hfov / 2))
            fy = spec.height / (2 * math.tan(vfov / 2))
            us = (np.arange(spec.width) + 0.5 - spec.width / 2) / fx
            vs = (np.arange(spec.height) + 0.5 - spec.height / 2) / fy
            self._ray_cache[key] = (us, vs)
        return self._ray_cache[key]

    def _render_depth_sem(self, spec: _SensorSpec):
        """Analytic render: per pixel, ray from the camera; depth along
        the OPTICAL AXIS (z-depth, like habitat's depth sensor); semantic
        label of the hit surface (0 floor, wall labels, 0 ceiling->void)."""
        us, vs = self._pixel_rays(spec)
        x, z = float(self._position[0]), float(self._position[2])
        cam_y = float(self._position[1]) + AGENT_HEIGHT

        # horizontal ray directions per column (camera looks along -z
        # rotated by heading; pixel u offsets to camera right)
        ch, sh = math.cos(self._heading), math.sin(self._heading)
        # camera right in world: (cos h, 0, -sin h); forward: (-sin h, 0, -cos h)
        dirs_x = -sh + us * ch
        dirs_z = -ch + us * (-sh)
        norm = np.sqrt(dirs_x**2 + dirs_z**2)
        t_wall, wall_label = self.scene.ray_wall_distance(
            x, z, dirs_x / norm, dirs_z / norm
        )
        # t_wall is distance along the normalized horizontal dir; convert
        # to optical-axis depth units: horizontal forward component per
        # column is 1/norm… optical depth d satisfies horizontal travel =
        # d * norm  =>  d_wall = t_wall / norm
        d_wall = t_wall / norm  # (W,)

        v = vs[:, None]  # (H, 1) vertical slope per row
        d_wall2 = d_wall[None, :]  # (1, W)

        # floor (y=0): ray hits floor at optical depth cam_y / v (v > 0 is
        # image-down; y decreases as v increases since camera y axis points
        # down in image space -> world y = cam_y - d * v)
        with np.errstate(divide="ignore", invalid="ignore"):
            d_floor = np.where(v > 1e-6, cam_y / v, np.inf)
            d_ceil = np.where(
                v < -1e-6, (cam_y - WALL_HEIGHT) / v, np.inf
            )

        wall_hit_y = cam_y - d_wall2 * v
        wall_valid = (wall_hit_y >= 0.0) & (wall_hit_y <= WALL_HEIGHT)
        d_wall_full = np.where(wall_valid, d_wall2, np.inf)

        depth = np.minimum(np.minimum(d_floor, d_ceil), d_wall_full)
        sem = np.zeros(depth.shape, np.uint8)
        wall_wins = d_wall_full <= np.minimum(d_floor, d_ceil)
        sem = np.where(wall_wins, wall_label[None, :], 0).astype(np.uint8)

        depth = np.clip(depth, 0.0, MAX_DEPTH) / MAX_DEPTH
        return depth.astype(np.float32), sem

    def render_observations(self) -> Dict[str, np.ndarray]:
        depth_spec = self._sensors["depth"]
        depth, sem = self._render_depth_sem(depth_spec)

        rgb_spec = self._sensors["rgb"]
        if (rgb_spec.height, rgb_spec.width) != (
            depth_spec.height,
            depth_spec.width,
        ):
            d2, s2 = self._render_depth_sem(rgb_spec)
        else:
            d2, s2 = depth, sem
        # rgb: deterministic colorization of semantics + shading by depth
        palette = (_PALETTE[s2 % 13] * (1.0 - 0.7 * d2[..., None])).astype(
            np.uint8
        )

        return {
            "rgb": palette,
            "depth": depth[..., None],
            "semantic12": sem[..., None].astype(np.uint8),
        }


_PALETTE = np.array(
    [
        [200, 200, 200], [230, 25, 75], [60, 180, 75], [255, 225, 25],
        [0, 130, 200], [245, 130, 48], [145, 30, 180], [70, 240, 240],
        [240, 50, 230], [210, 245, 60], [250, 190, 212], [0, 128, 128],
        [220, 190, 255],
    ],
    np.uint8,
)
