"""TPU-native semantic mapping module.

Functional redesign of the reference MappingModule (reference:
ivlnce_baselines/common/mapping_module/mapper.py:904-948), which per step:

1. predicts/receives per-pixel semantics,
2. unprojects the depth frame to a world point cloud,
3. filters by depth validity and a height window around the robot,
4. voxel-dedups keeping the highest point per half-resolution 2D cell
   (torch_scatter.scatter_max, mapper.py:428-474),
5. concatenates into an UNBOUNDED per-tour world point cloud and re-dedups
   (mapper.py:844-847),
6. filters by a second height window and rasterizes an egocentric
   occupancy + semantic map around the current robot pose
   (mapper.py:506-617).

XLA requires static shapes, and the concat+re-dedup is O(cloud) per step.
Because the dedup keeps exactly one point per half-resolution world cell,
the world cloud IS a sparse 2D grid — so we store it densely: a per-lane
world voxel grid holding, per cell, the max height and that point's exact
(x, z) world coordinates + semantic label. Per step we:

1. scatter-argmax the frame's points into the grid (O(frame), not
   O(cloud)),
2. dynamic-slice a local window around the robot (the egocentric map can
   only see cells within map_diagonal/2 + slack),
3. height-filter, egocentric-shift and rasterize the window's stored
   points exactly like the reference.

Storing the original float (x, z) per voxel keeps the rotation+rounding
math bit-comparable to the reference (rotating quantized cell centers
would shift map cells by up to half a voxel).

Divergences (documented):
- semantic rasterization resolves multi-point map cells with
  highest-point-wins instead of the reference's implementation-defined
  last-write-wins scatter order (mapper.py:569-571);
- ties in the voxel dedup keep the incumbent / lowest point index
  (torch_scatter leaves tie choice undefined);
- the world extent is bounded by the grid (default 1024 half-res cells =
  51.2 m at 0.1 m map resolution); points beyond it are dropped.
- RobotStartState bookkeeping (mapper.py:141-177) is omitted: the
  reference updates it but never consumes it downstream.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ivlnce_tpu.mapping.camera import CameraParameters
from ivlnce_tpu.ops import geometry as G
from ivlnce_tpu.ops import scatter as S

# reference filter constants
FRAME_DEPTH_MIN = 0.01  # normalized (mapper.py:417)
FRAME_DEPTH_MAX = 0.99
FRAME_HEIGHT_BELOW = 1.0  # (mapper.py:420-424): keep h in (rob-1.0, rob+0.5)
FRAME_HEIGHT_ABOVE = 0.5
MAP_HEIGHT_BELOW = 1.25  # (mapper.py:884-901): keep h in (rob-1.25, rob+0.75)
MAP_HEIGHT_ABOVE = 0.75
DEPTH_SCALE_METERS = 10.0  # (mapper.py:381-384)
FLOOR_LABEL = 0  # (mapper.py:597-599)


class MapperParams(NamedTuple):
    """Static (hashable) mapper geometry."""

    camera: CameraParameters
    map_height_meters: float
    map_width_meters: float
    resolution_meters: float
    grid_cells: int = 1024  # world grid side, in half-resolution cells
    window_cells: int = 192  # local window side (>= map diagonal + slack)
    # two-level accumulation (see MapperState): frames scatter into a
    # small per-lane ACTIVITY window that is merged into the big grid
    # every flush_interval steps. The window must cover camera reach
    # (FRAME_DEPTH_MAX * 10 m = 198 half-res cells) plus worst-case robot
    # drift between flushes (flush_interval * 5 cells at 0.25 m steps).
    flush_window_cells: int = 512
    flush_interval: int = 8

    @property
    def flush_cells(self) -> int:
        return min(self.flush_window_cells, self.grid_cells)

    @property
    def reach_cells(self) -> int:
        """Camera reach in half-res cells (+2 rounding slack)."""
        return int(FRAME_DEPTH_MAX * DEPTH_SCALE_METERS / self.half_res) + 2

    def validate(self) -> None:
        """Fail loudly on geometry that would silently truncate maps.

        The activity window only holds a frame's points when camera reach
        fits inside its half-width: stray detection recenters the window
        whenever the robot drifts within ``reach`` of an edge, so after
        any recenter the frame fits iff ``reach < flush_cells // 2``.
        Below that bound (e.g. resolution_meters < ~0.08 at the default
        512-cell window, or a shrunken flush_window_cells) far points are
        masked out of the accumulate with no error (ADVICE r2).

        When the window covers the ENTIRE grid the check is moot: window
        bounds coincide with grid bounds, so nothing is dropped beyond
        the documented bounded-world-extent divergence."""
        if (
            self.flush_cells < self.grid_cells
            and self.reach_cells >= self.flush_cells // 2
        ):
            raise ValueError(
                "MapperParams: camera reach "
                f"({self.reach_cells} half-res cells at resolution_meters="
                f"{self.resolution_meters}) must be < flush window half-"
                f"width ({self.flush_cells // 2}); raise flush_window_cells "
                "or coarsen the resolution, else far depth points are "
                "silently dropped from the map"
            )

    @property
    def half_res(self) -> float:
        # voxel dedup runs at half the map resolution (mapper.py:464)
        return self.resolution_meters / 2

    @property
    def map_dims(self) -> G.MapDims:
        return G.MapDims(
            self.map_height_meters,
            self.map_width_meters,
            self.resolution_meters,
        )


class MapperState(NamedTuple):
    """Per-lane batched world-map state (a single pytree carried across
    steps; lanes reset by mask multiplies like the reference's
    not_done_masks threading).

    Cells store two packed words instead of the reference's float point
    cloud: ``key`` holds the winning point's height as an EXACT
    order-preserving int32 (ops/scatter.sortable_from_float; EMPTY_KEY =
    empty cell) and ``aux`` packs the point's world (x, z) as 14-bit
    cell-relative offsets (~f32-ulp precision) plus its semantic label.
    Two int32 words/cell instead of 4 f32 channels: the frame update is
    two 1-channel scatter-sets of pre-sorted unique winners (see
    ops/scatter.sorted_argmax_grid_update) and the grid carries half the
    HBM of the float layout."""

    key: jnp.ndarray  # (B, Gr, Gc) i32 sortable height, EMPTY_KEY = empty
    aux: jnp.ndarray  # (B, Gr, Gc) u32 packed [x_off | z_off | sem]
    origin: jnp.ndarray  # (B, 2) i32 world half-res cell of grid [0, 0]
    origin_set: jnp.ndarray  # (B,) bool
    # activity window: frames scatter HERE (a few MB of random-access
    # working set instead of the multi-GB big grid — the grid update was
    # ~95% of the mapper's step cost, BASELINE.md); merged into the big
    # grid every flush_interval steps and on teleports (stray detection)
    wkey: jnp.ndarray  # (B, Wf, Wf) i32
    waux: jnp.ndarray  # (B, Wf, Wf) u32
    worigin: jnp.ndarray  # (B, 2) i32 absolute half-res cell of window [0,0]
    wdirty: jnp.ndarray  # (B,) bool — window holds unflushed points
    steps: jnp.ndarray  # () i32 global step counter (flush cadence)

    @property
    def batch_size(self) -> int:
        return self.key.shape[0]


def init_state(
    batch_size: int, grid_cells: int, flush_window_cells: int = 512
) -> MapperState:
    g = grid_cells
    w = min(flush_window_cells, grid_cells)
    return MapperState(
        key=jnp.full((batch_size, g, g), S.EMPTY_KEY, jnp.int32),
        aux=jnp.zeros((batch_size, g, g), jnp.uint32),
        origin=jnp.zeros((batch_size, 2), jnp.int32),
        origin_set=jnp.zeros((batch_size,), bool),
        wkey=jnp.full((batch_size, w, w), S.EMPTY_KEY, jnp.int32),
        waux=jnp.zeros((batch_size, w, w), jnp.uint32),
        worigin=jnp.zeros((batch_size, 2), jnp.int32),
        wdirty=jnp.zeros((batch_size,), bool),
        steps=jnp.zeros((), jnp.int32),
    )


def clear_lanes(state: MapperState, keep_mask: jnp.ndarray) -> MapperState:
    """Reset lanes where keep_mask == 0 (the reference's
    clear_completed_episode_data, mapper.py:310-326, driven by episodic vs
    tour not_done_masks chosen by the trainer)."""
    keep3 = keep_mask[:, None, None]
    return state._replace(
        key=jnp.where(keep3, state.key, S.EMPTY_KEY),
        aux=jnp.where(keep3, state.aux, jnp.uint32(0)),
        origin=jnp.where(keep_mask[:, None], state.origin, 0),
        origin_set=state.origin_set & keep_mask,
        wkey=jnp.where(keep3, state.wkey, S.EMPTY_KEY),
        waux=jnp.where(keep3, state.waux, jnp.uint32(0)),
        worigin=jnp.where(keep_mask[:, None], state.worigin, 0),
        wdirty=state.wdirty & keep_mask,
    )


def _world_cells(
    x_m: jnp.ndarray, z_m: jnp.ndarray, half_res: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Absolute world half-res voxel coords: rows keyed by z, cols by x
    (the reference keys dedup cells by (z, x), mapper.py:455-459)."""
    r = jnp.round(z_m / half_res).astype(jnp.int32)
    c = jnp.round(x_m / half_res).astype(jnp.int32)
    return r, c


def _grid_origin_for(pose: jnp.ndarray, params: "MapperParams") -> jnp.ndarray:
    """(B, 2) grid origin cells centering the grid on the given pose."""
    r, c = _world_cells(pose[:, 0], pose[:, 2], params.half_res)
    half = params.grid_cells // 2
    return jnp.stack([r - half, c - half], axis=-1)


@functools.partial(jax.jit, static_argnames=("params", "update_world"))
def mapper_step(
    params: MapperParams,
    state: MapperState,
    depth: jnp.ndarray,  # (B, H, W) or (B, H, W, 1) normalized [0, 1]
    semantics: jnp.ndarray,  # (B, H, W) uint8 labels
    pose: jnp.ndarray,  # (B, 3) world camera position
    elevation: jnp.ndarray,  # (B,) — or (B, 2) orientation [elev, heading]
    heading: Optional[jnp.ndarray],  # (B,), or None with (B, 2) above
    not_done_masks: jnp.ndarray,  # (B,) 0 clears the lane's world state
    update_world: bool = True,
) -> Tuple[MapperState, jnp.ndarray, jnp.ndarray]:
    """One mapping step: returns (state, occupancy_map, semantic_map),
    maps are (B, rows, cols) uint8.

    ``update_world=False`` skips the frame accumulation (known-map mode,
    where the world grid is preloaded, reference mapper.py:851-881).

    Input massaging (trailing depth channel, orientation split) happens
    INSIDE the jit: a single eager slice per step costs ~1 s through the
    axon dispatch path, so callers pass sensor arrays as-is.
    """
    params.validate()  # trace-time: misconfigured windows fail loudly
    if depth.ndim == 4:
        depth = depth[..., 0]
    if heading is None:
        elevation, heading = elevation[:, 0], elevation[:, 1]
    b = depth.shape[0]
    keep = not_done_masks.astype(bool)
    state = clear_lanes(state, keep)

    # establish per-lane grid origin on (re)start: center grid on robot
    new_origin = _grid_origin_for(pose, params)
    origin = jnp.where(state.origin_set[:, None], state.origin, new_origin)
    state = state._replace(origin=origin, origin_set=jnp.ones((b,), bool))

    # ---- two-level flush machinery -------------------------------------
    wf = state.wkey.shape[1]
    rr, cc = _world_cells(pose[:, 0], pose[:, 2], params.half_res)
    robot_cell = jnp.stack([rr, cc], axis=-1)  # absolute half-res cells
    centered = _center_window_origin(robot_cell, origin, params, wf)

    # stray: the camera's reach would leave the window (teleport, or a
    # freshly cleared lane whose window origin is stale)
    wcenter = state.worigin + wf // 2
    reach = params.reach_cells
    strayed = (
        jnp.max(jnp.abs(robot_cell - wcenter), axis=-1) > wf // 2 - reach
    )
    # clean strayed windows recenter for free (nothing to merge)
    recenter = strayed & ~state.wdirty
    state = state._replace(
        worigin=jnp.where(recenter[:, None], centered, state.worigin)
    )

    steps = state.steps + 1
    state = state._replace(steps=steps)
    periodic = (steps % params.flush_interval) == 0
    do_flush = jnp.any(state.wdirty & (strayed | periodic))
    state = jax.lax.cond(
        do_flush,
        lambda s: _flush_windows(params, s, centered),
        lambda s: s,
        state,
    )

    if update_world:
        state = _accumulate_frame(
            params, state, depth, semantics, pose, elevation, heading
        )

    occ, sem_map = _rasterize_egocentric(params, state, pose, heading)
    return state, occ, sem_map


def _center_window_origin(robot_cell, origin, params, wf):
    """Window origin centering the robot, clamped inside the big grid."""
    lo = origin
    hi = origin + params.grid_cells - wf
    return jnp.clip(robot_cell - wf // 2, lo, hi)


def _flush_windows(
    params: MapperParams, state: MapperState, centered: jnp.ndarray
) -> MapperState:
    """Merge every dirty activity window into the big grid, then clear
    and recenter all windows on the robots. Runs every flush_interval
    steps / on dirty strays (lax.cond), so its big-grid traffic is
    amortized. Ties keep the big grid's (older) point — identical to the
    incumbent-wins rule of the direct update."""
    wf = state.wkey.shape[1]
    rel = state.worigin - state.origin  # (B, 2) window start in grid coords

    def slice_lane(arr, r, c):
        return jax.lax.dynamic_slice(arr, (r, c), (wf, wf))

    bkey = jax.vmap(slice_lane)(state.key, rel[:, 0], rel[:, 1])
    baux = jax.vmap(slice_lane)(state.aux, rel[:, 0], rel[:, 1])
    adopt = (state.wkey > bkey) & state.wdirty[:, None, None]
    mkey = jnp.where(adopt, state.wkey, bkey)
    maux = jnp.where(adopt, state.waux, baux)

    def update_lane(arr, upd, r, c):
        return jax.lax.dynamic_update_slice(arr, upd, (r, c))

    key = jax.vmap(update_lane)(state.key, mkey, rel[:, 0], rel[:, 1])
    aux = jax.vmap(update_lane)(state.aux, maux, rel[:, 0], rel[:, 1])
    return state._replace(
        key=key,
        aux=aux,
        wkey=jnp.full_like(state.wkey, S.EMPTY_KEY),
        waux=jnp.zeros_like(state.waux),
        worigin=centered,
        wdirty=jnp.zeros_like(state.wdirty),
    )


def _accumulate_frame(
    params: MapperParams,
    state: MapperState,
    depth: jnp.ndarray,
    semantics: jnp.ndarray,
    pose: jnp.ndarray,
    elevation: jnp.ndarray,
    heading: jnp.ndarray,
) -> MapperState:
    b, h, w = depth.shape
    cam = params.camera
    x_scale, y_scale = G.pixel_ray_scaling(
        cam.features_spatial_dimensions[1],
        cam.features_spatial_dimensions[0],
        cam.vertical_fov_radians,
    )
    # reference adds pi to elevation for the camera matrix (mapper.py:133)
    T = G.transform3d(pose, elevation + jnp.pi, heading)
    pts = G.depth_to_world_points(
        depth, T, x_scale, y_scale, DEPTH_SCALE_METERS
    )  # (B, H, W, 3)
    pts = pts.reshape(b, h * w, 3)
    sem = semantics.reshape(b, h * w)
    depth_flat = depth.reshape(b, h * w)

    # frame-time filters (mapper.py:415-424)
    valid = (depth_flat > FRAME_DEPTH_MIN) & (depth_flat < FRAME_DEPTH_MAX)
    robot_h = pose[:, 1:2]
    heights = pts[:, :, 1]
    valid &= (heights > robot_h - FRAME_HEIGHT_BELOW) & (
        heights < robot_h + FRAME_HEIGHT_ABOVE
    )

    # world voxel cells: must land inside the big grid AND the activity
    # window (the window covers camera reach + inter-flush drift by
    # construction; see MapperParams.flush_window_cells)
    r_abs, c_abs = _world_cells(pts[:, :, 0], pts[:, :, 2], params.half_res)
    r = r_abs - state.origin[:, 0:1]
    c = c_abs - state.origin[:, 1:2]
    g = params.grid_cells
    valid &= (r >= 0) & (r < g) & (c >= 0) & (c < g)

    wf = state.wkey.shape[1]
    wr = r_abs - state.worigin[:, 0:1]
    wc = c_abs - state.worigin[:, 1:2]
    valid &= (wr >= 0) & (wr < wf) & (wc >= 0) & (wc < wf)

    aux = S.pack_aux(
        pts[:, :, 0], pts[:, :, 2], sem, r_abs, c_abs, params.half_res
    )
    new_key, new_aux = S.sorted_argmax_grid_update(
        state.wkey.reshape(b, -1),
        state.waux.reshape(b, -1),
        wr * wf + wc,
        heights,
        aux,
        valid,
    )
    return state._replace(
        wkey=new_key.reshape(b, wf, wf),
        waux=new_aux.reshape(b, wf, wf),
        wdirty=state.wdirty | jnp.any(valid, axis=1),
    )


def _rasterize_egocentric(
    params: MapperParams,
    state: MapperState,
    pose: jnp.ndarray,
    heading: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slice the local window and rasterize occupancy + semantic maps
    exactly like DenseMap.update (mapper.py:555-617)."""
    b = pose.shape[0]
    wcells = params.window_cells
    g = params.grid_cells

    # robot cell relative to grid origin, clamped so the window fits
    rr, cc = _world_cells(pose[:, 0], pose[:, 2], params.half_res)
    robot_r = rr - state.origin[:, 0]
    robot_c = cc - state.origin[:, 1]
    start_r = jnp.clip(robot_r - wcells // 2, 0, g - wcells)
    start_c = jnp.clip(robot_c - wcells // 2, 0, g - wcells)

    def slice_lane(arr, sr, sc):
        return jax.lax.dynamic_slice(arr, (sr, sc), (wcells, wcells))

    slicer = jax.vmap(slice_lane)
    win_key = slicer(state.key, start_r, start_c).reshape(b, -1)
    win_aux = slicer(state.aux, start_r, start_c).reshape(b, -1)

    # merge the (newer) activity window's view of the same region: per
    # cell the higher key wins, ties keep the big grid (older = incumbent)
    wf = state.wkey.shape[1]
    wstart_r = start_r + state.origin[:, 0] - state.worigin[:, 0]
    wstart_c = start_c + state.origin[:, 1] - state.worigin[:, 1]
    w_ok = (
        (wstart_r >= 0) & (wstart_r <= wf - wcells)
        & (wstart_c >= 0) & (wstart_c <= wf - wcells)
    )
    awkey = slicer(
        state.wkey,
        jnp.clip(wstart_r, 0, wf - wcells),
        jnp.clip(wstart_c, 0, wf - wcells),
    ).reshape(b, -1)
    awaux = slicer(
        state.waux,
        jnp.clip(wstart_r, 0, wf - wcells),
        jnp.clip(wstart_c, 0, wf - wcells),
    ).reshape(b, -1)
    use_w = w_ok[:, None] & (awkey > win_key)
    win_key = jnp.where(use_w, awkey, win_key)
    win_aux = jnp.where(use_w, awaux, win_aux)

    # absolute half-res cell coords of every window cell
    wr = jnp.arange(wcells, dtype=jnp.int32)
    cell_r = (
        start_r[:, None] + jnp.repeat(wr, wcells)[None, :]
        + state.origin[:, 0:1]
    )
    cell_c = (
        start_c[:, None] + jnp.tile(wr, wcells)[None, :]
        + state.origin[:, 1:2]
    )
    win_h = S.float_from_sortable(win_key)
    win_x, win_z, win_sem = S.unpack_aux(
        win_aux, cell_r, cell_c, params.half_res
    )

    valid = win_key != S.EMPTY_KEY
    # map-time height filter (mapper.py:884-901)
    robot_h = pose[:, 1:2]
    valid &= (win_h > robot_h - MAP_HEIGHT_BELOW) & (
        win_h < robot_h + MAP_HEIGHT_ABOVE
    )

    # egocentric shift of the stored float points (mapper.py:562-563)
    xyz = jnp.stack([win_x, win_h, win_z], axis=-1)
    ego = G.egocentric_shift(xyz, pose, heading)
    dims = params.map_dims
    rows, cols, in_bounds = G.project_to_map_indices(
        ego[:, :, 2], ego[:, :, 0], dims
    )
    valid &= in_bounds

    # one sort yields occupancy AND the floor-dropping semantic argmax
    # (mapper.py:601-617); see rasterize_occupancy_semantic_sorted
    return S.rasterize_occupancy_semantic_sorted(
        rows,
        cols,
        win_h,
        win_sem,
        valid,
        dims.num_rows,
        dims.num_cols,
        floor_label=FLOOR_LABEL,
    )


@functools.partial(jax.jit, static_argnames=("params", "max_points"))
def load_points_into_state(
    params: MapperParams,
    state: MapperState,
    lane_mask: jnp.ndarray,  # (B,) bool: lanes to load into
    xyz: jnp.ndarray,  # (B, N, 3) padded point clouds (world frame)
    sem: jnp.ndarray,  # (B, N) uint8
    num_points: jnp.ndarray,  # (B,) actual point counts
    origin_pose: jnp.ndarray,  # (B, 3) pose used to center the grid
    max_points: Optional[int] = None,
) -> MapperState:
    """Preload known per-scene point clouds into lanes (known-map mode,
    reference GetGTWorldSemanticPointcloud, mapper.py:851-881 +
    SemanticPointcloud.from_npz_file, mapper.py:283-294)."""
    b, n, _ = xyz.shape
    # (re)center the grid on the episode start pose for loaded lanes
    new_origin = _grid_origin_for(origin_pose, params)
    load = lane_mask
    state = clear_lanes(state, ~load)
    origin = jnp.where(load[:, None], new_origin, state.origin)
    state = state._replace(
        origin=origin, origin_set=state.origin_set | load
    )

    idx = jnp.arange(n, dtype=jnp.int32)[None, :]
    valid = load[:, None] & (idx < num_points[:, None])

    r_abs = jnp.round(xyz[:, :, 2] / params.half_res).astype(jnp.int32)
    c_abs = jnp.round(xyz[:, :, 0] / params.half_res).astype(jnp.int32)
    r = r_abs - origin[:, 0:1]
    c = c_abs - origin[:, 1:2]
    g = params.grid_cells
    valid &= (r >= 0) & (r < g) & (c >= 0) & (c < g)

    aux = S.pack_aux(
        xyz[:, :, 0], xyz[:, :, 2], sem, r_abs, c_abs, params.half_res
    )
    new_key, new_aux = S.sorted_argmax_grid_update(
        state.key.reshape(b, -1),
        state.aux.reshape(b, -1),
        r * g + c,
        xyz[:, :, 1],
        aux,
        valid,
    )
    return state._replace(
        key=new_key.reshape(b, g, g), aux=new_aux.reshape(b, g, g)
    )
