"""Top-down map drawing utilities.

Reference: habitat_extensions/maps.py — color palette, map colorization
with fog-of-war shading, dotted/solid line drawing, agent/point/triangle
sprites, reference- and shortest-path overlays, and nearest-MP3D-node
tracking over a connectivity graph.

Host-side visualization only (cv2 + numpy); never on the device path.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # visualization degrades gracefully
    cv2 = None

# palette (maps.py:14-46 defines named BGR colors; values here are our own)
MAP_INVALID_POINT = 0
MAP_VALID_POINT = 1
MAP_BORDER_INDICATOR = 2
MAP_SOURCE_POINT_INDICATOR = 4
MAP_TARGET_POINT_INDICATOR = 6
MAP_MP3D_WAYPOINT = 8
MAP_SHORTEST_PATH_WAYPOINT = 14
MAP_REFERENCE_POINT = 17
MAP_AGENT_SPRITE = 20

TOP_DOWN_MAP_COLORS = np.full((256, 3), 150, dtype=np.uint8)
TOP_DOWN_MAP_COLORS[MAP_INVALID_POINT] = [255, 255, 255]  # white
TOP_DOWN_MAP_COLORS[MAP_VALID_POINT] = [150, 150, 150]  # gray
TOP_DOWN_MAP_COLORS[MAP_BORDER_INDICATOR] = [50, 50, 50]  # dark gray
TOP_DOWN_MAP_COLORS[MAP_SOURCE_POINT_INDICATOR] = [0, 0, 200]  # blue
TOP_DOWN_MAP_COLORS[MAP_TARGET_POINT_INDICATOR] = [200, 0, 0]  # red
TOP_DOWN_MAP_COLORS[MAP_MP3D_WAYPOINT] = [0, 200, 0]  # green
TOP_DOWN_MAP_COLORS[MAP_SHORTEST_PATH_WAYPOINT] = [0, 150, 200]  # teal
TOP_DOWN_MAP_COLORS[MAP_REFERENCE_POINT] = [100, 0, 200]  # purple
TOP_DOWN_MAP_COLORS[MAP_AGENT_SPRITE] = [200, 100, 0]  # orange


def colorize_topdown_map(
    top_down_map: np.ndarray,
    fog_of_war_mask: Optional[np.ndarray] = None,
    fog_of_war_desat_amount: float = 0.5,
) -> np.ndarray:
    """Index map -> RGB, desaturating unexplored area (maps.py:61-80)."""
    _map = TOP_DOWN_MAP_COLORS[top_down_map]
    if fog_of_war_mask is not None:
        fog_of_war_desat_values = np.array(
            [[fog_of_war_desat_amount], [1.0]], np.float32
        )
        desat_mask = top_down_map != MAP_INVALID_POINT
        _map[desat_mask] = (
            _map
            * fog_of_war_desat_values[fog_of_war_mask.astype(np.int64)]
        ).astype(np.uint8)[desat_mask]
    return _map


def static_to_grid(
    realworld_x: float,
    realworld_y: float,
    grid_resolution: Tuple[int, int],
    bounds: Dict[str, Tuple[float, float]],
) -> Tuple[int, int]:
    """World (x, z) -> map (row, col) with PRE-COMPUTED bounds
    (maps.py:83-102 variant of habitat's to_grid that does not need a
    live sim handle)."""
    grid_size = (
        abs(bounds["upper"][2] - bounds["lower"][2]) / grid_resolution[0],
        abs(bounds["upper"][0] - bounds["lower"][0]) / grid_resolution[1],
    )
    grid_x = int((realworld_x - bounds["lower"][2]) / grid_size[0])
    grid_y = int((realworld_y - bounds["lower"][0]) / grid_size[1])
    return grid_x, grid_y


def drawline(
    img: np.ndarray,
    pt1: Sequence[float],
    pt2: Sequence[float],
    color: int,
    thickness: int = 2,
    style: str = "dotted",
    gap: int = 15,
) -> None:
    """Dotted/dashed/filled line (maps.py:105-141)."""
    if cv2 is None:
        return
    pt1 = (int(pt1[0]), int(pt1[1]))
    pt2 = (int(pt2[0]), int(pt2[1]))
    if style == "filled":
        cv2.line(img, pt1, pt2, color, thickness)
        return
    dist = ((pt1[0] - pt2[0]) ** 2 + (pt1[1] - pt2[1]) ** 2) ** 0.5
    pts = []
    for i in np.arange(0, dist, gap):
        r = i / max(dist, 1e-6)
        x = int((pt1[0] * (1 - r) + pt2[0] * r) + 0.5)
        y = int((pt1[1] * (1 - r) + pt2[1] * r) + 0.5)
        pts.append((x, y))
    if style == "dotted":
        for p in pts:
            cv2.circle(img, p, thickness, color, -1)
    else:  # dashed
        for i in range(0, len(pts) - 1, 2):
            cv2.line(img, pts[i], pts[i + 1], color, thickness)


def drawpoint(
    img: np.ndarray, position: Sequence[int], color: int, pad: int = 2
) -> None:
    """Filled square marker (maps.py: drawpoint)."""
    upper = (int(position[1]) - pad, int(position[0]) - pad)
    lower = (int(position[1]) + pad, int(position[0]) + pad)
    if cv2 is not None:
        cv2.rectangle(img, upper, lower, color, -1)


def draw_triangle(
    img: np.ndarray,
    centroid: Sequence[int],
    theta: float,
    color: int,
    radius: int = 6,
) -> None:
    """Oriented agent sprite (maps.py: draw_triangle). ``theta`` is the
    agent heading."""
    if cv2 is None:
        return
    row, col = int(centroid[0]), int(centroid[1])
    p1 = (
        col + int(radius * np.sin(theta)),
        row + int(radius * np.cos(theta)),
    )
    p2 = (
        col + int(radius * np.sin(theta + 2.0 * np.pi / 3)),
        row + int(radius * np.cos(theta + 2.0 * np.pi / 3)),
    )
    p3 = (
        col + int(radius * np.sin(theta - 2.0 * np.pi / 3)),
        row + int(radius * np.cos(theta - 2.0 * np.pi / 3)),
    )
    cv2.drawContours(
        img, [np.array([p1, p2, p3], np.int32)], 0, color, -1
    )


def draw_path(
    top_down_map: np.ndarray,
    path_points: Sequence[Tuple[int, int]],
    color: int = MAP_SHORTEST_PATH_WAYPOINT,
    thickness: int = 2,
    style: str = "dotted",
) -> None:
    """Poly-line through grid points (maps.py reference/shortest paths)."""
    for prev, nxt in zip(path_points[:-1], path_points[1:]):
        drawline(
            top_down_map,
            (prev[1], prev[0]),
            (nxt[1], nxt[0]),
            color,
            thickness=thickness,
            style=style,
        )


def draw_source_and_target(
    top_down_map: np.ndarray,
    source_grid: Tuple[int, int],
    target_grid: Tuple[int, int],
) -> None:
    drawpoint(top_down_map, source_grid, MAP_SOURCE_POINT_INDICATOR, 4)
    drawpoint(top_down_map, target_grid, MAP_TARGET_POINT_INDICATOR, 4)


# -----------------------------------------------------------------------------
# MP3D connectivity graph (maps.py:277-343)
# -----------------------------------------------------------------------------
def load_connectivity_graph(
    connectivity_dir: str, scene_id: str
):
    """Load an MP3D connectivity graph as a networkx graph (nodes hold
    world positions). Returns None when the file is absent (the fake
    backend ships no graphs)."""
    path = os.path.join(connectivity_dir, f"{scene_id}_connectivity.json")
    if not os.path.exists(path):
        return None
    import networkx as nx

    with open(path) as f:
        data = json.load(f)
    graph = nx.Graph()
    for i, item in enumerate(data):
        if not item.get("included", True):
            continue
        pos = np.array(
            [item["pose"][3], item["pose"][7], item["pose"][11]], np.float32
        )
        graph.add_node(item["image_id"], position=pos)
        for j, connected in enumerate(item.get("unobstructed", [])):
            if connected and j < len(data) and data[j].get("included", True):
                graph.add_edge(item["image_id"], data[j]["image_id"])
    return graph


def get_nearest_node(graph, current_position: np.ndarray) -> str:
    """Euclidean-nearest graph node (maps.py:321-330)."""
    nearest = None
    dist = float("inf")
    for node in graph:
        node_pos = graph.nodes[node]["position"]
        node_pos = np.take(node_pos, (0, 2))
        cur_dist = np.linalg.norm(
            np.array(node_pos) - np.array(current_position), ord=2
        )
        if cur_dist < dist:
            dist = cur_dist
            nearest = node
    return nearest


def update_nearest_node(
    graph, nearest_node: str, current_position: np.ndarray
) -> str:
    """Local update over the neighborhood of the previous nearest node
    (maps.py:333-343)."""
    nearest = nearest_node
    dist = np.linalg.norm(
        np.take(graph.nodes[nearest_node]["position"], (0, 2))
        - current_position,
        ord=2,
    )
    for node in graph.neighbors(nearest_node):
        node_pos = np.take(graph.nodes[node]["position"], (0, 2))
        cur_dist = np.linalg.norm(node_pos - current_position, ord=2)
        if cur_dist < dist:
            dist = cur_dist
            nearest = node
    return nearest
