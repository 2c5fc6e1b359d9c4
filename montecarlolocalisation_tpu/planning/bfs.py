"""BFS planning over the maze wall graph (native C++ with Python fallback).

Reference: moveToPosition_server.cpp:185-264 (bfs + buildGraphFromWallArray).
Direction deltas (:32-37): RIGHT=(0,+1), TOP=(-1,0), LEFT=(0,-1),
BOTTOM=(+1,0); an edge exists when the direction code is absent from the
cell's wall list.  Paths include the start cell; `distance` is the node
count (DistanceToNode semantics — the TSP layer subtracts 1 for edges,
executeChallenge.cpp:174).
"""
from __future__ import annotations

import ctypes
from collections import deque
from typing import List, Optional, Tuple

import numpy as np

from ..native.build import load_planner

_DIRS = ((0, 1), (-1, 0), (0, -1), (1, 0))  # RIGHT, TOP, LEFT, BOTTOM


def _walls_u8(walls) -> np.ndarray:
    w = np.asarray(walls)
    if w.dtype != np.uint8:
        w = w.astype(np.uint8)
    return np.ascontiguousarray(w)


def bfs_path_py(walls, start: Tuple[int, int],
                goal: Tuple[int, int]) -> List[Tuple[int, int]]:
    """Pure-Python BFS (fallback; identical semantics to the native path)."""
    w = np.asarray(walls)
    rows, cols = w.shape[:2]
    sr, sc = start
    gr, gc = goal
    if not (0 <= sr < rows and 0 <= sc < cols and 0 <= gr < rows
            and 0 <= gc < cols):
        return []
    parent = {start: None}
    q = deque([start])
    while q:
        cur = q.popleft()
        if cur == goal:
            break
        r, c = cur
        for d, (dr, dc) in enumerate(_DIRS):
            if w[r, c, d]:
                continue
            nr, nc = r + dr, c + dc
            if not (0 <= nr < rows and 0 <= nc < cols):
                continue
            if (nr, nc) in parent:
                continue
            parent[(nr, nc)] = cur
            q.append((nr, nc))
    if goal not in parent:
        return []
    path: List[Tuple[int, int]] = []
    node: Optional[Tuple[int, int]] = goal
    while node is not None:
        path.append(node)
        node = parent[node]
    return path[::-1]


def bfs_path(walls, start, goal) -> List[Tuple[int, int]]:
    """Shortest cell path [(row, col), ...] incl. start; [] if unreachable."""
    lib = load_planner()
    start = (int(start[0]), int(start[1]))
    goal = (int(goal[0]), int(goal[1]))
    if lib is None:
        return bfs_path_py(walls, start, goal)
    w = _walls_u8(walls)
    rows, cols = w.shape[:2]
    max_len = rows * cols
    out = np.zeros((max_len, 2), dtype=np.int32)
    n = lib.mcl_bfs_path(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rows, cols, start[0], start[1], goal[0], goal[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_len)
    if n <= 0:
        return []
    return [tuple(map(int, rc)) for rc in out[:n]]


def bfs_distance(walls, start, goal) -> int:
    """Node count of the shortest path (0 = unreachable)."""
    lib = load_planner()
    if lib is None:
        return len(bfs_path_py(walls, tuple(start), tuple(goal)))
    w = _walls_u8(walls)
    rows, cols = w.shape[:2]
    n = lib.mcl_bfs_path(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), rows, cols,
        int(start[0]), int(start[1]), int(goal[0]), int(goal[1]), None, 0)
    return max(n, 0)


def all_pairs_distances(walls, nodes) -> np.ndarray:
    """[n, n] node-count distance matrix over the given cells."""
    nodes = np.asarray(nodes, dtype=np.int32)
    n = len(nodes)
    lib = load_planner()
    if lib is None:
        return np.array(
            [[bfs_distance(walls, a, b) for b in nodes] for a in nodes],
            dtype=np.int32)
    w = _walls_u8(walls)
    rows, cols = w.shape[:2]
    out = np.zeros((n, n), dtype=np.int32)
    nd = np.ascontiguousarray(nodes)
    lib.mcl_bfs_all_pairs(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), rows, cols,
        nd.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def simplify_path(walls, path):
    """Collapse path nodes whose skip-connection stays adjacent
    (moveToPosition_server.cpp:287-312 simplifyPath; unused in the reference
    executor but part of the API surface)."""
    if len(path) <= 2:
        return list(path)
    w = np.asarray(walls)

    def adjacent(a, b):
        dr, dc = b[0] - a[0], b[1] - a[1]
        for d, (er, ec) in enumerate(_DIRS):
            if (dr, dc) == (er, ec) and not w[a[0], a[1], d]:
                return True
        return False

    simplified = [path[0]]
    anchor = 0
    for i in range(2, len(path)):
        if not adjacent(path[anchor], path[i]):
            simplified.append(path[i - 1])
            anchor = i - 1
    simplified.append(path[-1])
    return simplified
