"""Marching-cubes lookup tables, generated programmatically at import time.

Instead of embedding the classic 256x16 triangle LUT as opaque constants
(cpp/third/mesh/MarchingCubes.cpp ships one), we *derive* an equivalent table
from first principles:

  1. For each of the 256 inside/outside corner configurations, find the
     active edges (sign change across the edge).
  2. On every cube face, connect active edges into isoline segments.  On
     ambiguous faces (two diagonal inside corners) we consistently cut off
     the inside corners — a fixed rule, so adjacent cubes always agree and
     the mesh is watertight across cube boundaries.
  3. Chain segments into closed loops (every active edge lies on exactly two
     faces) and fan-triangulate each loop.
  4. Orient triangles so their normals point toward the *outside* region
     (increasing field value when inside == value < isolevel).

Corner/edge numbering follows the standard (Lorensen/Bourke) convention:
  corners: 0:(0,0,0) 1:(1,0,0) 2:(1,1,0) 3:(0,1,0)
           4:(0,0,1) 5:(1,0,1) 6:(1,1,1) 7:(0,1,1)
  edges:   0:(0,1) 1:(1,2) 2:(2,3) 3:(3,0) 4:(4,5) 5:(5,6) 6:(6,7) 7:(7,4)
           8:(0,4) 9:(1,5) 10:(2,6) 11:(3,7)

The generated mesh is validated by topology tests (watertightness, Euler
characteristic) in tests/test_marching_cubes.py.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

CORNERS = np.array(
    [
        (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
        (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
    ],
    dtype=np.float64,
)

EDGES = np.array(
    [
        (0, 1), (1, 2), (2, 3), (3, 0),
        (4, 5), (5, 6), (6, 7), (7, 4),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ],
    dtype=np.int32,
)

# faces as cyclically-ordered corner quads (outward normals irrelevant here)
_FACES = [
    (0, 1, 2, 3),   # z = 0
    (4, 5, 6, 7),   # z = 1
    (0, 1, 5, 4),   # y = 0
    (3, 2, 6, 7),   # y = 1
    (0, 3, 7, 4),   # x = 0
    (1, 2, 6, 5),   # x = 1
]

_EDGE_OF = {}
for _ei, (_a, _b) in enumerate(EDGES):
    _EDGE_OF[(int(_a), int(_b))] = _ei
    _EDGE_OF[(int(_b), int(_a))] = _ei


def _face_segments(config: int, face: Tuple[int, int, int, int]) -> List[Tuple[int, int]]:
    """Isoline segments on one face, as pairs of cube-edge indices."""
    inside = [(config >> c) & 1 for c in face]
    edges = [
        _EDGE_OF[(face[i], face[(i + 1) % 4])] for i in range(4)
    ]
    cut = [i for i in range(4) if inside[i] != inside[(i + 1) % 4]]
    if len(cut) == 0:
        return []
    if len(cut) == 2:
        return [(edges[cut[0]], edges[cut[1]])]
    # ambiguous face: 4 crossings, two diagonal inside corners.
    # Fixed rule: pair the edges adjacent to each *inside* corner.
    segs = []
    for i in range(4):
        if inside[i]:
            e_prev = edges[(i - 1) % 4]
            e_next = edges[i]
            segs.append((e_prev, e_next))
    # exactly two inside corners in the ambiguous case
    return segs[:2]


def _loops_for_config(config: int) -> List[List[int]]:
    """Closed loops of cube-edge indices for one configuration."""
    segs: List[Tuple[int, int]] = []
    for f in _FACES:
        segs.extend(_face_segments(config, f))
    if not segs:
        return []
    # adjacency: each active edge appears in exactly two segments
    adj = {}
    for a, b in segs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    loops: List[List[int]] = []
    visited = set()
    for start in adj:
        if start in visited:
            continue
        loop = [start]
        visited.add(start)
        prev, cur = None, start
        while True:
            nbrs = adj[cur]
            nxt = nbrs[0] if nbrs[0] != prev else nbrs[1]
            if nxt == start:
                break
            loop.append(nxt)
            visited.add(nxt)
            prev, cur = cur, nxt
        loops.append(loop)
    return loops


def _edge_midpoint(e: int) -> np.ndarray:
    a, b = EDGES[e]
    return 0.5 * (CORNERS[a] + CORNERS[b])


def _orient(tri: Tuple[int, int, int], config: int) -> Tuple[int, int, int]:
    """Flip triangle so its normal points toward the outside (value>
    isolevel) region, estimated from the trilinear corner field with
    inside=-1 / outside=+1."""
    pts = [_edge_midpoint(e) for e in tri]
    n = np.cross(pts[1] - pts[0], pts[2] - pts[0])
    centroid = (pts[0] + pts[1] + pts[2]) / 3.0
    # gradient of the trilinear interpolant of corner values at centroid
    vals = np.array([1.0 if not ((config >> c) & 1) else -1.0 for c in range(8)])
    x, y, z = centroid
    grad = np.zeros(3)
    for c in range(8):
        cx, cy, cz = CORNERS[c]
        wx = cx * x + (1 - cx) * (1 - x)
        wy = cy * y + (1 - cy) * (1 - y)
        wz = cz * z + (1 - cz) * (1 - z)
        dwx = 2 * cx - 1
        dwy = 2 * cy - 1
        dwz = 2 * cz - 1
        grad[0] += vals[c] * dwx * wy * wz
        grad[1] += vals[c] * wx * dwy * wz
        grad[2] += vals[c] * wx * wy * dwz
    if float(n @ grad) < 0:
        return (tri[0], tri[2], tri[1])
    return tri


def _build_tables():
    tri_table = np.full((256, 16), -1, dtype=np.int32)
    edge_table = np.zeros(256, dtype=np.int32)
    for config in range(256):
        tris: List[int] = []
        for loop in _loops_for_config(config):
            for i in range(1, len(loop) - 1):
                t = _orient((loop[0], loop[i], loop[i + 1]), config)
                tris.extend(t)
        tri_table[config, : len(tris)] = tris
        mask = 0
        for e in set(tris):
            mask |= 1 << e
        edge_table[config] = mask
    return edge_table, tri_table


EDGE_TABLE, TRI_TABLE = _build_tables()

# max triangles any configuration emits (table width / 3)
MAX_TRIS = int(np.max(np.sum(TRI_TABLE >= 0, axis=1))) // 3
