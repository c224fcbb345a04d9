"""Loop subdivision surfaces (reference util/subdivision? — pbrt-v4 keeps
LoopSubdivide in shapes.cpp/util; Shape "loopsubdiv"). Host-side numpy:
subdivision is scene-compile work, the output is an ordinary triangle mesh.

Standard Loop rules: odd (edge) vertices 3/8(v0+v1) + 1/8(o0+o1) interior,
1/2(v0+v1) on boundaries; even vertices Warren's beta weights with 3/4-1/8
boundary rule.
"""
from __future__ import annotations

import numpy as np


def loop_subdivide(vertices, indices, levels=1):
    """vertices: (V, 3); indices: (F, 3) -> (V', 3), (F', 3)."""
    V = np.asarray(vertices, np.float64)
    F = np.asarray(indices, np.int64)
    for _ in range(int(levels)):
        V, F = _subdivide_once(V, F)
    return V.astype(np.float32), F


def _subdivide_once(V, F):
    nv = len(V)
    # edge map: (a<b) -> [edge vertex index, opposite verts...]
    edges = {}
    edge_opp = {}
    for f in F:
        for i in range(3):
            a, b = int(f[i]), int(f[(i + 1) % 3])
            o = int(f[(i + 2) % 3])
            key = (min(a, b), max(a, b))
            edge_opp.setdefault(key, []).append(o)
    edge_ids = {}
    new_pts = []
    for key, opps in edge_opp.items():
        a, b = key
        if len(opps) >= 2:  # interior edge
            p = 0.375 * (V[a] + V[b]) + 0.125 * (V[opps[0]] + V[opps[1]])
        else:               # boundary
            p = 0.5 * (V[a] + V[b])
        edge_ids[key] = nv + len(new_pts)
        new_pts.append(p)

    # even (original) vertices
    neighbors = [set() for _ in range(nv)]
    boundary_nbrs = [set() for _ in range(nv)]
    for key, opps in edge_opp.items():
        a, b = key
        neighbors[a].add(b)
        neighbors[b].add(a)
        if len(opps) < 2:
            boundary_nbrs[a].add(b)
            boundary_nbrs[b].add(a)
    V_new = V.copy()
    for i in range(nv):
        if boundary_nbrs[i]:
            bs = list(boundary_nbrs[i])
            if len(bs) >= 2:
                V_new[i] = 0.75 * V[i] + 0.125 * (V[bs[0]] + V[bs[1]])
        else:
            n = len(neighbors[i])
            if n < 3:
                continue
            beta = (1.0 / n) * (0.625 -
                                (0.375 + 0.25 * np.cos(2 * np.pi / n)) ** 2)
            V_new[i] = (1 - n * beta) * V[i] + \
                beta * sum(V[j] for j in neighbors[i])

    F_new = []
    for f in F:
        a, b, c = int(f[0]), int(f[1]), int(f[2])
        ab = edge_ids[(min(a, b), max(a, b))]
        bc = edge_ids[(min(b, c), max(b, c))]
        ca = edge_ids[(min(c, a), max(c, a))]
        F_new += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
    return np.concatenate([V_new, np.asarray(new_pts)]), \
        np.asarray(F_new, np.int64)
