#!/usr/bin/env python3
"""Offline block-union traversal simulator for the BVH8 packet kernel.

The Pallas kernel (ops/pallas_bvh8.py) traverses each (8,128)=1024-lane
block through the UNION of its rays' node visits. This tool measures, in
numpy, how many nodes a block visits under different lane orderings —
quantifying the coherence loss for bounce rays and ranking sort keys
WITHOUT a TPU compile per variant.

Per-ray visit sets are computed without t_best pruning (upper bound, but
the RELATIVE union sizes across orderings are what matters).

    python tools/sim_union.py [--rays bounce|camera|shadow] [--blocks 16]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def build(scene_path="scenes/meshfield.pbrt"):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from pbrt_tpu.scene import parser as pparser
    desc = pparser.parse_file(scene_path)
    s = desc.scene
    tri = np.asarray(s.tri_geo)[:, :9].reshape(-1, 3, 3)
    from pbrt_tpu.ops import bvh as bvh_mod, pallas_bvh8 as b8
    lo = tri.min(axis=1)
    hi = tri.max(axis=1)
    tg = np.concatenate(
        [tri.reshape(-1, 9),
         np.arange(len(tri), dtype=np.float32)[:, None]], axis=1)
    k = b8.build_bvh8(lo, hi, tg)
    return s, tri, k


def dequant(k):
    """Decode the quantized node table back to per-child f32 boxes."""
    from pbrt_tpu.ops import pallas_bvh8 as b8
    nf = np.asarray(k.nodes_f)
    nq = np.asarray(k.nodes_q).view(np.uint32).reshape(-1, b8.WIDTH, 3)
    n = k.n_nodes
    frames = nf[8:].reshape(n, b8.NF_F)
    origin = frames[:, 0:3][:, None, :]
    scale = frames[:, 3:6][:, None, :]
    w0 = nq[:, :, 0]
    w1 = nq[:, :, 1]
    first = nq[:, :, 2].astype(np.int64)
    cnt = (w0 >> 24) & 0xFF
    qlo = np.stack([w0 & 0xFF, (w0 >> 8) & 0xFF, (w0 >> 16) & 0xFF], -1)
    qhi = np.stack([w1 & 0xFF, (w1 >> 8) & 0xFF, (w1 >> 16) & 0xFF], -1)
    lo = origin + qlo.astype(np.float32) * scale
    hi = origin + qhi.astype(np.float32) * scale
    return lo, hi, first, cnt


def gen_rays(scene, tri, kind, n, seed=7):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, len(tri), n)
    b1 = rng.random(n).astype(np.float32)
    b2 = rng.random(n).astype(np.float32)
    over = b1 + b2 > 1
    b1[over], b2[over] = 1 - b1[over], 1 - b2[over]
    t = tri[ids]
    p = (t[:, 0] * (1 - b1 - b2)[:, None] + t[:, 1] * b1[:, None]
         + t[:, 2] * b2[:, None])
    ng = np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0])
    ng /= np.maximum(np.linalg.norm(ng, axis=1, keepdims=True), 1e-20)
    ng[ng[:, 1] < 0] *= -1.0          # field normals point up
    if kind == "camera":
        eye = np.asarray([0, 3, 9], np.float32)
        d = p - eye
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        return np.broadcast_to(eye, p.shape).copy(), d.astype(np.float32)
    if kind == "shadow":
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d[:, 1] = np.abs(d[:, 1]) + 2.0   # toward the sky-dome light
        d /= np.linalg.norm(d, axis=1, keepdims=True)
    else:  # bounce: cosine hemisphere around ng
        u = rng.random((n, 2)).astype(np.float32)
        r = np.sqrt(u[:, 0])
        ph = 2 * np.pi * u[:, 1]
        x = r * np.cos(ph)
        y = r * np.sin(ph)
        z = np.sqrt(np.maximum(1 - u[:, 0], 0))
        t1 = np.cross(ng, np.asarray([0.123, 0.96, 0.25], np.float32))
        t1 /= np.maximum(np.linalg.norm(t1, axis=1, keepdims=True), 1e-20)
        t2 = np.cross(ng, t1)
        d = (x[:, None] * t1 + y[:, None] * t2 + z[:, None] * ng)
    o = p + ng * 1e-4
    return o.astype(np.float32), d.astype(np.float32)


def per_ray_visits(lo, hi, first, cnt, o, d):
    """(N, n_nodes) bool: ray would visit node (no t_best pruning)."""
    from collections import deque
    N = len(o)
    inv = 1.0 / np.where(d == 0, 1e-20, d)
    n_nodes = lo.shape[0]
    visits = np.zeros((N, n_nodes), bool)
    # BFS from the root; a node is visited by ray r if the PARENT slab for
    # its child-slot hit. Node 0 is visited by all.
    q = deque([(0, np.ones(N, bool))])
    CNT_EMPTY = 255
    while q:
        node, mask = q.popleft()
        visits[:, node] = mask
        idx = np.nonzero(mask)[0]
        if len(idx) == 0:
            continue
        for c in range(8):
            if cnt[node, c] != 0:          # leaf or empty slot
                continue
            t0 = (lo[node, c] - o[idx]) * inv[idx]
            t1 = (hi[node, c] - o[idx]) * inv[idx]
            tmin = np.maximum(np.minimum(t0, t1).max(axis=1), 0.0)
            tmax = np.maximum(t0, t1).min(axis=1)
            hit = tmin <= tmax * 1.0000004
            sub = np.zeros(N, bool)
            sub[idx[hit]] = True
            if sub.any():
                q.append((int(first[node, c]), sub))
    return visits


def morton3(p, lo, hi, bits=10):
    q = ((p - lo) / np.maximum(hi - lo, 1e-20) * ((1 << bits) - 1)).astype(
        np.uint64)

    def spread(x):
        x &= np.uint64(0x3FF)
        x = (x | (x << np.uint64(16))) & np.uint64(0x30000FF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x300F00F)
        x = (x | (x << np.uint64(4))) & np.uint64(0x30C30C3)
        x = (x | (x << np.uint64(2))) & np.uint64(0x9249249)
        return x
    return (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))


def order_keys(kind, o, d, wlo, whi):
    if kind == "none":
        return np.arange(len(o))
    octant = ((d[:, 0] < 0).astype(np.uint64)
              | ((d[:, 1] < 0).astype(np.uint64) << np.uint64(1))
              | ((d[:, 2] < 0).astype(np.uint64) << np.uint64(2)))
    mo = morton3(o, wlo, whi)
    if kind == "octant_morton":          # production key (scene_core.py)
        key = (octant << np.uint64(30)) | mo
    elif kind == "morton_octant":
        key = (mo << np.uint64(3)) | octant
    elif kind == "morton":
        key = mo
    elif kind == "dir_morton":           # 6D: direction morton high
        md = morton3(d, -np.ones(3), np.ones(3), bits=5)
        key = (md << np.uint64(30)) | mo
    else:
        raise SystemExit(kind)
    return np.argsort(key, kind="stable")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", default="bounce")
    ap.add_argument("--blocks", type=int, default=16)
    args = ap.parse_args()
    scene, tri, k = build()
    lo, hi, first, cnt = dequant(k)
    wlo = np.asarray(scene.world_lo)
    whi = np.asarray(scene.world_hi)
    N = args.blocks * 1024
    rng = np.random.default_rng(7)
    tri_ids = rng.integers(0, len(tri), N)      # same seed/draws as gen_rays
    o, d = gen_rays(scene, tri, args.rays, N)
    print(f"rays={args.rays} N={N} nodes={k.n_nodes} "
          f"tris={k.n_tris}", flush=True)
    visits = per_ray_visits(lo, hi, first, cnt, o, d)
    mean_per_ray = visits.sum(axis=1).mean()
    print(f"mean visits/ray (independent traversal): {mean_per_ray:.1f}",
          flush=True)
    # BVH-slot ordering: sort by the origin triangle's position in the
    # tree's DFS primitive order — the wavefront KNOWS the previous hit
    # prim, so this is implementable (vs morton, which only proxies it)
    inv_perm = np.empty(k.n_tris, np.int64)
    inv_perm[np.asarray(k.prim_indices)] = np.arange(k.n_tris)
    slot_order = np.argsort(inv_perm[tri_ids], kind="stable")

    for kind in ("none", "octant_morton", "morton_octant", "morton",
                 "dir_morton", "bvh_slot", "bvh_slot_octant"):
        if kind == "bvh_slot":
            idx = slot_order
        elif kind == "bvh_slot_octant":
            octant = ((d[:, 0] < 0).astype(np.uint64)
                      | ((d[:, 1] < 0).astype(np.uint64) << np.uint64(1))
                      | ((d[:, 2] < 0).astype(np.uint64) << np.uint64(2)))
            key = (inv_perm[tri_ids].astype(np.uint64) << np.uint64(3)) \
                | octant
            idx = np.argsort(key, kind="stable")
        else:
            idx = order_keys(kind, o, d, wlo, whi)
        v = visits[idx]
        unions = [v[b * 1024:(b + 1) * 1024].any(axis=0).sum()
                  for b in range(args.blocks)]
        u = float(np.mean(unions))
        print(f"{kind:>16}: union visits/block = {u:7.1f}  "
              f"(x{u / mean_per_ray:5.1f} vs per-ray)", flush=True)


if __name__ == "__main__":
    main()
