import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import time, numpy as np, jax, jax.numpy as jnp
from pbrt_tpu.ops import bvh as bvh_mod
from pbrt_tpu.ops import pallas_bvh as pbvh

rng = np.random.default_rng(0)
T = 20000
p0 = rng.uniform(-3, 3, (T, 3)).astype(np.float32)
p1 = (p0 + rng.uniform(-0.15, 0.15, (T, 3))).astype(np.float32)
p2 = (p0 + rng.uniform(-0.15, 0.15, (T, 3))).astype(np.float32)
lo = np.minimum(np.minimum(p0, p1), p2); hi = np.maximum(np.maximum(p0, p1), p2)
bvh = bvh_mod.build_bvh(lo, hi)
ordered = bvh_mod.pack_tri_geo(p0, p1, p2, order=np.asarray(bvh.prim_indices))
tris16 = pbvh.pad_tris_for_bvh(np.asarray(ordered))
nodes = jnp.asarray(bvh.nodes)
print("tris", T, "nodes", nodes.shape)

N = 131072
# coherent rays: camera-like fan from one origin
o = jnp.tile(jnp.asarray([[0.0, 0.0, -8.0]]), (N, 1))
ang = rng.normal(size=(N, 3)) * np.asarray([0.35, 0.35, 0.0]) + np.asarray([0,0,1.0])
d = jnp.asarray((ang / np.linalg.norm(ang, axis=-1, keepdims=True)).astype(np.float32))
tmax = jnp.full((N,), 1e30, jnp.float32)

def timeit(f, *a, reps=5):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/reps*1e3

kern = jax.jit(lambda o, d, t: pbvh.bvh_intersect(nodes, tris16, o, d, t))
r = kern(o, d, tmax); jax.block_until_ready(r)
ms = timeit(kern, o, d, tmax)
print(f"pallas packet BVH (coherent): {ms:.2f} ms = {N/ms/1000:.1f} Mray/s")
# correctness spot-check vs CPU reference on a small subset
sub = 512
ref = pbvh.traverse_reference(np.asarray(nodes), np.asarray(tris16), o[:sub], d[:sub], tmax[:sub])
hit_k = np.asarray(r["hit"])[:sub]; hit_r = np.asarray(ref["hit"])
print("hit agree:", (hit_k == hit_r).mean(), "hits:", hit_r.mean())
m = hit_r & hit_k
print("prim agree:", (np.asarray(r["prim"])[:sub][m] == np.asarray(ref["prim"])[m]).mean())

# incoherent rays
o2 = jnp.asarray(rng.uniform(-4, 4, (N, 3)), jnp.float32)
d2 = rng.normal(size=(N, 3)).astype(np.float32); d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
d2 = jnp.asarray(d2)
ms2 = timeit(kern, o2, d2, tmax)
print(f"pallas packet BVH (incoherent): {ms2:.2f} ms = {N/ms2/1000:.1f} Mray/s")

# SORTED rays: direction octant + origin morton
def sort_key(o, d, lo, hi):
    oct_ = (d[:, 0] < 0).astype(jnp.uint32) + 2*(d[:, 1] < 0).astype(jnp.uint32) + 4*(d[:, 2] < 0).astype(jnp.uint32)
    q = jnp.clip((o - lo) / (hi - lo), 0, 1)
    qi = (q * 255).astype(jnp.uint32)
    def spread(x):
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x
    m = spread(qi[:, 0]) | (spread(qi[:, 1]) << 1) | (spread(qi[:, 2]) << 2)
    return (oct_ << jnp.uint32(24)) | (m >> jnp.uint32(8))
lo_w = jnp.asarray([-4.0,-4,-4]); hi_w = jnp.asarray([4.0,4,4])
def sorted_kern(o, d, t):
    k = sort_key(o, d, lo_w, hi_w)
    order = jnp.argsort(k)
    r = pbvh.bvh_intersect(nodes, tris16, o[order], d[order], t[order])
    inv = jnp.argsort(order)
    return {kk: v[inv] for kk, v in r.items()}
sk = jax.jit(sorted_kern)
ms3 = timeit(sk, o, d, tmax)
print(f"sorted coherent-fan:  {ms3:.2f} ms = {N/ms3/1000:.1f} Mray/s")
ms4 = timeit(sk, o2, d2, tmax)
print(f"sorted incoherent:    {ms4:.2f} ms = {N/ms4/1000:.1f} Mray/s")
