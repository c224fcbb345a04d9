import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import numpy as np, jax, jax.numpy as jnp
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
N = 131072
o2 = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
d2 = rng.normal(size=(N, 3)).astype(np.float32); d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
tmax = jnp.full((N,), 1e30, jnp.float32)

kern = jax.jit(lambda o, d, t: pbvh.bvh_intersect(nodes, tris16, o, d, t))
t0 = time.perf_counter()
r = kern(jnp.asarray(o2), jnp.asarray(d2), tmax); jax.block_until_ready(r)
print(f"compile+first run: {time.perf_counter()-t0:.1f}s")

def timeit(f, *a, reps=5):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/reps*1e3

ms = timeit(kern, jnp.asarray(o2), jnp.asarray(d2), tmax)
print(f"unsorted incoherent: {ms:.1f} ms = {N/ms/1000:.2f} Mray/s")

# host-side sort for the coherence experiment
def keys(o, d):
    oct_ = (d[:,0]<0).astype(np.uint32) + 2*(d[:,1]<0).astype(np.uint32) + 4*(d[:,2]<0).astype(np.uint32)
    q = np.clip((o + 4)/8, 0, 1); qi = (q*1023).astype(np.uint32)
    def spread(x):
        x = (x | (x << 16)) & 0x030000FF; x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3; x = (x | (x << 2)) & 0x09249249
        return x
    m = spread(qi[:,0]) | (spread(qi[:,1])<<1) | (spread(qi[:,2])<<2)
    return (oct_.astype(np.uint64) << np.uint64(30)) | m.astype(np.uint64)
order = np.argsort(keys(o2, d2))
os_, ds_ = o2[order], d2[order]
ms2 = timeit(kern, jnp.asarray(os_), jnp.asarray(ds_), tmax)
print(f"sorted incoherent:   {ms2:.1f} ms = {N/ms2/1000:.2f} Mray/s")

# coherent camera fan, sorted
oc = np.tile(np.asarray([[0.0,0.0,-8.0]], np.float32), (N,1))
ang = rng.normal(size=(N,3))*np.asarray([0.35,0.35,0.0]) + np.asarray([0,0,1.0])
dc = (ang/np.linalg.norm(ang,axis=-1,keepdims=True)).astype(np.float32)
order = np.argsort(keys(oc, dc))
ms3 = timeit(kern, jnp.asarray(oc[order]), jnp.asarray(dc[order]), tmax)
print(f"sorted camera fan:   {ms3:.1f} ms = {N/ms3/1000:.2f} Mray/s")
