import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import time, numpy as np, jax, jax.numpy as jnp
from pbrt_tpu import scene_core as sc
from pbrt_tpu.ops import bvh as bvh_mod

rng = np.random.default_rng(0)
b = sc.SceneBuilder()
m = b.materials.add_diffuse((0.7,)*3)
# 50k-triangle rock pile
for _ in range(40):
    c = rng.uniform(-3, 3, 3); c[1] = abs(c[1])
    n = 35
    th = rng.uniform(0, np.pi, (n,)); ph = rng.uniform(0, 2*np.pi, (n,))
    pts = np.stack([np.sin(th)*np.cos(ph), np.cos(th), np.sin(th)*np.sin(ph)], -1)
    pts = c + pts * rng.uniform(0.3, 1.0)
    # fan triangulation of random point cloud (junk geometry, fine for perf)
    idx = np.stack([np.zeros(n-2, int), np.arange(1, n-1), np.arange(2, n)], -1)
    b.add_mesh(pts.astype(np.float32), idx, m)
from pbrt_tpu.utils import spectrum as spc
b.add_uniform_infinite_light(spc.ConstantSpectrum(1.0))
scene = b.build(force_bvh=True)
T = scene.tri_geo.shape[0]
print("tris:", T, "bvh nodes:", scene.bvh.nodes.shape)

N = 131072
o = jnp.asarray(rng.uniform(-4, 4, (N, 3)), jnp.float32)
d = rng.normal(size=(N, 3)).astype(np.float32); d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = jnp.asarray(d)
tmax = jnp.full((N,), 1e30, jnp.float32)

def timeit(f, *a, reps=10):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/reps*1e3

full = jax.jit(lambda o, d, t: bvh_mod.bvh_intersect_triangles(scene.bvh, scene.tri_geo_bvh, o, d, t))
ms = timeit(full, o, d, tmax)
print(f"BVH closest-hit: {ms:.2f} ms for {N} rays = {N/ms/1000:.2f} Mray/s")
anyh = jax.jit(lambda o, d, t: bvh_mod.bvh_intersect_triangles(scene.bvh, scene.tri_geo_bvh, o, d, t, any_hit=True))
ms2 = timeit(anyh, o, d, tmax)
print(f"BVH any-hit:     {ms2:.2f} ms = {N/ms2/1000:.2f} Mray/s")
