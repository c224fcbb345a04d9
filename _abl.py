import os, time, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import numpy as np, jax, jax.numpy as jnp
from pbrt_tpu import scenes, samplers as smp, filters as flt, film as film_mod
from pbrt_tpu.integrators import path as path_mod
import pbrt_tpu.scene_core as sc
import pbrt_tpu.lights as lgt

scene, cam = scenes.make_cornell_box(width=400, height=400)
sampler = smp.make_sampler("zsobol", spp=64, full_resolution=(400, 400))
filt = flt.make_filter("gaussian")
sensor = film_mod.make_pixel_sensor()
opts = path_mod.PathOptions(max_depth=5)
N = 160000
pix = jnp.arange(N, dtype=jnp.int32)
si = jnp.zeros((N,), jnp.int32)

def timeit(f, reps=10):
    r = f(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps): r = f()
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/reps*1e3

mode = sys.argv[1]
if mode == "full":
    pass
elif mode == "no_shadow":
    orig = sc.intersect_p
    sc.intersect_p = lambda scene, o, d, t, time=None: jnp.zeros(o.shape[:1], bool)
elif mode == "no_nee":
    lgt_orig = scene.light_sampler
    scene = scene.replace(light_sampler=scene.light_sampler.replace(n_lights=0))
elif mode == "no_closest":
    orig_i = sc.intersect
    def fake(scene, o, d, t, time=None):
        N = o.shape[0]
        z = jnp.zeros((N, 3)); zn = jnp.concatenate([jnp.zeros((N,2)), jnp.ones((N,1))],1)
        return dict(hit=jnp.zeros((N,), bool), t=jnp.full((N,), jnp.inf), prim=jnp.zeros((N,), jnp.int32),
                    p=z, ng=zn, ns=zn, uv=jnp.zeros((N,2)), mat=jnp.zeros((N,), jnp.int32),
                    light=jnp.full((N,), -1, jnp.int32), wo=-d, p0=z, p1=z, p2=z, dpdu=zn, dpdv=zn)
    sc.intersect = fake
elif mode == "indep":
    sampler = smp.make_sampler("independent", spp=64, full_resolution=(400, 400))

fn = jax.jit(lambda: path_mod.render_wave(scene, cam, sampler, filt, pix, si, opts))
ms = timeit(fn)
print(f"{mode}: {ms:.2f} ms ({N/ms/1000:.1f} kpaths/ms)")
