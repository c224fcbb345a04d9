import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import numpy as np, jax, jax.numpy as jnp
from pbrt_tpu import scene_core as sc, cameras as cam_mod
from pbrt_tpu.integrators import render as rdr
from pbrt_tpu.integrators.path import PathOptions
from pbrt_tpu.utils import image as pimg, spectrum as spc, transform as tfm
from pbrt_tpu.utils.color import linear_to_srgb

which = sys.argv[1]

def save(img, name):
    pimg.write_png(f"gallery/{name}.png", np.asarray(linear_to_srgb(jnp.asarray(img))))
    print("saved", name)

if which == "hair":
    b = sc.SceneBuilder()
    mh = b.materials.add_hair(sigma_a=(0.12, 0.25, 0.6), beta_m=0.25, beta_n=0.3)
    rng = np.random.default_rng(5)
    for i in range(250):
        a = rng.uniform(0, 2*np.pi); r0 = rng.uniform(0, 0.25)
        x, z = r0*np.cos(a), r0*np.sin(a)
        sway = rng.uniform(-0.7, 0.7, 2)
        b.add_curve([[x, 0, z], [x+sway[0]*0.2, 0.5, z+sway[1]*0.2],
                     [x+sway[0]*0.7, 1.0, z+sway[1]*0.7],
                     [x+sway[0], 1.3, z+sway[1]]],
                    0.012, 0.004, mh, curve_type="cylinder", subdiv=3)
    mg = b.materials.add_diffuse((0.45, 0.42, 0.4))
    b.add_mesh([[-5,0,-5],[5,0,-5],[5,0,5],[-5,0,5]], [[0,1,2],[0,2,3]], mg)
    b.add_point_light((3, 3, 3), spc.ConstantSpectrum(12.0))
    b.add_uniform_infinite_light(spc.ConstantSpectrum(0.35))
    scene = b.build(force_bvh=False)
    cam = cam_mod.make_camera("perspective", fov=35, width=360, height=360,
        camera_from_world=tfm.look_at((0, 1.1, 3.2), (0, 0.65, 0), (0, 1, 0)).inverse())
    img, st = rdr.render(scene, cam, spp=64, opts=PathOptions(max_depth=5))
    save(img, "hair_tuft_64spp")
elif which == "sss":
    b = sc.SceneBuilder()
    ms = b.materials.add_subsurface(reflectance=(0.87, 0.55, 0.35), mfp=(0.3,)*3, eta=1.33)
    from pbrt_tpu.utils.subdivision import loop_subdivide
    V0 = np.asarray([[1,0,0],[-1,0,0],[0,1,0],[0,-1,0],[0,0,1],[0,0,-1]], np.float32)
    F0 = np.asarray([[0,2,4],[2,1,4],[1,3,4],[3,0,4],[2,0,5],[1,2,5],[3,1,5],[0,3,5]])
    V, F = loop_subdivide(V0, F0, 4)
    V = V / np.linalg.norm(V, axis=-1, keepdims=True)  # project to sphere
    b.add_mesh(V * 0.8 + np.asarray([0, 0.8, 0]), F, ms)
    mg = b.materials.add_diffuse((0.35,)*3)
    b.add_mesh([[-5,0,-5],[5,0,-5],[5,0,5],[-5,0,5]], [[0,1,2],[0,2,3]], mg)
    b.add_point_light((2.0, 2.6, -1.2), spc.ConstantSpectrum(16.0))
    b.add_uniform_infinite_light(spc.ConstantSpectrum(0.25))
    scene = b.build(force_bvh=False)
    cam = cam_mod.make_camera("perspective", fov=40, width=360, height=360,
        camera_from_world=tfm.look_at((0, 1.3, 3.4), (0, 0.7, 0), (0, 1, 0)).inverse())
    img, st = rdr.render(scene, cam, spp=64, opts=PathOptions(max_depth=6))
    save(img, "subsurface_sphere_64spp")
elif which == "motion":
    b = sc.SceneBuilder()
    m = b.materials.add_diffuse((0.75, 0.2, 0.15))
    from pbrt_tpu.utils.subdivision import loop_subdivide
    V0 = np.asarray([[1,0,0],[-1,0,0],[0,1,0],[0,-1,0],[0,0,1],[0,0,-1]], np.float32)
    F0 = np.asarray([[0,2,4],[2,1,4],[1,3,4],[3,0,4],[2,0,5],[1,2,5],[3,1,5],[0,3,5]])
    V, F = loop_subdivide(V0, F0, 3)
    V = V / np.linalg.norm(V, axis=-1, keepdims=True)
    proto = b.new_prototype()
    b.add_proto_mesh(proto, V * 0.45, F, m)
    b.add_instance(proto, tfm.translate((-1.6, 0.6, 0)),
                   object_to_world_end=tfm.translate((1.6, 0.6, 0)))
    m2 = b.materials.add_diffuse((0.2, 0.45, 0.8))
    proto2 = b.new_prototype()
    b.add_proto_mesh(proto2, V * 0.45, F, m2)
    b.add_instance(proto2, tfm.translate((0, 1.5, -1.0)))
    mg = b.materials.add_diffuse((0.45,)*3)
    b.add_mesh([[-6,0,-6],[6,0,-6],[6,0,6],[-6,0,6]], [[0,1,2],[0,2,3]], mg)
    b.add_uniform_infinite_light(spc.ConstantSpectrum(0.9))
    scene = b.build(force_bvh=False)
    cam = cam_mod.make_camera("perspective", fov=45, width=420, height=280,
        camera_from_world=tfm.look_at((0, 1.2, 4.5), (0, 0.9, 0), (0, 1, 0)).inverse())
    img, st = rdr.render(scene, cam, spp=128, opts=PathOptions(max_depth=3))
    save(img, "motion_blur_128spp")
