"""Built-in test scenes (the analogue of the hand-built scenes in the
reference's integrators_test.cpp:66-120 and the pbrt-v4-scenes cornell box).
"""
from __future__ import annotations

import numpy as np

from . import scene_core as sc
from . import cameras as cam_mod
from .utils import color as pcolor
from .utils import spectrum as spc
from .utils import transform as tfm


def _quad(builder, corners, material, **kw):
    """Add a quad as two triangles. corners: 4x3 CCW."""
    v = np.asarray(corners, np.float32)
    return builder.add_mesh(v, [[0, 1, 2], [0, 2, 3]], material, **kw)


def make_cornell_box(width=400, height=400, light_scale=1.0):
    """The Cornell box (original Cornell measurement geometry, public data),
    matching the role of pbrt-v4-scenes/cornell-box. Returns (scene, camera)."""
    b = sc.SceneBuilder()
    cs = b.cs
    white = b.materials.add_diffuse((0.725, 0.71, 0.68))
    red = b.materials.add_diffuse((0.63, 0.065, 0.05))
    green = b.materials.add_diffuse((0.14, 0.45, 0.091))

    # original Cornell data (mm), y-up, camera looks +z
    _quad(b, [(552.8, 0, 0), (0, 0, 0), (0, 0, 559.2), (549.6, 0, 559.2)], white)      # floor
    _quad(b, [(556, 548.8, 0), (556, 548.8, 559.2), (0, 548.8, 559.2), (0, 548.8, 0)], white)  # ceiling
    _quad(b, [(549.6, 0, 559.2), (0, 0, 559.2), (0, 548.8, 559.2), (556, 548.8, 559.2)], white)  # back
    # camera-right is +x (pbrt LookAt convention): red wall at x=0 (image
    # left), green wall at x~556 (image right), matching the iconic render
    _quad(b, [(0, 0, 559.2), (0, 0, 0), (0, 548.8, 0), (0, 548.8, 559.2)], red)
    _quad(b, [(552.8, 0, 0), (549.6, 0, 559.2), (556, 548.8, 559.2), (556, 548.8, 0)], green)
    # short block
    short = [(130, 165, 65), (82, 165, 225), (240, 165, 272), (290, 165, 114)]
    _quad(b, short, white)
    for i in range(4):
        a = short[i]
        c = short[(i + 1) % 4]
        _quad(b, [(a[0], 0, a[2]), (a[0], a[1], a[2]), (c[0], c[1], c[2]), (c[0], 0, c[2])], white)
    # tall block
    tall = [(423, 330, 247), (265, 330, 296), (314, 330, 456), (472, 330, 406)]
    _quad(b, tall, white)
    for i in range(4):
        a = tall[i]
        c = tall[(i + 1) % 4]
        _quad(b, [(a[0], 0, a[2]), (a[0], a[1], a[2]), (c[0], c[1], c[2]), (c[0], 0, c[2])], white)
    # light (slightly below ceiling), emission ~ classic cornell lamp
    emit = pcolor.RGBIlluminantSpectrum((17.0, 12.0, 4.0), cs)
    # winding chosen so the geometric normal points down (-y) into the box
    _quad(b, [(343, 548.75, 227), (343, 548.75, 332), (213, 548.75, 332), (213, 548.75, 227)],
          white, emission=emit, emission_scale=light_scale)

    scene = b.build(light_sampler="power", force_bvh=False)
    cam = cam_mod.make_camera(
        "perspective",
        camera_from_world=tfm.look_at((278, 273, -800), (278, 273, 0), (0, 1, 0)).inverse(),
        width=width, height=height, fov=38.5)
    return scene, cam


def make_furnace_plane(albedo=0.5, env_radiance=1.0, width=64, height=64,
                       center=(0.0, 0.0, 0.0)):
    """Infinite-plane white furnace: a large diffuse quad under a uniform
    environment light. Looking straight down at the plane, the exact answer is
    L = albedo * L_env (one bounce; reflected rays escape to the env).

    center translates the whole scene (plane + camera) — hit points at
    |p| ~ 10^3 stress the error-bound offset-ray / conservative-t machinery
    (reference float.h:164-195 robustness at large scene coordinates)."""
    b = sc.SceneBuilder()
    m = b.materials.add_diffuse((albedo, albedo, albedo))
    s = 1000.0
    cx, cy, cz = center
    _quad(b, [(cx - s, cy, cz - s), (cx + s, cy, cz - s),
              (cx + s, cy, cz + s), (cx - s, cy, cz + s)], m)
    b.add_uniform_infinite_light(spc.ConstantSpectrum(env_radiance))
    scene = b.build(light_sampler="uniform", force_bvh=False)
    cam = cam_mod.make_camera(
        "perspective",
        camera_from_world=tfm.look_at(
            (cx, cy + 10, cz), (cx, cy, cz + 0.0001), (0, 0, 1)).inverse(),
        width=width, height=height, fov=30.0)
    return scene, cam


def make_sphere_mesh(center, radius, subdiv=3):
    """Icosphere triangle mesh (host)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], np.int64)
    for _ in range(subdiv):
        vlist = list(verts)
        cache = {}
        nf = []
        def midpoint(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = vlist[i] + vlist[j]
                m /= np.linalg.norm(m)
                cache[key] = len(vlist)
                vlist.append(m)
            return cache[key]
        for (a, b_, c) in faces:
            ab, bc, ca = midpoint(a, b_), midpoint(b_, c), midpoint(c, a)
            nf += [[a, ab, ca], [ab, b_, bc], [ca, bc, c], [ab, bc, ca]]
        verts = np.asarray(vlist)
        faces = np.asarray(nf, np.int64)
    normals = verts.copy()
    verts = verts * radius + np.asarray(center, np.float64)
    return verts.astype(np.float32), faces, normals.astype(np.float32)


def make_material_showcase(width=400, height=300, subdiv=4, env_image=None):
    """Killeroo-class benchmark scene: dense triangle meshes (BVH-heavy) with
    gold/copper conductors + glass dielectric on a diffuse floor under an
    environment light. Exercises: BVH traversal, spectral metal Fresnel,
    rough/smooth dielectrics, env importance sampling."""
    b = sc.SceneBuilder()
    floor = b.materials.add_diffuse((0.4, 0.4, 0.4))
    au_eta = b.add_spectrum(spc.get_named_spectrum("metal-Au-eta"), key="au-eta")
    au_k = b.add_spectrum(spc.get_named_spectrum("metal-Au-k"), key="au-k")
    cu_eta = b.add_spectrum(spc.get_named_spectrum("metal-Cu-eta"), key="cu-eta")
    cu_k = b.add_spectrum(spc.get_named_spectrum("metal-Cu-k"), key="cu-k")
    gold = b.materials.add_conductor(eta_spec_idx=au_eta, k_spec_idx=au_k,
                                     roughness=0.1)
    copper = b.materials.add_conductor(eta_spec_idx=cu_eta, k_spec_idx=cu_k,
                                       roughness=0.005)
    glass = b.materials.add_dielectric(eta=1.5, roughness=0.0)

    _quad(b, [(-8, 0, -8), (8, 0, -8), (8, 0, 8), (-8, 0, 8)], floor,
          uvs=[[0, 0], [8, 0], [8, 8], [0, 8]])
    # analytic quadric spheres (exact silhouettes + normals, no BVH needed)
    for (cx, cz, mat) in [(-2.2, 0.0, gold), (0.0, 0.0, glass), (2.2, 0.0, copper)]:
        b.add_sphere((cx, 1.0, cz), 1.0, mat)
    if env_image is None:
        # smooth sky-like gradient env in equal-area layout
        res = 64
        u, vgrid = np.meshgrid((np.arange(res) + 0.5) / res,
                               (np.arange(res) + 0.5) / res, indexing="xy")
        import jax.numpy as jnp
        from .utils import vecmath as vmx
        d = np.asarray(vmx.equal_area_square_to_sphere(
            jnp.asarray(np.stack([u, vgrid], -1).reshape(-1, 2), jnp.float32)))
        z = d[:, 2].reshape(res, res)
        sky = np.stack([0.4 + 0.3 * np.maximum(z, 0),
                        0.5 + 0.4 * np.maximum(z, 0),
                        0.8 + 0.8 * np.maximum(z, 0)], -1).astype(np.float32)
        # a bright sun disk
        sun_dir = np.asarray([0.4, 0.8, 0.3])
        sun_dir = sun_dir / np.linalg.norm(sun_dir)
        cosd = (d @ sun_dir).reshape(res, res)
        sky += (cosd > 0.995)[..., None] * np.asarray([400.0, 380.0, 320.0])
        env_image = sky
    b.add_image_infinite_light(env_image)
    scene = b.build(light_sampler="power", force_bvh=True)
    cam = cam_mod.make_camera(
        "perspective",
        camera_from_world=tfm.look_at((0, 2.2, -7.5), (0, 1.0, 0), (0, 1, 0)).inverse(),
        width=width, height=height, fov=32.0)
    return scene, cam


def make_machines_frame(width=1920, height=1080, subdiv=3):
    """Transparent-machines-class frame (BASELINE.json config 5): layered
    (coated-diffuse) + subsurface + smooth/rough dielectric + conductor
    triangle meshes on a coated floor under an area light + gradient env —
    the full wavefront pipeline (BSSRDF probe stage included) at 1080p.
    Used by bench.py's time-to-64spp scale point."""
    b = sc.SceneBuilder()
    floor = b.materials.add_coated_diffuse((0.35, 0.36, 0.4), roughness=0.08)
    au_eta = b.add_spectrum(spc.get_named_spectrum("metal-Au-eta"),
                            key="au-eta")
    au_k = b.add_spectrum(spc.get_named_spectrum("metal-Au-k"), key="au-k")
    gold = b.materials.add_conductor(eta_spec_idx=au_eta, k_spec_idx=au_k,
                                     roughness=0.05)
    glass = b.materials.add_dielectric(eta=1.5, roughness=0.0)
    frosted = b.materials.add_dielectric(eta=1.5, roughness=0.15)
    skin = b.materials.add_subsurface(reflectance=(0.87, 0.78, 0.75),
                                      mfp=(0.25, 0.16, 0.12))
    shell = b.materials.add_coated_diffuse((0.55, 0.12, 0.1), roughness=0.04)

    _quad(b, [(-12, 0, -12), (12, 0, -12), (12, 0, 12), (-12, 0, 12)], floor)
    mats = [glass, skin, shell, gold, frosted]
    for i, m in enumerate(mats):
        cx = -4.4 + 2.2 * i
        v, f, n = make_sphere_mesh((cx, 1.0, 0.6 * ((i % 3) - 1)), 1.0,
                                   subdiv)
        b.add_mesh(v, f, m, normals=n)
    # overhead area light panel
    emit = pcolor.RGBIlluminantSpectrum((22.0, 20.0, 17.0), b.cs)
    white = b.materials.add_diffuse((0.8, 0.8, 0.8))
    _quad(b, [(2.0, 6.0, 2.0), (2.0, 6.0, -2.0), (-2.0, 6.0, -2.0),
              (-2.0, 6.0, 2.0)], white, emission=emit)
    # smooth gradient sky (equal-area layout, same recipe as the showcase)
    res = 64
    u, vgrid = np.meshgrid((np.arange(res) + 0.5) / res,
                           (np.arange(res) + 0.5) / res, indexing="xy")
    import jax.numpy as jnp
    from .utils import vecmath as vmx
    d = np.asarray(vmx.equal_area_square_to_sphere(
        jnp.asarray(np.stack([u, vgrid], -1).reshape(-1, 2), jnp.float32)))
    z = d[:, 2].reshape(res, res)
    sky = np.stack([0.25 + 0.2 * np.maximum(z, 0),
                    0.3 + 0.25 * np.maximum(z, 0),
                    0.45 + 0.45 * np.maximum(z, 0)], -1).astype(np.float32)
    b.add_image_infinite_light(sky)
    scene = b.build(light_sampler="power", force_bvh=True)
    cam = cam_mod.make_camera(
        "perspective",
        camera_from_world=tfm.look_at((0, 2.6, -8.5), (0, 1.0, 0),
                                      (0, 1, 0)).inverse(),
        width=width, height=height, fov=33.0)
    return scene, cam


def make_furnace_sphere(albedo=1.0, env_radiance=1.0, width=64, height=64,
                        subdiv=3):
    """Classic white furnace: unit diffuse sphere, uniform env. With albedo 1
    and enough bounces, every pixel (sphere or not) must equal env radiance."""
    b = sc.SceneBuilder()
    m = b.materials.add_diffuse((albedo, albedo, albedo))
    v, f, n = make_sphere_mesh((0, 0, 0), 1.0, subdiv)
    b.add_mesh(v, f, m, normals=n)
    b.add_uniform_infinite_light(spc.ConstantSpectrum(env_radiance))
    scene = b.build(light_sampler="uniform", force_bvh=True)
    cam = cam_mod.make_camera(
        "perspective",
        camera_from_world=tfm.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)).inverse(),
        width=width, height=height, fov=40.0)
    return scene, cam
