"""Cameras (reference cameras.{h,cpp}: Perspective:340, Orthographic:283,
Spherical:406; base/camera.h:28).

A camera is a parameter struct + a pure `generate_ray` over batched
CameraSamples. The rendering coordinate system is camera-world (reference
CameraTransform, cameras.h:27: world-space rays with precision kept near the
camera by the scene compiler translating geometry; we currently render in
world space and rely on float32 + offset-ray hygiene).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from .utils import transform as tfm
from .utils import vecmath as vm
from .utils.math import lerp, PI
from .utils import sampling as sp

CAMERA_PERSPECTIVE = 0
CAMERA_ORTHOGRAPHIC = 1
CAMERA_SPHERICAL = 2

SPHERE_EQUIRECT = 0
SPHERE_EQUALAREA = 1


@struct.dataclass
class Camera:
    kind: int = struct.field(pytree_node=False, default=CAMERA_PERSPECTIVE)
    # camera-to-world
    c2w_m: jnp.ndarray = None           # (4,4)
    width: int = struct.field(pytree_node=False, default=640)
    height: int = struct.field(pytree_node=False, default=480)
    tan_half_fov: jnp.ndarray = None    # scalar (perspective)
    screen_min: tuple = struct.field(pytree_node=False, default=(-1.0, -1.0))
    screen_max: tuple = struct.field(pytree_node=False, default=(1.0, 1.0))
    lens_radius: jnp.ndarray = None
    focal_distance: jnp.ndarray = None
    shutter_open: float = struct.field(pytree_node=False, default=0.0)
    shutter_close: float = struct.field(pytree_node=False, default=1.0)
    mapping: int = struct.field(pytree_node=False, default=SPHERE_EQUALAREA)


def make_camera(kind="perspective", camera_from_world: tfm.Transform = None,
                width=640, height=480, fov=90.0, lens_radius=0.0,
                focal_distance=1e6, shutter_open=0.0, shutter_close=1.0,
                screen_window=None, mapping="equalarea") -> Camera:
    kinds = {"perspective": CAMERA_PERSPECTIVE, "orthographic": CAMERA_ORTHOGRAPHIC,
             "spherical": CAMERA_SPHERICAL}
    if camera_from_world is None:
        camera_from_world = tfm.identity()
    w2c = camera_from_world
    c2w = w2c.inverse()
    aspect = width / height
    if screen_window is not None:
        smin, smax = tuple(screen_window[0]), tuple(screen_window[1])
    elif aspect > 1:
        smin, smax = (-aspect, -1.0), (aspect, 1.0)
    else:
        smin, smax = (-1.0, -1.0 / aspect), (1.0, 1.0 / aspect)
    return Camera(kind=kinds[kind], c2w_m=jnp.asarray(c2w.m, jnp.float32),
                  width=width, height=height,
                  tan_half_fov=jnp.asarray(np.tan(np.radians(fov) / 2), jnp.float32),
                  screen_min=smin, screen_max=smax,
                  lens_radius=jnp.asarray(lens_radius, jnp.float32),
                  focal_distance=jnp.asarray(focal_distance, jnp.float32),
                  shutter_open=shutter_open, shutter_close=shutter_close,
                  mapping=SPHERE_EQUALAREA if mapping == "equalarea" else SPHERE_EQUIRECT)


def generate_ray(cam: Camera, p_film, u_lens, u_time):
    """p_film: (..., 2) raster coords (continuous, [0,W)x[0,H)); u_lens (..., 2);
    u_time (...,). Returns (o, d, time) world-space.

    (reference PerspectiveCamera::GenerateRay, cameras.cpp)
    """
    sx = cam.screen_min[0] + (p_film[..., 0] / cam.width) * \
        (cam.screen_max[0] - cam.screen_min[0])
    # raster y grows downward; screen y grows upward
    sy = cam.screen_max[1] - (p_film[..., 1] / cam.height) * \
        (cam.screen_max[1] - cam.screen_min[1])
    time = lerp(u_time, cam.shutter_open, cam.shutter_close)

    if cam.kind == CAMERA_PERSPECTIVE:
        # camera-space direction through screen point on z=1 plane
        px = sx * cam.tan_half_fov
        py = sy * cam.tan_half_fov
        d_cam = vm.v3(px, py, jnp.ones_like(px))
        o_cam = jnp.zeros_like(d_cam)
        # depth of field (reference cameras.h:372)
        lens_ok = cam.lens_radius > 0
        p_lens = cam.lens_radius * sp.sample_uniform_disk_concentric(u_lens)
        ft = cam.focal_distance  # d_cam.z == 1
        p_focus = d_cam * ft[..., None] if ft.ndim else d_cam * ft
        o_dof = jnp.stack([p_lens[..., 0], p_lens[..., 1],
                           jnp.zeros_like(p_lens[..., 0])], -1)
        d_dof = p_focus - o_dof
        o_cam = jnp.where(lens_ok, o_dof, o_cam)
        d_cam = jnp.where(lens_ok, d_dof, d_cam)
    elif cam.kind == CAMERA_ORTHOGRAPHIC:
        o_cam = vm.v3(sx, sy, jnp.zeros_like(sx))
        d_cam = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), o_cam.shape)
    else:  # spherical
        u = p_film[..., 0] / cam.width
        v = p_film[..., 1] / cam.height
        if cam.mapping == SPHERE_EQUALAREA:
            uv = jnp.stack([u, 1.0 - v], axis=-1)
            d_ea = vm.equal_area_square_to_sphere(uv)
            # remap to pbrt's convention (z-up -> y-up view axis z)
            d_cam = jnp.stack([-d_ea[..., 0], d_ea[..., 2], -d_ea[..., 1]], axis=-1)
        else:
            theta = PI * v
            phi = 2 * PI * u
            d_cam = vm.spherical_direction(jnp.sin(theta), jnp.cos(theta), phi)
            d_cam = jnp.stack([d_cam[..., 0], d_cam[..., 2], d_cam[..., 1]], axis=-1)
        o_cam = jnp.zeros_like(d_cam)

    m = cam.c2w_m
    o_w = o_cam @ m[:3, :3].T + m[:3, 3]
    d_w = vm.normalize(d_cam @ m[:3, :3].T)
    return o_w, d_w, time


def camera_ray_differentials(cam: Camera):
    """Per-pixel differential scale for texture filtering: approximate
    dpdx spacing via one-pixel screen offsets (reference
    CameraBase::Approximate_dp_dxy). Returns scalar radians-per-pixel-ish
    spread used for ray cones."""
    if cam.kind == CAMERA_PERSPECTIVE:
        return float(2 * np.asarray(cam.tan_half_fov) *
                     (cam.screen_max[0] - cam.screen_min[0]) / 2 / cam.width)
    return 1.0 / cam.width


def pixel_cone_spread(cam: Camera):
    """Traced scalar: angular width of one pixel's ray cone — feeds texture
    MIP selection through the path integrator's cone state (the TPU
    substitution for dual differential rays, cameras.h:140). Works under
    jit (uses jnp on traced camera fields)."""
    if cam.kind == CAMERA_PERSPECTIVE and cam.tan_half_fov is not None:
        return 2.0 * cam.tan_half_fov * \
            (cam.screen_max[0] - cam.screen_min[0]) / 2.0 / cam.width
    return jnp.float32(1.0 / cam.width)
