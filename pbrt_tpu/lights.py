"""Light pool + sampling (reference lights.{h,cpp}; closed world
base/light.h:23: Point, Distant, Spot, DiffuseArea, UniformInfinite,
ImageInfinite, Projection, Goniometric, PortalImageInfinite).

TPU representation: all lights live in one SoA pool; emission spectra are
rows of the scene's dense spectrum pool scaled per light. Area lights are
per-emissive-triangle (the scene compiler splits mesh area lights into one
light per triangle, mirroring the reference's shape splitting in
CreateAggregate, scene.cpp:1391).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from .utils import vecmath as vm
from .utils import sampling as sp
from .utils import spectrum as spc
from .utils.math import PI, INV_4PI, sqr, safe_div, safe_sqrt

LIGHT_NONE = -1
LIGHT_POINT = 0
LIGHT_DISTANT = 1
LIGHT_SPOT = 2
LIGHT_AREA_TRI = 3
LIGHT_UNIFORM_INFINITE = 4
LIGHT_IMAGE_INFINITE = 5


@struct.dataclass
class LightPool:
    tag: jnp.ndarray        # (L,) int32
    p: jnp.ndarray          # (L, 3) position (point/spot) or direction-from (distant)
    dir: jnp.ndarray        # (L, 3) direction (distant/spot axis)
    spec_idx: jnp.ndarray   # (L,) int32 row in spectrum pool
    scale: jnp.ndarray      # (L,)
    tri: jnp.ndarray        # (L,) int32 triangle index for area lights
    two_sided: jnp.ndarray  # (L,) bool
    cos_falloff_start: jnp.ndarray  # (L,) spot
    cos_falloff_end: jnp.ndarray    # (L,)
    power: jnp.ndarray      # (L,) scalar photometric-ish power for samplers
    # world radius for infinite lights
    is_delta: jnp.ndarray   # (L,) bool (delta position/direction)


def empty_light_pool() -> LightPool:
    z3 = jnp.zeros((0, 3), jnp.float32)
    z = jnp.zeros((0,), jnp.float32)
    zi = jnp.zeros((0,), jnp.int32)
    zb = jnp.zeros((0,), bool)
    return LightPool(tag=zi, p=z3, dir=z3, spec_idx=zi, scale=z, tri=zi,
                     two_sided=zb, cos_falloff_start=z, cos_falloff_end=z,
                     power=z, is_delta=zb)


def eval_light_spectrum(spectra_pool, spec_idx, scale, lam):
    """Gather + interpolate emission spectra. spec_idx: (N,), lam: (N,4)."""
    x = jnp.clip(lam - spc.LAMBDA_MIN, 0.0, spc.N_CIE - 1.000001)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, spc.N_CIE - 2)
    frac = x - i0.astype(jnp.float32)
    v0 = spectra_pool[spec_idx[..., None], i0]
    v1 = spectra_pool[spec_idx[..., None], i0 + 1]
    return scale[..., None] * (v0 * (1 - frac) + v1 * frac)


def sample_li(lights: LightPool, light_idx, p_ref, n_ref, u2, lam,
              spectra_pool, tri_p0, tri_p1, tri_p2, scene_radius):
    """Sample incident direction from light light_idx toward p_ref.

    light_idx: (N,) into pool; p_ref: (N, 3); u2: (N, 2); lam: (N, 4).
    Returns dict(wi (N,3), L (N,4), pdf (N,), p_light (N,3), is_delta (N,),
    valid (N,)). pdf is solid-angle measure (reference Light::SampleLi).
    """
    tag = lights.tag[light_idx]
    lp = lights.p[light_idx]
    ldir = lights.dir[light_idx]
    scale = lights.scale[light_idx]
    sidx = lights.spec_idx[light_idx]
    Lspec = eval_light_spectrum(spectra_pool, sidx, scale, lam)  # (N,4)

    # --- point ---
    d_pt = lp - p_ref
    dist2_pt = jnp.maximum(vm.length_squared(d_pt), 1e-12)
    wi_pt = d_pt / jnp.sqrt(dist2_pt)[..., None]
    L_pt = Lspec / dist2_pt[..., None]  # I / r^2
    pdf_pt = jnp.ones_like(dist2_pt)

    # --- spot: like point with smooth falloff (reference SpotLight:~300) ---
    cos_theta = vm.dot(-wi_pt, ldir)
    cfs = lights.cos_falloff_start[light_idx]
    cfe = lights.cos_falloff_end[light_idx]
    t = jnp.clip(safe_div(cos_theta - cfe, cfs - cfe), 0.0, 1.0)
    falloff = sqr(sqr(t))  # smooth falloff (reference SmoothStep-based)
    falloff = jnp.where(cos_theta >= cfs, 1.0, falloff)
    falloff = jnp.where(cos_theta <= cfe, 0.0, falloff)
    L_spot = L_pt * falloff[..., None]

    # --- distant: radiance from direction -dir at "infinity" ---
    wi_dist = -ldir
    p_dist = p_ref + wi_dist * (2.0 * scene_radius)
    L_dist = Lspec
    pdf_dist = jnp.ones_like(dist2_pt)

    # --- area triangle: uniform-area sample + convert to solid angle ---
    ti = jnp.clip(lights.tri[light_idx], 0, max(tri_p0.shape[0] - 1, 0))
    a = tri_p0[ti]
    b = tri_p1[ti]
    c = tri_p2[ti]
    bary = sp.sample_uniform_triangle(u2)
    p_tri = bary[..., 0:1] * a + bary[..., 1:2] * b + bary[..., 2:3] * c
    ng = vm.cross(b - a, c - a)
    area = 0.5 * vm.length(ng)
    ng = vm.normalize(ng)
    d_tri = p_tri - p_ref
    dist2_tri = jnp.maximum(vm.length_squared(d_tri), 1e-12)
    wi_tri = d_tri / jnp.sqrt(dist2_tri)[..., None]
    cos_l = vm.dot(ng, -wi_tri)
    two = lights.two_sided[light_idx]
    emit_ok = two | (cos_l > 0)
    # pdf_area -> pdf_solid_angle
    pdf_tri = safe_div(dist2_tri, jnp.abs(cos_l) * area)
    L_tri = jnp.where(emit_ok[..., None], Lspec, 0.0)

    # --- uniform infinite ---
    wi_inf = sp.sample_uniform_sphere(u2)
    pdf_inf = jnp.full_like(dist2_pt, INV_4PI)
    p_inf = p_ref + wi_inf * (2.0 * scene_radius)

    t2 = tag[..., None]
    wi = jnp.where(t2 == LIGHT_POINT, wi_pt,
         jnp.where(t2 == LIGHT_SPOT, wi_pt,
         jnp.where(t2 == LIGHT_DISTANT, wi_dist,
         jnp.where(t2 == LIGHT_AREA_TRI, wi_tri, wi_inf))))
    L = jnp.where(t2 == LIGHT_POINT, L_pt,
        jnp.where(t2 == LIGHT_SPOT, L_spot,
        jnp.where(t2 == LIGHT_DISTANT, L_dist,
        jnp.where(t2 == LIGHT_AREA_TRI, L_tri, Lspec))))
    pdf = jnp.where(tag == LIGHT_POINT, pdf_pt,
          jnp.where(tag == LIGHT_SPOT, pdf_pt,
          jnp.where(tag == LIGHT_DISTANT, pdf_dist,
          jnp.where(tag == LIGHT_AREA_TRI, pdf_tri, pdf_inf))))
    p_light = jnp.where(t2 == LIGHT_POINT, lp,
              jnp.where(t2 == LIGHT_SPOT, lp,
              jnp.where(t2 == LIGHT_DISTANT, p_dist,
              jnp.where(t2 == LIGHT_AREA_TRI, p_tri, p_inf))))
    is_delta = lights.is_delta[light_idx]
    valid = (pdf > 0) & jnp.any(L > 0, axis=-1)
    return dict(wi=wi, L=L, pdf=pdf, p_light=p_light, is_delta=is_delta,
                valid=valid)


def pdf_li_area_tri(lights: LightPool, light_idx, p_ref, wi, p_hit, n_hit,
                    tri_p0, tri_p1, tri_p2):
    """Solid-angle PDF that sample_li would have returned for direction wi
    hitting the area light at p_hit (reference Triangle::PDF from reference
    point). Used for MIS on BSDF-sampled paths."""
    ti = jnp.clip(lights.tri[light_idx], 0, max(tri_p0.shape[0] - 1, 0))
    a, b, c = tri_p0[ti], tri_p1[ti], tri_p2[ti]
    ng = vm.cross(b - a, c - a)
    area = 0.5 * vm.length(ng)
    ng = vm.normalize(ng)
    dist2 = jnp.maximum(vm.length_squared(p_hit - p_ref), 1e-12)
    cos_l = jnp.abs(vm.dot(ng, -wi))
    return safe_div(dist2, cos_l * area)


def area_light_radiance(lights: LightPool, light_idx, ng, wo, lam, spectra_pool):
    """L emitted from an area-light surface point toward wo (reference
    DiffuseAreaLight::L, lights.h:445)."""
    scale = lights.scale[light_idx]
    sidx = lights.spec_idx[light_idx]
    Lspec = eval_light_spectrum(spectra_pool, sidx, scale, lam)
    two = lights.two_sided[light_idx]
    front = vm.dot(ng, wo) > 0
    return jnp.where((two | front)[..., None], Lspec, 0.0)


def infinite_light_radiance(lights: LightPool, lam, spectra_pool, ray_d,
                            inf_indices: tuple):
    """Sum of Le from all infinite lights for escaped rays. Returns (N, 4).

    inf_indices: static tuple of pool indices of infinite lights (compiled
    into the program — the set of infinite lights is a scene constant)."""
    total = jnp.zeros(lam.shape, jnp.float32)
    for i in inf_indices:
        idx = jnp.full(lam.shape[:-1], int(i), jnp.int32)
        total = total + eval_light_spectrum(spectra_pool, idx,
                                            lights.scale[idx], lam)
    return total


# Host-side power computation for light samplers (reference Light::Phi)
def compute_light_power(tag, scale, spectrum: spc.Spectrum, area=None,
                        two_sided=False, cos_falloff_start=1, cos_falloff_end=1,
                        scene_radius=1.0) -> float:
    lum = scale * spectrum.to_photometric()
    if tag == LIGHT_POINT:
        return 4 * np.pi * lum
    if tag == LIGHT_SPOT:
        # integral of falloff over cone (reference SpotLight::Phi)
        return 2 * np.pi * lum * ((1 - cos_falloff_start) +
                                  (cos_falloff_start - cos_falloff_end) / 5.0)
    if tag == LIGHT_DISTANT:
        return np.pi * scene_radius ** 2 * lum
    if tag == LIGHT_AREA_TRI:
        return (2 if two_sided else 1) * np.pi * area * lum
    if tag == LIGHT_UNIFORM_INFINITE:
        return 4 * np.pi * np.pi * scene_radius ** 2 * lum
    return lum
