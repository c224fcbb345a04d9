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
LIGHT_AREA_SPHERE = 6  # analytic sphere emitter; center in p, radius in cfs
LIGHT_PROJECTION = 7   # image-projection delta light (reference lights.h:516)
LIGHT_GONIOMETRIC = 8  # equal-area image intensity (reference lights.h:599)


@struct.dataclass
class LightPool:
    """SoA light pool. Device code reads the PACKED row matrix (one gather
    per light lookup — XLA gathers cost ~1ms flat on TPU); the per-field
    arrays exist for host-side inspection and pool construction.

    packed columns: [bits(tag), p(3), dir(3), bits(spec_idx), scale,
                     bits(tri), two_sided, cfs, cfe, is_delta, pmf,
                     tri_verts(9)] = 24
    (tri_verts inlines the area light's triangle so per-depth NEE needs NO
    second pool lookup into tri_geo — on the cornell wave that lookup was
    a (N, 32) one-hot dot per depth, hlo_bytes fusion.657)
    """
    packed: jnp.ndarray     # (L, 24) f32
    tag: jnp.ndarray        # (L,) int32
    power: jnp.ndarray      # (L,) scalar photometric-ish power for samplers
    scale: jnp.ndarray      # (L,)
    spec_idx: jnp.ndarray   # (L,) int32
    # static set of light tags in the pool: sample_li compiles ONLY the
    # branches for types the scene contains (the TPU analog of the
    # reference wavefront's per-type kernel specialization,
    # wavefront/integrator.h:139)
    tags_present: tuple = struct.field(pytree_node=False, default=None)
    # shared texel atlas for projection/goniometric lights: (A, 4) rows of
    # [sigmoid coeffs (3), scale]; per-light offset/dims ride in the packed
    # row (tri slot = offset, cfs/cfe = width/height, two_sided slot =
    # tan_half_fov for projection)
    img_atlas: jnp.ndarray = None


def pack_light_pool(tag, p, dir_, spec_idx, scale, tri, two_sided, cfs, cfe,
                    is_delta, pmf, power, img_atlas=None,
                    tri_verts=None) -> LightPool:
    tag = np.asarray(tag, np.int32)
    tv = (np.asarray(tri_verts, np.float32).reshape(-1, 9)
          if tri_verts is not None else np.zeros((tag.shape[0], 9),
                                                 np.float32))
    packed = np.concatenate([
        tag[:, None].astype(np.float32),                  # value-encoded ints
        np.asarray(p, np.float32).reshape(-1, 3),
        np.asarray(dir_, np.float32).reshape(-1, 3),
        np.asarray(spec_idx, np.float32)[:, None],
        np.asarray(scale, np.float32)[:, None],
        np.asarray(tri, np.float32)[:, None],
        np.asarray(two_sided, np.float32)[:, None],
        np.asarray(cfs, np.float32)[:, None],
        np.asarray(cfe, np.float32)[:, None],
        np.asarray(is_delta, np.float32)[:, None],
        np.asarray(pmf, np.float32)[:, None],
        tv], axis=1)
    return LightPool(packed=jnp.asarray(packed), tag=jnp.asarray(tag),
                     power=jnp.asarray(np.asarray(power, np.float32)),
                     scale=jnp.asarray(np.asarray(scale, np.float32)),
                     spec_idx=jnp.asarray(np.asarray(spec_idx, np.int32)),
                     tags_present=tuple(sorted(set(int(t) for t in tag))),
                     img_atlas=(jnp.asarray(img_atlas)
                                if img_atlas is not None else
                                jnp.zeros((1, 4), jnp.float32)))


def _val_i32(f):
    from .ops.gather import f32_to_i32
    return f32_to_i32(f)


class LightRow:
    """View over gathered packed light rows (N, 24)."""

    def __init__(self, rows):
        self.tag = _val_i32(rows[..., 0])
        self.p = rows[..., 1:4]
        self.dir = rows[..., 4:7]
        self.spec_idx = _val_i32(rows[..., 7])
        self.scale = rows[..., 8]
        self.tri = _val_i32(rows[..., 9])
        self.two_sided = rows[..., 10] > 0.5
        self.two_sided_raw = rows[..., 10]
        self.cfs = rows[..., 11]
        self.cfe = rows[..., 12]
        self.is_delta = rows[..., 13] > 0.5
        self.pmf = rows[..., 14]
        # inlined area-light triangle (zeros for non-tri lights)
        self.va = rows[..., 15:18]
        self.vb = rows[..., 18:21]
        self.vc = rows[..., 21:24]


def eval_light_spectrum(spectra_pool, spec_idx, scale, lam):
    """Gather + interpolate emission spectra. spec_idx: (N,), lam: (N,4).

    Uses a ROW gather over a (S*471, 2) pair table built in-program (tiny):
    element gathers (scalar indices into a flat f32 array) lower to an XLA
    TPU kernel that runs at ~120k elem/ms — profiled at 10.5ms per call on a
    160k-ray wave, 67% of total wave time — while row gathers of the two
    interpolation taps run ~400x faster on the same shapes."""
    x = jnp.clip(lam - spc.LAMBDA_MIN, 0.0, spc.N_CIE - 1.000001)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, spc.N_CIE - 2)
    frac = x - i0.astype(jnp.float32)
    flat = spectra_pool.reshape(-1)
    # i0 <= N_CIE-2, so the rolled tap never crosses a spectrum boundary
    pairs = jnp.stack([flat, jnp.roll(flat, -1)], axis=-1)  # (S*471, 2)
    base = spec_idx[..., None] * spc.N_CIE + i0             # (N, 4)
    v = pairs[base]                                         # row gather
    return scale[..., None] * (v[..., 0] * (1 - frac) + v[..., 1] * frac)


def eval_all_spectra(spectra_pool, lam):
    """Evaluate EVERY pool spectrum at lam in one row gather.

    spectra_pool: (S, 471); lam: (N, 4). Returns (N, 4, S).

    Pair-packs the pool as (471, 2S) rows so the single gather is indexed by
    the wavelength bin alone; the per-light select then costs a tiny one-hot
    reduce per use instead of a gather per depth (wavelengths are fixed
    along a path, so this runs once per wave)."""
    S = spectra_pool.shape[0]
    x = jnp.clip(lam - spc.LAMBDA_MIN, 0.0, spc.N_CIE - 1.000001)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, spc.N_CIE - 2)
    frac = x - i0.astype(jnp.float32)
    poolT = spectra_pool.T                        # (471, S)
    pairs = jnp.concatenate([poolT, jnp.roll(poolT, -1, axis=0)], axis=-1)
    v = pairs[i0]                                 # (N, 4, 2S) row gather
    return v[..., :S] * (1 - frac)[..., None] + v[..., S:] * frac[..., None]


def select_spectrum(spec_cache, spec_idx, scale):
    """Pick rows of an eval_all_spectra cache: (N,4,S), (N,) -> (N,4)."""
    S = spec_cache.shape[-1]
    oh = (spec_idx[..., None] == jnp.arange(S, dtype=jnp.int32))
    v = jnp.sum(spec_cache * oh[..., None, :].astype(jnp.float32), axis=-1)
    return scale[..., None] * v


# one-hot select beats the per-call gather comfortably up to at least this
# pool size (cost is S multiply-adds per lane vs a ~1.2ms gather per call)
SPEC_CACHE_MAX = 64


def _lspec(spectra_pool, spec_idx, scale, lam, spec_cache=None):
    if spec_cache is not None:
        return select_spectrum(spec_cache, spec_idx, scale)
    return eval_light_spectrum(spectra_pool, spec_idx, scale, lam)


def _atlas_bilinear(atlas, off, w, h, u, v, lam):
    """Bilinear (coeffs, scale) fetch from the light image atlas; returns
    the spectral modulation factor (N, 4). u, v in [0, 1]."""
    from .utils import color as pcolor
    ux = jnp.clip(u, 0.0, 1.0) * w - 0.5
    uy = jnp.clip(v, 0.0, 1.0) * h - 0.5
    x0 = jnp.floor(ux)
    y0 = jnp.floor(uy)
    fx = (ux - x0)[..., None]
    fy = (uy - y0)[..., None]
    xs = jnp.clip(jnp.stack([x0, x0 + 1], -1), 0, jnp.maximum(w - 1, 0)[..., None])
    ys = jnp.clip(jnp.stack([y0, y0 + 1], -1), 0, jnp.maximum(h - 1, 0)[..., None])
    idx = (off[..., None, None] + ys[..., :, None] * w[..., None, None] +
           xs[..., None, :]).astype(jnp.int32)
    rows = atlas[idx]                            # (N, 2, 2, 4)
    c = (rows[..., 0, 0, :] * (1 - fx) * (1 - fy) +
         rows[..., 0, 1, :] * fx * (1 - fy) +
         rows[..., 1, 0, :] * (1 - fx) * fy +
         rows[..., 1, 1, :] * fx * fy)
    return pcolor.eval_rgb_sigmoid_polynomial(c[..., 0:3], lam) * c[..., 3:4]


def _image_delta_modulation(lights, row, wi_pt, lam, tag_is_proj):
    """Directional modulation of a projection/goniometric delta light for
    the light->receiver direction -wi_pt. Frame from row.dir via
    coordinate_system (scene files cannot set roll — documented TPU
    simplification of the reference's full light-from-render transform)."""
    w = -wi_pt  # receiver as seen FROM the light
    t1, t2 = vm.coordinate_system(row.dir)
    lx = vm.dot(w, t1)
    ly = vm.dot(w, t2)
    lz = vm.dot(w, row.dir)
    off = row.tri.astype(jnp.float32)
    iw = row.cfs
    ih = row.cfe
    # projection: perspective window at tan_half_fov (lights.h:516)
    thf = jnp.maximum(row.two_sided_raw, 1e-6)
    pu = 0.5 + safe_div(lx, lz) / (2.0 * thf)
    pv = 0.5 + safe_div(ly, lz) / (2.0 * thf)
    in_window = (lz > 0) & (pu >= 0) & (pu <= 1) & (pv >= 0) & (pv <= 1)
    m_proj = jnp.where(in_window[..., None],
                       _atlas_bilinear(lights.img_atlas, off, iw, ih,
                                       pu, pv, lam), 0.0)
    # goniometric: equal-area square over the full sphere (lights.h:599)
    uv = vm.equal_area_sphere_to_square(
        jnp.stack([lx, ly, lz], -1))
    m_gon = _atlas_bilinear(lights.img_atlas, off, iw, ih,
                            uv[..., 0], uv[..., 1], lam)
    return jnp.where(tag_is_proj[..., None], m_proj, m_gon)


def sample_li(lights: LightPool, light_idx, p_ref, n_ref, u2, lam,
              spectra_pool, tri_geo, scene_radius, env: "EnvLight" = None,
              spec_cache=None):
    """Sample incident direction from light light_idx toward p_ref.

    light_idx: (N,) into pool; p_ref: (N, 3); u2: (N, 2); lam: (N, 4);
    tri_geo: (T, 10) packed triangles (scene_core.Scene.tri_geo).
    Returns dict(wi (N,3), L (N,4), pdf (N,), p_light (N,3), is_delta (N,),
    valid (N,)). pdf is solid-angle measure (reference Light::SampleLi).
    """
    from .ops.gather import pool_lookup
    row = LightRow(pool_lookup(lights.packed, light_idx))
    tag = row.tag
    lp = row.p
    ldir = row.dir
    Lspec = _lspec(spectra_pool, row.spec_idx, row.scale, lam, spec_cache)

    # Only branches for light types the scene CONTAINS are traced/compiled
    # (tags_present is a static scene constant): a diffuse-box scene pays
    # nothing for env-map/spot/sphere sampling code.
    present = lights.tags_present
    if present is None:
        present = (LIGHT_POINT, LIGHT_DISTANT, LIGHT_SPOT, LIGHT_AREA_TRI,
                   LIGHT_UNIFORM_INFINITE, LIGHT_IMAGE_INFINITE,
                   LIGHT_AREA_SPHERE)
    single = len(present) == 1  # one light type: skip the select chain

    def pick(tagv, branch, wi, L, pdf, p_light):
        bwi, bL, bpdf, bp = branch
        if single:
            return bwi, bL, bpdf, bp
        m = tag == tagv
        m2 = m[..., None]
        return (jnp.where(m2, bwi, wi), jnp.where(m2, bL, L),
                jnp.where(m, bpdf, pdf), jnp.where(m2, bp, p_light))

    wi = jnp.zeros_like(p_ref)
    L = jnp.zeros_like(lam)
    pdf = jnp.zeros(lam.shape[:-1], jnp.float32)
    p_light = jnp.zeros_like(p_ref)

    if LIGHT_POINT in present or LIGHT_SPOT in present:
        # --- point ---
        d_pt = lp - p_ref
        dist2_pt = jnp.maximum(vm.length_squared(d_pt), 1e-12)
        wi_pt = d_pt / jnp.sqrt(dist2_pt)[..., None]
        L_pt = Lspec / dist2_pt[..., None]  # I / r^2
        pdf_pt = jnp.ones_like(dist2_pt)
        if LIGHT_POINT in present:
            wi, L, pdf, p_light = pick(LIGHT_POINT, (wi_pt, L_pt, pdf_pt, lp),
                                       wi, L, pdf, p_light)
        if LIGHT_SPOT in present:
            # --- spot: point with smooth falloff (reference SpotLight) ---
            cos_theta = vm.dot(-wi_pt, ldir)
            cfs = row.cfs
            cfe = row.cfe
            t = jnp.clip(safe_div(cos_theta - cfe, cfs - cfe), 0.0, 1.0)
            falloff = t * t * (3.0 - 2.0 * t)  # SmoothStep (lights.h:~310)
            falloff = jnp.where(cos_theta >= cfs, 1.0, falloff)
            falloff = jnp.where(cos_theta <= cfe, 0.0, falloff)
            wi, L, pdf, p_light = pick(
                LIGHT_SPOT, (wi_pt, L_pt * falloff[..., None], pdf_pt, lp),
                wi, L, pdf, p_light)

    if LIGHT_PROJECTION in present or LIGHT_GONIOMETRIC in present:
        # image-modulated delta lights: point-light geometry with a
        # directional spectral modulation from the shared atlas
        d_il = lp - p_ref
        dist2_il = jnp.maximum(vm.length_squared(d_il), 1e-12)
        wi_il = d_il / jnp.sqrt(dist2_il)[..., None]
        mod = _image_delta_modulation(lights, row, wi_il, lam,
                                      tag == LIGHT_PROJECTION)
        L_il = Lspec * mod / dist2_il[..., None]
        pdf_il = jnp.ones_like(dist2_il)
        if LIGHT_PROJECTION in present:
            wi, L, pdf, p_light = pick(LIGHT_PROJECTION,
                                       (wi_il, L_il, pdf_il, lp),
                                       wi, L, pdf, p_light)
        if LIGHT_GONIOMETRIC in present:
            wi, L, pdf, p_light = pick(LIGHT_GONIOMETRIC,
                                       (wi_il, L_il, pdf_il, lp),
                                       wi, L, pdf, p_light)

    if LIGHT_DISTANT in present:
        # --- distant: radiance from direction -dir at "infinity" ---
        wi_dist = -ldir
        p_dist = p_ref + wi_dist * (2.0 * scene_radius)
        wi, L, pdf, p_light = pick(
            LIGHT_DISTANT,
            (wi_dist, Lspec, jnp.ones(lam.shape[:-1], jnp.float32), p_dist),
            wi, L, pdf, p_light)

    if LIGHT_AREA_TRI in present:
        # --- area triangle: uniform-area sample -> solid angle ---
        # (verts ride in the light row itself — no tri_geo lookup)
        a, b, c = row.va, row.vb, row.vc
        bary = sp.sample_uniform_triangle(u2)
        p_tri = bary[..., 0:1] * a + bary[..., 1:2] * b + bary[..., 2:3] * c
        ng = vm.cross(b - a, c - a)
        area = 0.5 * vm.length(ng)
        ng = vm.normalize(ng)
        d_tri = p_tri - p_ref
        dist2_tri = jnp.maximum(vm.length_squared(d_tri), 1e-12)
        wi_tri = d_tri / jnp.sqrt(dist2_tri)[..., None]
        cos_l = vm.dot(ng, -wi_tri)
        emit_ok = row.two_sided | (cos_l > 0)
        # pdf_area -> pdf_solid_angle
        pdf_tri = safe_div(dist2_tri, jnp.abs(cos_l) * area)
        L_tri = jnp.where(emit_ok[..., None], Lspec, 0.0)
        wi, L, pdf, p_light = pick(LIGHT_AREA_TRI,
                                   (wi_tri, L_tri, pdf_tri, p_tri),
                                   wi, L, pdf, p_light)

    if LIGHT_AREA_SPHERE in present:
        # --- area sphere: solid-angle cone sampling (reference
        # Sphere::Sample from a reference point, shapes.h:280) ---
        rad_s = row.cfs
        dvec = lp - p_ref
        dc2 = jnp.maximum(vm.length_squared(dvec), 1e-12)
        dc = jnp.sqrt(dc2)
        w_axis = dvec / dc[..., None]
        sin2_max = jnp.clip(sqr(rad_s) / dc2, 0.0, 1.0)
        cos_max = safe_sqrt(1.0 - sin2_max)
        cos_t = 1.0 - u2[..., 0] * (1.0 - cos_max)
        sin_t = safe_sqrt(1.0 - sqr(cos_t))
        phi_s = 2.0 * PI * u2[..., 1]
        t1_s, t2_s = vm.coordinate_system(w_axis)
        wi_sph = (sin_t * jnp.cos(phi_s))[..., None] * t1_s + \
            (sin_t * jnp.sin(phi_s))[..., None] * t2_s + \
            cos_t[..., None] * w_axis
        # distance to the sphere along wi (nearest solution)
        ds = dc * cos_t - safe_sqrt(jnp.maximum(
            sqr(rad_s) - dc2 * sqr(sin_t), 0.0))
        p_sph = p_ref + wi_sph * ds[..., None]
        pdf_sph = safe_div(1.0, 2.0 * PI * (1.0 - cos_max))
        inside_s = dc <= rad_s  # reference falls back to area sampling
        pdf_sph = jnp.where(inside_s, 0.0, pdf_sph)
        wi, L, pdf, p_light = pick(LIGHT_AREA_SPHERE,
                                   (wi_sph, Lspec, pdf_sph, p_sph),
                                   wi, L, pdf, p_light)

    if LIGHT_UNIFORM_INFINITE in present:
        wi_inf = sp.sample_uniform_sphere(u2)
        pdf_inf = jnp.full(lam.shape[:-1], INV_4PI)
        p_inf = p_ref + wi_inf * (2.0 * scene_radius)
        wi, L, pdf, p_light = pick(LIGHT_UNIFORM_INFINITE,
                                   (wi_inf, Lspec, pdf_inf, p_inf),
                                   wi, L, pdf, p_light)

    if LIGHT_IMAGE_INFINITE in present and env is not None:
        wi_env, L_env, pdf_env, p_env = env_sample_li(env, p_ref, u2, lam,
                                                      scene_radius)
        wi, L, pdf, p_light = pick(LIGHT_IMAGE_INFINITE,
                                   (wi_env, L_env, pdf_env, p_env),
                                   wi, L, pdf, p_light)

    is_delta = row.is_delta
    valid = (pdf > 0) & jnp.any(L > 0, axis=-1)
    return dict(wi=wi, L=L, pdf=pdf, p_light=p_light, is_delta=is_delta,
                valid=valid)


def pdf_li_area_tri(row: "LightRow", p_ref, wi, p_hit, tri_geo_rows):
    """Solid-angle PDF that sample_li would have returned for direction wi
    hitting the area light at p_hit (reference Triangle::PDF from reference
    point). Used for MIS on BSDF-sampled paths. Takes pre-gathered rows."""
    a = tri_geo_rows[..., 0:3]
    b = tri_geo_rows[..., 3:6]
    c = tri_geo_rows[..., 6:9]
    ng = vm.cross(b - a, c - a)
    area = 0.5 * vm.length(ng)
    ng = vm.normalize(ng)
    dist2 = jnp.maximum(vm.length_squared(p_hit - p_ref), 1e-12)
    cos_l = jnp.abs(vm.dot(ng, -wi))
    return safe_div(dist2, cos_l * area)


def pdf_li_sphere(row: "LightRow", p_ref):
    """Solid-angle cone pdf for a BSDF ray that hit the sphere light
    (reference Sphere::PDF from reference point)."""
    dc2 = jnp.maximum(vm.length_squared(row.p - p_ref), 1e-12)
    sin2_max = jnp.clip(sqr(row.cfs) / dc2, 0.0, 1.0)
    cos_max = safe_sqrt(1.0 - sin2_max)
    pdf = safe_div(1.0, 2.0 * PI * (1.0 - cos_max))
    return jnp.where(dc2 <= sqr(row.cfs), 0.0, pdf)


def area_light_radiance(row: "LightRow", ng, wo, lam, spectra_pool,
                        spec_cache=None):
    """L emitted from an area-light surface point toward wo (reference
    DiffuseAreaLight::L, lights.h:445). Takes a pre-gathered LightRow."""
    Lspec = _lspec(spectra_pool, row.spec_idx, row.scale, lam, spec_cache)
    front = vm.dot(ng, wo) > 0
    return jnp.where((row.two_sided | front)[..., None], Lspec, 0.0)


def infinite_light_radiance(lights: LightPool, lam, spectra_pool, ray_d,
                            inf_indices: tuple, spec_cache=None):
    """Sum of Le from all infinite lights for escaped rays. Returns (N, 4).

    inf_indices: static tuple of pool indices of infinite lights (compiled
    into the program — the set of infinite lights is a scene constant)."""
    total = jnp.zeros(lam.shape, jnp.float32)
    for i in inf_indices:
        # static light index -> XLA slices, no gather; note the light's
        # SPECTRUM index differs from its pool index in general
        idx = jnp.broadcast_to(lights.spec_idx[int(i)], lam.shape[:-1])
        scale = lights.scale[int(i)]
        total = total + _lspec(spectra_pool, idx,
                               scale * jnp.ones(lam.shape[:-1]), lam,
                               spec_cache)
    return total


# Host-side power computation for light samplers (reference Light::Phi)
# ---------------------------------------------------------------------------
# ImageInfiniteLight (reference lights.h:544): equal-area octahedral radiance
# map. TPU design: texels store baked sigmoid coeffs + scale (like textures);
# directional sampling is an ALIAS TABLE over all texels — with the
# equal-area parameterization every texel covers solid angle 4pi/(W*H), so
# pdf(texel) = pmf * W * H / (4pi). This replaces the reference's
# PiecewiseConstant2D (whose row-CDF searches would gather megabytes per
# sample on TPU).

from flax import struct as _struct


@_struct.dataclass
class EnvLight:
    texels: jnp.ndarray      # (H*W, 4): [c0, c1, c2, scale]
    alias_rows: jnp.ndarray  # (H*W, 4): [q, alias, pmf_self, pmf_alias]
    pmf: jnp.ndarray         # (H*W,)
    illum: jnp.ndarray       # (471,) illuminant curve modulating RGB texels
    scale: jnp.ndarray       # scalar
    width: int = _struct.field(pytree_node=False, default=0)
    height: int = _struct.field(pytree_node=False, default=0)
    light_index: int = _struct.field(pytree_node=False, default=0)


def make_env_light(image_rgb, colorspace, scale=1.0, light_index=0) -> EnvLight:
    """image_rgb: (H, W, 3) linear RGB in EQUAL-AREA octahedral layout."""
    from .utils import sampling as usamp
    img = np.asarray(image_rgb, np.float32)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    m = np.maximum(flat.max(axis=-1), 1e-9)
    tex_scale = np.where(flat.max(axis=-1) > 1.0, 2.0 * m, 1.0).astype(np.float32)
    coeffs = colorspace.to_spectrum_coeffs(flat / tex_scale[:, None])
    texels = np.concatenate([coeffs, tex_scale[:, None]], 1)
    lum = 0.2126 * flat[:, 0] + 0.7152 * flat[:, 1] + 0.0722 * flat[:, 2]
    lum = np.maximum(lum, 1e-9 * lum.max() if lum.max() > 0 else 1e-9)
    at = usamp.AliasTable.build(lum)
    q = np.asarray(at.q, np.float32)
    alias = np.asarray(at.alias, np.int32)
    pmf = np.asarray(at.pmf, np.float32)
    alias_rows = np.concatenate([q[:, None], alias[:, None].astype(np.float32),
                                 pmf[:, None], pmf[alias][:, None]], 1)
    return EnvLight(texels=jnp.asarray(texels), alias_rows=jnp.asarray(alias_rows),
                    pmf=jnp.asarray(pmf),
                    illum=jnp.asarray(colorspace.illuminant_dense),
                    scale=jnp.asarray(scale, jnp.float32),
                    width=w, height=h, light_index=light_index)


def _env_texel_radiance(env: EnvLight, texel_idx, lam):
    """Spectral radiance of texel texel_idx at wavelengths lam (N, 4)."""
    from .utils import color as pcolor
    rows = env.texels[texel_idx]                  # gather (N, 4)
    refl = pcolor.eval_rgb_sigmoid_polynomial(rows[..., 0:3], lam)
    illum = spc.eval_dense(env.illum, lam)
    return refl * rows[..., 3:4] * illum * env.scale


def env_radiance(env, d, lam, p=None):
    """Le for escaped rays: BILINEAR over the equal-area texels (reference
    ImageInfiniteLight::ImageLe, lights.h:544 — bilinear image lookup).
    One fused (N, 2, 2, 4) gather; octahedral seams use edge clamp.

    p: escaped-ray origins — required for the PORTAL variant's window
    check (reference PortalImageInfiniteLight::Le tests
    Inside(uv, ImageBounds(ray.o)); without p the check degrades to the
    portal hemisphere only, which is exact for closed rooms whose only
    opening is the portal)."""
    from .utils import color as pcolor
    if isinstance(env, PortalEnvLight):
        return portal_env_radiance(env, d, lam, p=p)
    uv = vm.equal_area_sphere_to_square(d)
    ux = uv[..., 0] * env.width - 0.5
    uy = uv[..., 1] * env.height - 0.5
    x0 = jnp.floor(ux)
    y0 = jnp.floor(uy)
    fx = (ux - x0)[..., None]
    fy = (uy - y0)[..., None]
    xs = jnp.clip(jnp.stack([x0, x0 + 1], -1), 0, env.width - 1)
    ys = jnp.clip(jnp.stack([y0, y0 + 1], -1), 0, env.height - 1)
    idx = (ys[..., :, None] * env.width + xs[..., None, :]).astype(jnp.int32)
    rows = env.texels[idx]                       # (N, 2, 2, 4)
    c = (rows[..., 0, 0, :] * (1 - fx) * (1 - fy) +
         rows[..., 0, 1, :] * fx * (1 - fy) +
         rows[..., 1, 0, :] * (1 - fx) * fy +
         rows[..., 1, 1, :] * fx * fy)
    refl = pcolor.eval_rgb_sigmoid_polynomial(c[..., 0:3], lam)
    illum = spc.eval_dense(env.illum, lam)
    return refl * c[..., 3:4] * illum * env.scale


def env_sample_li(env, p_ref, u2, lam, scene_radius):
    """Importance-sample a direction toward the env map.

    Returns (wi, L, pdf_solid_angle, p_light)."""
    if isinstance(env, PortalEnvLight):
        return portal_env_sample_li(env, p_ref, u2, lam, scene_radius)
    n = env.width * env.height
    up = u2[..., 0] * n
    i = jnp.clip(up.astype(jnp.int32), 0, n - 1)
    frac = up - i.astype(jnp.float32)
    rows = env.alias_rows[i]                      # gather (N, 4)
    take = frac < rows[..., 0]
    texel = jnp.where(take, i, rows[..., 1].astype(jnp.int32))
    pmf = jnp.where(take, rows[..., 2], rows[..., 3])
    # jitter inside the texel with the remaining dimensions
    u_in = jnp.where(take, frac / jnp.maximum(rows[..., 0], 1e-9),
                     (frac - rows[..., 0]) / jnp.maximum(1.0 - rows[..., 0], 1e-9))
    tx = (texel % env.width).astype(jnp.float32)
    ty = (texel // env.width).astype(jnp.float32)
    uv = jnp.stack([(tx + jnp.clip(u_in, 0, 0.9999)) / env.width,
                    (ty + u2[..., 1]) / env.height], -1)
    wi = vm.equal_area_square_to_sphere(uv)
    pdf = pmf * (n / (4.0 * np.pi))
    L = _env_texel_radiance(env, texel, lam)
    p_light = p_ref + wi * (2.0 * scene_radius)
    return wi, L, pdf, p_light


def env_pdf_li(env, d, p_ref=None):
    """Solid-angle pdf that env_sample_li picks direction d (for MIS).
    p_ref is required for the portal variant (window depends on it)."""
    if isinstance(env, PortalEnvLight):
        return portal_env_pdf_li(env, d, p_ref)
    uv = vm.equal_area_sphere_to_square(d)
    x = jnp.clip((uv[..., 0] * env.width).astype(jnp.int32), 0, env.width - 1)
    y = jnp.clip((uv[..., 1] * env.height).astype(jnp.int32), 0, env.height - 1)
    pmf = env.pmf[y * env.width + x]
    return pmf * (env.width * env.height / (4.0 * np.pi))




# ---------------------------------------------------------------------------
# PortalImageInfiniteLight (reference lights.h:631 + lights.cpp): an env
# light whose energy enters through a rectangular portal. The image is
# resampled at build into "rectified" coordinates (u = (atan(wx/wz)+pi/2)/pi
# in the portal frame) where the portal's projection from ANY point is an
# axis-aligned image window; sampling restricts a WindowedPiecewiseConstant2D
# to that window (sampling.h:895).

@_struct.dataclass
class PortalEnvLight:
    texels: jnp.ndarray      # (H*W, 4) rectified-space [coeffs, scale]
    lum: jnp.ndarray         # (H, W) luminance for the windowed dist
    sat: jnp.ndarray         # (H+1, W+1) prefix sums of lum
    frame: jnp.ndarray       # (3, 3) rows = x_hat, y_hat, z_hat (normal)
    corners: jnp.ndarray     # (4, 3) portal corners (world)
    illum: jnp.ndarray       # (471,)
    scale: jnp.ndarray       # scalar
    width: int = _struct.field(pytree_node=False, default=0)
    height: int = _struct.field(pytree_node=False, default=0)
    light_index: int = _struct.field(pytree_node=False, default=0)


def make_portal_env_light(image_rgb, portal_corners, colorspace, scale=1.0,
                          light_index=0, res=None) -> PortalEnvLight:
    """image_rgb: (H, W, 3) EQUAL-AREA env image; portal_corners: (4, 3)
    ordered rectangle (c0 -> c1 along x_hat, c0 -> c3 along y_hat)."""
    img = np.asarray(image_rgb, np.float32)
    corners = np.asarray(portal_corners, np.float32).reshape(4, 3)
    # reference frame convention (lights.cpp:1140 Frame::FromXY(p03, p01)):
    # x along corner0->corner3, y along corner0->corner1; z = x cross y is
    # the direction ESCAPED rays travel (one-sided — the reverse winding
    # renders black, matching the oracle)
    x_hat = corners[3] - corners[0]
    x_hat = x_hat / np.linalg.norm(x_hat)
    y_hat = corners[1] - corners[0]
    y_hat = y_hat / np.linalg.norm(y_hat)
    z_hat = np.cross(x_hat, y_hat)
    z_hat = z_hat / np.linalg.norm(z_hat)
    frame = np.stack([x_hat, y_hat, z_hat])
    r = res or max(img.shape[0], 64)
    # resample: rectified texel centers -> world direction -> equal-area uv
    us = (np.arange(r) + 0.5) / r
    U, V = np.meshgrid(us, us, indexing="xy")  # V rows (y), U cols (x)
    alpha = np.pi * (U - 0.5)
    beta = np.pi * (V - 0.5)
    wl = np.stack([np.tan(alpha), np.tan(beta), np.ones_like(alpha)], -1)
    wl /= np.linalg.norm(wl, axis=-1, keepdims=True)
    w_world = wl @ frame  # rows of frame are the basis
    # equal-area fetch (host-side eval of the device mapping)
    ea_uv = np.asarray(vm.equal_area_sphere_to_square(
        jnp.asarray(w_world.reshape(-1, 3), jnp.float32)))
    h_img, w_img = img.shape[:2]
    xi = np.clip((ea_uv[:, 0] * w_img).astype(int), 0, w_img - 1)
    yi = np.clip((ea_uv[:, 1] * h_img).astype(int), 0, h_img - 1)
    rgb = img[yi, xi].reshape(r, r, 3)
    flat = rgb.reshape(-1, 3)
    m = np.maximum(flat.max(axis=-1), 1e-9)
    tscale = np.where(flat.max(axis=-1) > 1.0, 2.0 * m, 1.0).astype(np.float32)
    coeffs = colorspace.to_spectrum_coeffs(flat / tscale[:, None])
    texels = np.concatenate([coeffs, tscale[:, None]], 1)
    lum = (0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1]
           + 0.0722 * rgb[..., 2]).astype(np.float32)
    lum = np.maximum(lum, 1e-9 * max(lum.max(), 1e-9))
    sat = np.zeros((r + 1, r + 1), np.float32)
    sat[1:, 1:] = np.cumsum(np.cumsum(lum, 0), 1)
    return PortalEnvLight(texels=jnp.asarray(texels), lum=jnp.asarray(lum),
                          sat=jnp.asarray(sat), frame=jnp.asarray(frame),
                          corners=jnp.asarray(corners),
                          illum=jnp.asarray(colorspace.illuminant_dense),
                          scale=jnp.asarray(scale, jnp.float32),
                          width=r, height=r, light_index=light_index)


def _portal_uv_from_w(env: PortalEnvLight, w):
    """Rectified uv of world direction w + |duv/dw| Jacobian + validity
    (reference PortalImageInfiniteLight::ImageFromRender)."""
    wl = w @ env.frame.T           # (N, 3) local (x,y,z)
    z = wl[..., 2]
    valid = z > 1e-6
    zs = jnp.where(valid, z, 1.0)
    alpha = jnp.arctan2(wl[..., 0], zs)
    beta = jnp.arctan2(wl[..., 1], zs)
    u = jnp.clip((alpha + np.pi / 2) / np.pi, 0.0, 1.0)
    v = jnp.clip((beta + np.pi / 2) / np.pi, 0.0, 1.0)
    duv_dw = sqr(np.pi) * (1.0 - sqr(wl[..., 0])) * (1.0 - sqr(wl[..., 1])) \
        / jnp.maximum(z, 1e-6)
    return u, v, duv_dw, valid


def _portal_window(env: PortalEnvLight, p_ref):
    """Axis-aligned rectified-uv window of the portal seen from p_ref."""
    u0 = jnp.ones(p_ref.shape[:-1])
    v0 = jnp.ones(p_ref.shape[:-1])
    u1 = jnp.zeros(p_ref.shape[:-1])
    v1 = jnp.zeros(p_ref.shape[:-1])
    ok = jnp.ones(p_ref.shape[:-1], bool)
    for k in range(4):
        c = env.corners[k]
        w = vm.normalize(c - p_ref)
        u, v, _, valid = _portal_uv_from_w(env, w)
        ok = ok & valid
        u0 = jnp.minimum(u0, u)
        v0 = jnp.minimum(v0, v)
        u1 = jnp.maximum(u1, u)
        v1 = jnp.maximum(v1, v)
    return u0, v0, u1, v1, ok


def _sat_window_integral(sat, x0, y0, x1, y1):
    return sat[y1, x1] - sat[y0, x1] - sat[y1, x0] + sat[y0, x0]


def _portal_texel_radiance(env: PortalEnvLight, x, y, lam):
    from .utils import color as pcolor
    rows = env.texels[y * env.width + x]
    refl = pcolor.eval_rgb_sigmoid_polynomial(rows[..., 0:3], lam)
    illum = spc.eval_dense(env.illum, lam)
    return refl * rows[..., 3:4] * illum * env.scale


def portal_env_radiance(env: PortalEnvLight, d, lam, p=None):
    """Le for escaped rays: only directions through the portal window
    carry energy (reference PortalImageInfiniteLight::Le checks
    Inside(uv, ImageBounds(ray.o)); the hemisphere test alone suffices
    when p is unavailable)."""
    u, v, _, valid = _portal_uv_from_w(env, d)
    if p is not None:
        u0, v0, u1, v1, ok = _portal_window(env, p)
        valid = valid & ok & (u >= u0) & (u <= u1) & (v >= v0) & (v <= v1)
    x = jnp.clip((u * env.width).astype(jnp.int32), 0, env.width - 1)
    y = jnp.clip((v * env.height).astype(jnp.int32), 0, env.height - 1)
    L = _portal_texel_radiance(env, x, y, lam)
    return jnp.where(valid[..., None], L, 0.0)


def portal_env_sample_li(env: PortalEnvLight, p_ref, u2, lam, scene_radius):
    """Importance-sample the env restricted to the portal window from
    p_ref (reference SampleLi; WindowedPiecewiseConstant2D inversion by
    SAT bisection)."""
    W, H = env.width, env.height
    u0, v0, u1, v1, ok = _portal_window(env, p_ref)
    x0 = jnp.clip(jnp.floor(u0 * W).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.floor(v0 * H).astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(jnp.ceil(u1 * W).astype(jnp.int32), 1, W)
    y1 = jnp.clip(jnp.ceil(v1 * H).astype(jnp.int32), 1, H)
    sat = env.sat
    total = _sat_window_integral(sat, x0, y0, x1, y1)

    def bisect(lo, hi, target, integral_fn, iters):
        for _ in range(iters):
            mid = (lo + hi) // 2
            below = integral_fn(mid) <= target
            lo = jnp.where(below, mid, lo)
            hi = jnp.where(below, hi, mid)
        return lo

    import numpy as _np
    n_it = int(_np.ceil(_np.log2(max(W, 2)))) + 1
    tx = u2[..., 0] * total
    x = bisect(x0, x1, tx,
               lambda m: _sat_window_integral(sat, x0, y0, m, y1), n_it)
    x = jnp.clip(x, x0, x1 - 1)
    coltot = _sat_window_integral(sat, x, y0, x + 1, y1)
    ty = u2[..., 1] * coltot
    y = bisect(y0, y1, ty,
               lambda m: _sat_window_integral(sat, x, y0, x + 1, m), n_it)
    y = jnp.clip(y, y0, y1 - 1)
    # decorrelated jitter inside the texel (the bisection consumed u2)
    jx = (u2[..., 0] * 4096.17) % 1.0
    jy = (u2[..., 1] * 4096.17) % 1.0
    uu = (x.astype(jnp.float32) + jx) / W
    vv = (y.astype(jnp.float32) + jy) / H
    alpha = np.pi * (uu - 0.5)
    beta = np.pi * (vv - 0.5)
    wl = jnp.stack([jnp.tan(alpha), jnp.tan(beta), jnp.ones_like(alpha)],
                   -1)
    wl = wl / jnp.maximum(vm.length(wl), 1e-12)[..., None]
    wi = wl @ env.frame
    fxy = env.lum[y, x]
    pdf_uv = jnp.where(total > 0, safe_div(fxy, total), 0.0) * (W * H)
    _, _, duv_dw, _ = _portal_uv_from_w(env, wi)
    pdf = pdf_uv * safe_div(1.0, jnp.maximum(duv_dw, 1e-9))
    pdf = jnp.where(ok & (total > 0), pdf, 0.0)
    L = _portal_texel_radiance(env, x, y, lam)
    p_light = p_ref + wi * (2.0 * scene_radius)
    return wi, L, pdf, p_light


def portal_env_pdf_li(env: PortalEnvLight, d, p_ref):
    """Solid-angle pdf of portal_env_sample_li for direction d from p_ref
    (for MIS on BSDF-sampled escaped rays)."""
    W, H = env.width, env.height
    u, v, duv_dw, valid = _portal_uv_from_w(env, d)
    u0, v0, u1, v1, ok = _portal_window(env, p_ref)
    x0 = jnp.clip(jnp.floor(u0 * W).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.floor(v0 * H).astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(jnp.ceil(u1 * W).astype(jnp.int32), 1, W)
    y1 = jnp.clip(jnp.ceil(v1 * H).astype(jnp.int32), 1, H)
    x = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip((v * H).astype(jnp.int32), 0, H - 1)
    inside = (x >= x0) & (x < x1) & (y >= y0) & (y < y1)
    total = _sat_window_integral(env.sat, x0, y0, x1, y1)
    pdf_uv = jnp.where(total > 0, safe_div(env.lum[y, x], total), 0.0) * \
        (W * H)
    pdf = pdf_uv * safe_div(1.0, jnp.maximum(duv_dw, 1e-9))
    return jnp.where(valid & ok & inside, pdf, 0.0)


def compute_light_power(tag, scale, spectrum: spc.Spectrum, area=None,
                        two_sided=False, cos_falloff_start=1, cos_falloff_end=1,
                        scene_radius=1.0) -> float:
    lum = scale * spectrum.to_photometric()
    if tag == LIGHT_POINT:
        return 4 * np.pi * lum
    if tag == LIGHT_SPOT:
        # integral of the smoothstep falloff over the cone (reference
        # SpotLight::Phi; int_0^1 (3t^2 - 2t^3) dt = 1/2)
        return 2 * np.pi * lum * ((1 - cos_falloff_start) +
                                  (cos_falloff_start - cos_falloff_end) / 2.0)
    if tag == LIGHT_DISTANT:
        return np.pi * scene_radius ** 2 * lum
    if tag == LIGHT_AREA_TRI:
        return (2 if two_sided else 1) * np.pi * area * lum
    if tag == LIGHT_UNIFORM_INFINITE:
        return 4 * np.pi * np.pi * scene_radius ** 2 * lum
    if tag == LIGHT_PROJECTION:
        # image mean x projection window solid angle (reference
        # ProjectionLight::Phi integrates the image over the window)
        img_mean, tan_half = area if area is not None else (1.0, 1.0)
        sa = 4.0 * np.arctan(tan_half) * np.arctan(tan_half)
        return img_mean * sa * lum
    if tag == LIGHT_GONIOMETRIC:
        img_mean = area if area is not None else 1.0
        return 4 * np.pi * img_mean * lum
    return lum


# ---------------------------------------------------------------------------
# Emission sampling (reference Light::SampleLe / PDF_Le, lights.cpp) — the
# light-side of the path integral for LightPath/BDPT.

def sample_le(lights: LightPool, light_idx, u0, u1, lam, spectra_pool,
              tri_geo, scene_radius, scene_center, env: "EnvLight" = None,
              spec_cache=None):
    """Sample an emitted ray from light light_idx.

    u0, u1: (N, 2); returns dict(o (N,3), d (N,3), L (N,4), pdf_pos (N,),
    pdf_dir (N,), n_l (N,3) surface normal at the emitter (area lights),
    has_area (N,) bool, valid (N,)).

    Sampling strategies per type (each self-consistent with its pdf;
    efficiency refinements of the reference — e.g. the SpotLight two-zone
    cone split — are intentionally simplified to single-zone warps):
      point/projection/goniometric: uniform sphere direction
      spot: uniform cone up to the outer falloff angle
      distant/infinite: world-radius disk origin, fixed/uniform direction
      area tri / sphere: uniform-area point + cosine hemisphere
    """
    from .ops.gather import pool_lookup
    from .utils import sampling as sp
    row = LightRow(pool_lookup(lights.packed, light_idx))
    tag = row.tag
    lp = row.p
    ldir = row.dir
    Lspec = _lspec(spectra_pool, row.spec_idx, row.scale, lam, spec_cache)
    N = lam.shape[0]

    present = lights.tags_present
    if present is None:
        present = (LIGHT_POINT, LIGHT_DISTANT, LIGHT_SPOT, LIGHT_AREA_TRI,
                   LIGHT_UNIFORM_INFINITE, LIGHT_IMAGE_INFINITE,
                   LIGHT_AREA_SPHERE, LIGHT_PROJECTION, LIGHT_GONIOMETRIC)
    single = len(present) == 1

    o = jnp.zeros_like(lp)
    d = jnp.zeros_like(lp)
    L = jnp.zeros_like(lam)
    pdf_pos = jnp.zeros((N,), jnp.float32)
    pdf_dir = jnp.zeros((N,), jnp.float32)
    n_l = jnp.zeros_like(lp)
    has_area = jnp.zeros((N,), bool)

    def pick(tagv, vals, cur):
        if single:
            return vals
        m = tag == tagv
        out = []
        for v, c in zip(vals, cur):
            mm = m[..., None] if v.ndim == c.ndim == 2 else m
            out.append(jnp.where(mm, v, c))
        return out

    d_sph = sp.sample_uniform_sphere(u1)
    inv4pi = 1.0 / (4.0 * np.pi)

    if LIGHT_POINT in present:
        vals = (lp, d_sph, Lspec, jnp.ones((N,), jnp.float32),
                jnp.full((N,), inv4pi), d_sph, jnp.zeros((N,), bool))
        o, d, L, pdf_pos, pdf_dir, n_l, has_area = pick(
            LIGHT_POINT, vals, (o, d, L, pdf_pos, pdf_dir, n_l, has_area))

    if LIGHT_SPOT in present:
        # uniform cone around ldir up to cos_falloff_end (row.cfe)
        frame_t1, frame_t2 = vm.coordinate_system(ldir)
        d_cone_local = sp.sample_uniform_cone(u1, row.cfe)
        d_cone = (d_cone_local[..., 0:1] * frame_t1 +
                  d_cone_local[..., 1:2] * frame_t2 +
                  d_cone_local[..., 2:3] * ldir)
        cos_t = vm.dot(d_cone, ldir)
        t = jnp.clip(safe_div(cos_t - row.cfe, row.cfs - row.cfe), 0.0, 1.0)
        falloff = t * t * (3.0 - 2.0 * t)
        falloff = jnp.where(cos_t >= row.cfs, 1.0, falloff)
        pdf_cone = 1.0 / (2.0 * np.pi * jnp.maximum(1.0 - row.cfe, 1e-9))
        vals = (lp, d_cone, Lspec * falloff[..., None],
                jnp.ones((N,), jnp.float32), pdf_cone, d_cone,
                jnp.zeros((N,), bool))
        o, d, L, pdf_pos, pdf_dir, n_l, has_area = pick(
            LIGHT_SPOT, vals, (o, d, L, pdf_pos, pdf_dir, n_l, has_area))

    if LIGHT_PROJECTION in present or LIGHT_GONIOMETRIC in present:
        mod = _image_delta_modulation(lights, row, -d_sph, lam,
                                      tag == LIGHT_PROJECTION)
        vals = (lp, d_sph, Lspec * mod, jnp.ones((N,), jnp.float32),
                jnp.full((N,), inv4pi), d_sph, jnp.zeros((N,), bool))
        for tg in (LIGHT_PROJECTION, LIGHT_GONIOMETRIC):
            if tg in present:
                o, d, L, pdf_pos, pdf_dir, n_l, has_area = pick(
                    tg, vals, (o, d, L, pdf_pos, pdf_dir, n_l, has_area))

    if LIGHT_DISTANT in present or LIGHT_UNIFORM_INFINITE in present or \
            (LIGHT_IMAGE_INFINITE in present):
        # world-disk origin construction (reference DistantLight::SampleLe)
        r = scene_radius * 1.0001
        disk = sp.sample_uniform_disk_concentric(u0)
        pdf_disk = 1.0 / (np.pi * r * r)
        if LIGHT_DISTANT in present:
            dd = vm.normalize(ldir)
            t1d, t2d = vm.coordinate_system(dd)
            p0 = scene_center + r * (disk[..., 0:1] * t1d +
                                     disk[..., 1:2] * t2d - dd)
            vals = (p0, dd, Lspec, jnp.full((N,), pdf_disk),
                    jnp.ones((N,), jnp.float32), dd, jnp.zeros((N,), bool))
            o, d, L, pdf_pos, pdf_dir, n_l, has_area = pick(
                LIGHT_DISTANT, vals, (o, d, L, pdf_pos, pdf_dir, n_l,
                                      has_area))
        inf_present = [t for t in (LIGHT_UNIFORM_INFINITE,
                                   LIGHT_IMAGE_INFINITE) if t in present]
        for tg in inf_present:
            dd = d_sph
            t1d, t2d = vm.coordinate_system(dd)
            p0 = scene_center + r * (disk[..., 0:1] * t1d +
                                     disk[..., 1:2] * t2d - dd)
            if tg == LIGHT_IMAGE_INFINITE and env is not None:
                Le = env_radiance(env, -dd, lam)
            else:
                Le = Lspec
            vals = (p0, dd, Le, jnp.full((N,), pdf_disk),
                    jnp.full((N,), inv4pi), dd, jnp.zeros((N,), bool))
            o, d, L, pdf_pos, pdf_dir, n_l, has_area = pick(
                tg, vals, (o, d, L, pdf_pos, pdf_dir, n_l, has_area))

    if LIGHT_AREA_TRI in present:
        a, b, c = row.va, row.vb, row.vc
        bary = sp.sample_uniform_triangle(u0)
        p_tri = bary[..., 0:1] * a + bary[..., 1:2] * b + bary[..., 2:3] * c
        ngv = vm.cross(b - a, c - a)
        area = jnp.maximum(0.5 * vm.length(ngv), 1e-12)
        ngv = vm.normalize(ngv)
        # cosine hemisphere about the normal; two-sided lights flip with a
        # remapped u (reference DiffuseAreaLight::SampleLe)
        two = row.two_sided
        uflip = u1[..., 0]
        flip = two & (uflip < 0.5)
        u1r = jnp.where(two[..., None], jnp.stack(
            [jnp.where(flip, uflip * 2.0, (uflip - 0.5) * 2.0),
             u1[..., 1]], -1), u1)
        w_local = sp.sample_cosine_hemisphere(u1r)
        t1a, t2a = vm.coordinate_system(ngv)
        nn = jnp.where(flip[..., None], -ngv, ngv)
        w = (w_local[..., 0:1] * t1a + w_local[..., 1:2] * t2a +
             w_local[..., 2:3] * nn)
        pdir = jnp.abs(w_local[..., 2]) / np.pi
        pdir = jnp.where(two, pdir * 0.5, pdir)
        vals = (p_tri, w, Lspec, 1.0 / area, pdir, nn,
                jnp.ones((N,), bool))
        o, d, L, pdf_pos, pdf_dir, n_l, has_area = pick(
            LIGHT_AREA_TRI, vals, (o, d, L, pdf_pos, pdf_dir, n_l, has_area))

    if LIGHT_AREA_SPHERE in present:
        rad = jnp.maximum(row.cfs, 1e-9)
        n_s = sp.sample_uniform_sphere(u0)
        p_s = lp + rad[..., None] * n_s
        w_local = sp.sample_cosine_hemisphere(u1)
        t1s, t2s = vm.coordinate_system(n_s)
        w = (w_local[..., 0:1] * t1s + w_local[..., 1:2] * t2s +
             w_local[..., 2:3] * n_s)
        pdir = jnp.abs(w_local[..., 2]) / np.pi
        vals = (p_s, w, Lspec, 1.0 / (4.0 * np.pi * rad * rad), pdir, n_s,
                jnp.ones((N,), bool))
        o, d, L, pdf_pos, pdf_dir, n_l, has_area = pick(
            LIGHT_AREA_SPHERE, vals, (o, d, L, pdf_pos, pdf_dir, n_l,
                                      has_area))

    valid = (pdf_pos > 0) & (pdf_dir > 0) & jnp.any(L != 0, axis=-1)
    return dict(o=o, d=d, L=L, pdf_pos=pdf_pos, pdf_dir=pdf_dir, n_l=n_l,
                has_area=has_area, valid=valid, two_sided=row.two_sided)


def pdf_le(lights: LightPool, light_idx, w, tri_geo, scene_radius):
    """(pdf_pos, pdf_dir) of sample_le emitting in direction w from light
    light_idx (reference Light::PDF_Le).  Matches THIS module's sampling
    strategies (see sample_le docstring).  w: (N, 3) unit directions."""
    from .ops.gather import pool_lookup
    row = LightRow(pool_lookup(lights.packed, light_idx))
    tag = row.tag
    N = w.shape[0]
    inv4pi = 1.0 / (4.0 * np.pi)

    pdf_pos = jnp.ones((N,), jnp.float32)
    pdf_dir = jnp.full((N,), inv4pi, jnp.float32)

    # spot: uniform cone
    cos_sp = vm.dot(w, row.dir)
    pdf_cone = jnp.where(cos_sp >= row.cfe,
                         1.0 / (2.0 * np.pi *
                                jnp.maximum(1.0 - row.cfe, 1e-9)), 0.0)
    pdf_dir = jnp.where(tag == LIGHT_SPOT, pdf_cone, pdf_dir)
    # distant: delta direction
    pdf_pos = jnp.where(tag == LIGHT_DISTANT,
                        1.0 / (np.pi * scene_radius ** 2), pdf_pos)
    pdf_dir = jnp.where(tag == LIGHT_DISTANT, 0.0, pdf_dir)
    # area triangle: uniform area + cosine hemisphere
    a, b, c = row.va, row.vb, row.vc
    ngv = vm.cross(b - a, c - a)
    area = jnp.maximum(0.5 * vm.length(ngv), 1e-12)
    ngv = vm.normalize(ngv)
    cos_l = vm.dot(ngv, w)
    pdir_tri = jnp.where(row.two_sided, jnp.abs(cos_l) / (2.0 * np.pi),
                         jnp.maximum(cos_l, 0.0) / np.pi)
    pdf_pos = jnp.where(tag == LIGHT_AREA_TRI, 1.0 / area, pdf_pos)
    pdf_dir = jnp.where(tag == LIGHT_AREA_TRI, pdir_tri, pdf_dir)
    # area sphere: needs the surface point for the local cosine; callers
    # supply w measured from the sampled point, use |cos| via the radial
    # normal approximation is not available here -> treat via cos with the
    # direction from center (callers pass n explicitly via pdf_le_area)
    rad = jnp.maximum(row.cfs, 1e-9)
    pdf_pos = jnp.where(tag == LIGHT_AREA_SPHERE,
                        1.0 / (4.0 * np.pi * rad * rad), pdf_pos)
    # infinite: disk origin + uniform sphere
    is_inf = (tag == LIGHT_UNIFORM_INFINITE) | (tag == LIGHT_IMAGE_INFINITE)
    pdf_pos = jnp.where(is_inf, 1.0 / (np.pi * scene_radius ** 2), pdf_pos)
    return pdf_pos, pdf_dir


def light_point_normal(lights: LightPool, light_idx, p_on_light, tri_geo):
    """Emitter surface normal at a point on an area light (tri: face normal;
    sphere: radial). Zero vector for point-like lights."""
    from .ops.gather import pool_lookup
    row = LightRow(pool_lookup(lights.packed, light_idx))
    a, b, c = row.va, row.vb, row.vc
    n_tri = vm.normalize(vm.cross(b - a, c - a))
    n_sph = vm.normalize(p_on_light - row.p)
    n = jnp.zeros_like(p_on_light)
    n = jnp.where((row.tag == LIGHT_AREA_TRI)[..., None], n_tri, n)
    n = jnp.where((row.tag == LIGHT_AREA_SPHERE)[..., None], n_sph, n)
    return n
