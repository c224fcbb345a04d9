"""Whole-bounce Pallas megakernel for diffuse/area-light scenes.

The fused XLA wave on a cornell-class scene spreads ~300 small fusions per
depth; profiling (ROUND4/round-5 tooling) showed the wave is limited by HBM
materialization of per-lane state between fusions (~26 KB/path), while the
actual compute — 32-triangle intersection, ZSobol sampling, diffuse
shading — costs ~0.3 ms per depth at 262k lanes. This kernel runs the ENTIRE
path loop (intersect -> emitter MIS -> NEE + shadow ray -> BSDF sample -> RR)
for all depths inside ONE Pallas kernel: per-lane state lives in
VMEM/registers for the whole path and HBM traffic drops to the kernel's
inputs/outputs (~120 B/lane total).

This is the TPU-native analog of the reference's GPU megakernel
specialization by material/scene class (wavefront/integrator.h:139
basic/universal split; gpu/optix/optix.cu raygen programs): scenes whose
closed world is {diffuse materials, area-triangle lights, power/uniform
light sampler, zsobol sampler} compile to this kernel; everything else runs
the general fused wave (integrators/path.py).

Semantics mirror integrators/path.py::trace_paths exactly (same sampler
dimension layout, same MIS/RR formulas, same watertight-MT triangle test via
pallas_intersect._tri_block_math, same offset-ray origins) — gated by
tests/test_megawave.py against trace_paths lane-for-lane.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_intersect import _tri_block_math, LANES
from ..utils import math as _math_mod

BLOCK_ROWS = 8
BLOCK = BLOCK_ROWS * LANES

_U32 = jnp.uint32
_F32_SCALE = np.float32(2.0 ** -32)
_ONE_MINUS_EPS = np.float32(np.nextafter(np.float32(1.0), np.float32(0.0)))
_INV_PI = np.float32(1.0 / np.pi)
_PI = np.float32(np.pi)
_G7 = np.float32((7 * np.finfo(np.float32).eps * 0.5) /
                 (1 - 7 * np.finfo(np.float32).eps * 0.5))

# sampler dimension layout (integrators/path.py)
_CAM_DIMS = 6
_DIMS_PER_BOUNCE = 11


class MegaMeta(NamedTuple):
    """Static scene metadata gating the megakernel (Scene.mega)."""
    n_tris: int
    n_mats: int
    n_lights: int
    light_spec: int    # spectra_pool index shared by every light
    ls_uniform: bool   # uniform light sampler (else power alias)


# ---------------------------------------------------------------------------
# Host-side hash replicas (pure numpy uint32; must match utils/rng.py —
# pinned by tests/test_megawave.py::test_host_hash_matches_device)

def _fmix32_host(h):
    h = np.uint32(h)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint32(16)
        h = np.uint32(h * np.uint32(0x85EBCA6B))
        h ^= h >> np.uint32(13)
        h = np.uint32(h * np.uint32(0xC2B2AE35))
        h ^= h >> np.uint32(16)
    return h


def _hash_u32_host(*words) -> int:
    with np.errstate(over="ignore"):
        h = np.uint32(0x9E3779B9)
        for w in words:
            h = _fmix32_host(
                np.uint32(w) ^ np.uint32(h * np.uint32(0x01000193)
                                         + np.uint32(0x517CC1B7)))
    return int(h)


@functools.lru_cache(maxsize=1)
def _sobol_cols01():
    """First two Sobol' dimension matrices as host tuples of 32 ints."""
    from ..utils.lowdiscrepancy import sobol_matrices
    m = sobol_matrices()
    return tuple(int(x) for x in m[0][:32]), tuple(int(x) for x in m[1][:32])


# ---------------------------------------------------------------------------
# In-kernel u32 helpers (shapes: (BLOCK_ROWS, LANES) arrays)

def _rev32(n):
    n = ((n << np.uint32(16)) | (n >> np.uint32(16)))
    n = ((n & _U32(0x00FF00FF)) << np.uint32(8)) | \
        ((n & _U32(0xFF00FF00)) >> np.uint32(8))
    n = ((n & _U32(0x0F0F0F0F)) << np.uint32(4)) | \
        ((n & _U32(0xF0F0F0F0)) >> np.uint32(4))
    n = ((n & _U32(0x33333333)) << np.uint32(2)) | \
        ((n & _U32(0xCCCCCCCC)) >> np.uint32(2))
    n = ((n & _U32(0x55555555)) << np.uint32(1)) | \
        ((n & _U32(0xAAAAAAAA)) >> np.uint32(1))
    return n


def _fast_owen(v, seed: int):
    """FastOwenScrambler with a compile-time seed (lowdiscrepancy.h:227)."""
    seed = np.uint32(seed)
    v = _rev32(v)
    v = v ^ (v * _U32(0x3D20ADEA))
    v = v + seed
    v = v * np.uint32((int(seed) >> 16) | 1)
    v = v ^ (v * _U32(0x05526C56))
    v = v ^ (v * _U32(0x53A22864))
    return _rev32(v)


def _sobol_eval(idx, cols):
    """32-step generator-matrix product (lowdiscrepancy.h:168)."""
    v = jnp.zeros_like(idx)
    for i in range(32):
        bit = (idx >> np.uint32(i)) & np.uint32(1)
        v = v ^ jnp.where(bit.astype(bool), _U32(np.uint32(cols[i])),
                          np.uint32(0))
    return v


def _u32_to_f(v):
    # Mosaic has no u32->f32 cast: split into two exact i32->f32 parts.
    # hi < 2^23 and lo < 2^9 convert exactly; hi*512 is a power-of-two
    # scale, so hi*512 + lo rounds ONCE — bit-identical to the direct
    # round-nearest u32->f32 conversion.
    hi = (v >> np.uint32(9)).astype(jnp.int32).astype(jnp.float32)
    lo = (v & np.uint32(0x1FF)).astype(jnp.int32).astype(jnp.float32)
    f = hi * np.float32(512.0) + lo
    return jnp.minimum(f * _F32_SCALE, _ONE_MINUS_EPS)


def _zsobol_index(morton_index, dim: int, seed: int, B: int):
    """Fast-variant ZSobol shuffled sample index (samplers.py
    _zsobol_sample_index_fast) with compile-time dim/seed."""
    s = _hash_u32_host(dim, seed, 0x9dbf6d7c)
    v = morton_index << np.uint32(32 - B)
    v = _fast_owen(v, s)
    return v >> np.uint32(32 - B)


def _zs_1d(morton_index, dim: int, seed: int, B: int):
    idx = _zsobol_index(morton_index, dim, seed, B)
    h = _hash_u32_host(dim, seed)
    c0, _ = _sobol_cols01()
    return _u32_to_f(_fast_owen(_sobol_eval(idx, c0), h))


def _zs_2d(morton_index, dim: int, seed: int, B: int):
    idx = _zsobol_index(morton_index, dim, seed, B)
    ha = _hash_u32_host(dim, seed)
    hb = _hash_u32_host(dim, seed, 0x4df5)
    c0, c1 = _sobol_cols01()
    ua = _u32_to_f(_fast_owen(_sobol_eval(idx, c0), ha))
    ub = _u32_to_f(_fast_owen(_sobol_eval(idx, c1), hb))
    return ua, ub


# ---------------------------------------------------------------------------
# In-kernel float helpers on component tuples (x, y, z each (R, 128))

def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _normalize3(a):
    inv = jax.lax.rsqrt(jnp.maximum(_dot3(a, a), 1e-30))
    return (a[0] * inv, a[1] * inv, a[2] * inv), 1.0 / inv


def _safe_div(a, b):
    return jnp.where(b != 0.0, a / jnp.where(b == 0.0, 1.0, b), 0.0)


def _power_heuristic(f_pdf, g_pdf):
    f2 = f_pdf * f_pdf
    g2 = g_pdf * g_pdf
    w = _safe_div(f2, f2 + g2)
    return jnp.where(jnp.isinf(f2), 1.0, w)


def _next_up(v):
    ui = jax.lax.bitcast_convert_type(v, jnp.uint32)
    ui = jnp.where(v >= 0, ui + np.uint32(1), ui - np.uint32(1))
    out = jax.lax.bitcast_convert_type(ui, jnp.float32)
    tiny = np.float32(np.nextafter(np.float32(0), np.float32(1)))
    out = jnp.where(v == np.float32(-0.0), tiny, out)
    return jnp.where(jnp.isinf(v) & (v > 0), v, out)


def _next_down(v):
    ui = jax.lax.bitcast_convert_type(v, jnp.uint32)
    ui = jnp.where(v > 0, ui - np.uint32(1), ui + np.uint32(1))
    out = jax.lax.bitcast_convert_type(ui, jnp.float32)
    tiny = np.float32(np.nextafter(np.float32(0), np.float32(-1)))
    out = jnp.where(v == 0.0, tiny, out)
    return jnp.where(jnp.isinf(v) & (v < 0), v, out)


def _offset_origin(p, p_err, ng, w):
    """offset_ray_origin_exact (scene_core.py) on component tuples."""
    dmag = jnp.abs(ng[0]) * p_err[0] + jnp.abs(ng[1]) * p_err[1] + \
        jnp.abs(ng[2]) * p_err[2]
    sgn = jnp.where(_dot3(w, ng) < 0, -1.0, 1.0)
    out = []
    for c in range(3):
        off = dmag * ng[c] * sgn
        po = p[c] + off
        po = jnp.where(off > 0, _next_up(po),
                       jnp.where(off < 0, _next_down(po), po))
        out.append(po)
    return tuple(out)


def _coordinate_system(v):
    """Duff et al. branchless ONB (utils/vecmath.py coordinate_system)."""
    sign = jnp.where(v[2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + v[2])
    b = v[0] * v[1] * a
    t1 = (1.0 + sign * v[0] * v[0] * a, sign * b, -sign * v[0])
    t2 = (b, sign + v[1] * v[1] * a, -v[1])
    return t1, t2


def _sample_uniform_triangle(u0, u1):
    cond = u0 < u1
    b0 = jnp.where(cond, u0 * 0.5, u0 - u1 * 0.5)
    b1 = jnp.where(cond, u1 - b0, u1 * 0.5)
    return b0, b1, 1.0 - b0 - b1


def _sample_cosine_hemisphere(u0, u1):
    """Concentric-disk cosine hemisphere (utils/sampling.py)."""
    ox = 2.0 * u0 - 1.0
    oy = 2.0 * u1 - 1.0
    zero = (ox == 0.0) & (oy == 0.0)
    cond = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(cond, ox, oy)
    theta = jnp.where(cond, (_PI / 4.0) * _safe_div(oy, ox),
                      (_PI / 2.0) - (_PI / 4.0) * _safe_div(ox, oy))
    r = jnp.where(zero, 0.0, r)
    dx = r * jnp.cos(theta)
    dy = r * jnp.sin(theta)
    z = jnp.sqrt(jnp.maximum(1.0 - dx * dx - dy * dy, 0.0))
    return dx, dy, z


def _sigmoid_poly(c0, c1, c2, lam4):
    """RGBSigmoidPolynomial (utils/color.py eval_rgb_sigmoid_polynomial)."""
    out = []
    for lam in lam4:
        x = (c0 * lam + c1) * lam + c2
        s = 0.5 + x / (2.0 * jnp.sqrt(1.0 + x * x))
        s = jnp.where(jnp.isinf(x), jnp.where(x > 0, 1.0, 0.0), s)
        out.append(s)
    return out


# per-triangle attr row layout (f32): p0(3) p1(3) p2(3) mat(1) light(1)
ATTR_COLS = 11
# per-light misc row layout: va(3) vb(3) vc(3) scale pmf two_sided
# q alias pmf_self pmf_alias  = 16
LIGHT_COLS = 16


def _select_tri_attrs(attr_ref, kf, n_real):
    """Per-lane attribute select over the (small) triangle pool.

    kf: (R, 128) f32 pool index from the intersect tournament (-1 = miss).
    Returns verts as 3 component-tuples + (mat, light) f32."""
    vals = [jnp.zeros_like(kf) for _ in range(ATTR_COLS)]
    for t in range(n_real):
        m = kf == np.float32(t)
        base = t * ATTR_COLS
        for j in range(ATTR_COLS):
            vals[j] = jnp.where(m, attr_ref[base + j], vals[j])
    p0 = (vals[0], vals[1], vals[2])
    p1 = (vals[3], vals[4], vals[5])
    p2 = (vals[6], vals[7], vals[8])
    return p0, p1, p2, vals[9], vals[10]


def _select_light(light_ref, lif, n_lights, n_cols, cols):
    """Select columns `cols` of the light table by per-lane light index."""
    vals = [jnp.zeros_like(lif) for _ in cols]
    for t in range(n_lights):
        m = lif == np.float32(t)
        base = t * n_cols
        for j, c in enumerate(cols):
            vals[j] = jnp.where(m, light_ref[base + c], vals[j])
    return vals


def _path_loop(tri_ref, attr_ref, light_ref, mat_ref, o, d, mi, lam4,
               Le_in, *, n_tris, n_real, n_mats, n_lights, max_depth,
               rr_start, seed, B, ls_uniform, uniform_dpdu, ablate=()):
    """One whole path per lane, all depths in-kernel (the shared body of
    _wave_kernel and _wave_kernel_full).

    tri_ref: (T*16,) SMEM flat triangles (pallas_intersect.pad_triangles);
    attr_ref: (T*ATTR_COLS,) SMEM per-tri attrs; light_ref:
    (L*LIGHT_COLS,) SMEM light table; mat_ref: (M*3,) SMEM sigmoid
    coefficients. o/d: ray component tuples; mi: u32 morton|spp index;
    lam4: wavelengths (nm); Le_in: light emission spectrum at lam4.
    Returns the 4-entry spectral radiance list."""
    # compile-time ablations (tools/exp_r5d.py): quantify in-kernel stage
    # costs without a working profiler over the axon tunnel
    zs_1d, zs_2d = _zs_1d, _zs_2d
    if "fake_sampler" in ablate:
        def zs_1d(mi, dim, seed, B):
            h = mi * _U32(0x9E3779B9) ^ _U32(_hash_u32_host(dim, seed))
            return _u32_to_f(h * _U32(0x01000193))

        def zs_2d(mi, dim, seed, B):
            return (zs_1d(mi, dim, seed, B), zs_1d(mi, dim + 1, seed, B))

    shape = o[0].shape
    beta = [jnp.ones(shape, jnp.float32) for _ in range(4)]
    L = [jnp.zeros(shape, jnp.float32) for _ in range(4)]
    active = jnp.ones(shape, jnp.bool_)
    prev_pdf = jnp.ones(shape, jnp.float32)

    for depth in range(max_depth):
        # --- closest hit (watertight-MT tournament over the pool) ---
        if "fake_closest" in ablate:
            t_hit = jnp.full(shape, 1.0, jnp.float32)
            kf = jnp.zeros(shape, jnp.float32)
            b1 = jnp.full(shape, 0.25, jnp.float32)
            b2 = jnp.full(shape, 0.25, jnp.float32)
        else:
            t_hit, kf, b1, b2 = _tri_block_math(
                tri_ref, o[0], o[1], o[2], d[0], d[1], d[2],
                jnp.full(shape, 1e30, jnp.float32), n_tris, n_real,
                any_hit=False)
        hit = (kf >= 0.0) & active
        if "cheap_attrs" in ablate:
            z = jnp.zeros_like(kf)
            p0 = (z, z, z)
            p1 = (z + 1.0, z, z)
            p2 = (z, z + 1.0, z)
            matf, lightf = z, z - 1.0
        else:
            p0, p1, p2, matf, lightf = _select_tri_attrs(attr_ref, kf,
                                                         n_real)
        b0 = 1.0 - b1 - b2
        p = tuple(b0 * p0[c] + b1 * p1[c] + b2 * p2[c] for c in range(3))
        p_err = tuple(_G7 * (jnp.abs(b0 * p0[c]) + jnp.abs(b1 * p1[c])
                             + jnp.abs(b2 * p2[c])) for c in range(3))
        e1v = tuple(p1[c] - p0[c] for c in range(3))
        e2v = tuple(p2[c] - p0[c] for c in range(3))
        ngu = _cross3(e1v, e2v)
        ng, ng_len = _normalize3(ngu)
        area_hit = 0.5 * ng_len
        wo = (-d[0], -d[1], -d[2])

        # --- emitted radiance at emissive-triangle hits + MIS ---
        is_emitter = hit & (lightf >= 0.0)
        li_safe = jnp.maximum(lightf, 0.0)
        esc, epmf, ets = _select_light(light_ref, li_safe, n_lights,
                                       LIGHT_COLS, (9, 10, 11))
        front = _dot3(ng, wo) > 0
        emit_ok = (ets > 0.5) | front
        dist2_e = jnp.maximum(_dot3((p[0] - o[0], p[1] - o[1], p[2] - o[2]),
                                    (p[0] - o[0], p[1] - o[1],
                                     p[2] - o[2])), 1e-12)
        cos_e = jnp.abs(_dot3(ng, (-d[0], -d[1], -d[2])))
        pdf_light = _safe_div(dist2_e, cos_e * area_hit) * epmf
        w_emit = (jnp.ones(shape, jnp.float32) if depth == 0
                  else _power_heuristic(prev_pdf, pdf_light))
        emask = is_emitter & emit_ok
        for c in range(4):
            L[c] = L[c] + jnp.where(emask, beta[c] * Le_in[c] * esc
                                    * w_emit, 0.0)

        active = hit

        # --- shading frame (ns = ng for flat meshes; dpdu per path.py) ---
        ns = ng
        if uniform_dpdu:
            # default-uv meshes: duv02=(-1,-1), duv12=(0,-1) => dpdu = p1-p0
            dpdu = e1v
        else:
            dpdu = e1v  # eligibility guarantees uniform uvs
        t1 = tuple(dpdu[c] - _dot3(dpdu, ns) * ns[c] for c in range(3))
        bad = _dot3(t1, t1) < 1e-12
        t1f, _t2f = _coordinate_system(ns)
        t1 = tuple(jnp.where(bad, t1f[c], t1[c]) for c in range(3))
        t1, _ = _normalize3(t1)
        t2 = _cross3(ns, t1)
        wo_local = (_dot3(wo, t1), _dot3(wo, t2), _dot3(wo, ns))

        # --- material albedo (sigmoid polynomial at lam) ---
        c0 = jnp.zeros(shape, jnp.float32)
        c1 = jnp.zeros(shape, jnp.float32)
        c2 = jnp.zeros(shape, jnp.float32)
        for mth in range(n_mats):
            mm = matf == np.float32(mth)
            c0 = jnp.where(mm, mat_ref[mth * 3 + 0], c0)
            c1 = jnp.where(mm, mat_ref[mth * 3 + 1], c1)
            c2 = jnp.where(mm, mat_ref[mth * 3 + 2], c2)
        albedo = _sigmoid_poly(c0, c1, c2, lam4)

        base = _CAM_DIMS + depth * _DIMS_PER_BOUNCE

        # --- NEE (path.py nee(); reference SampleLd) ---
        u_pick = zs_1d(mi, base, seed, B)
        ul0, ul1 = zs_2d(mi, base + 1, seed, B)
        if ls_uniform:
            li = jnp.clip((u_pick * n_lights).astype(jnp.int32), 0,
                          n_lights - 1).astype(jnp.float32)
            pmf = jnp.full(shape, np.float32(1.0 / n_lights))
        else:
            up = u_pick * np.float32(n_lights)
            i0 = jnp.clip(up.astype(jnp.int32), 0,
                          n_lights - 1).astype(jnp.float32)
            frac = up - i0
            q, alias, pmf_s, pmf_a = _select_light(
                light_ref, i0, n_lights, LIGHT_COLS, (12, 13, 14, 15))
            take = frac < q
            li = jnp.where(take, i0, alias)
            pmf = jnp.where(take, pmf_s, pmf_a)
        lv = _select_light(light_ref, li, n_lights, LIGHT_COLS,
                           tuple(range(12)))
        va = (lv[0], lv[1], lv[2])
        vb = (lv[3], lv[4], lv[5])
        vc = (lv[6], lv[7], lv[8])
        lscale, _lpmf, lts = lv[9], lv[10], lv[11]
        sb0, sb1, sb2 = _sample_uniform_triangle(ul0, ul1)
        p_tri = tuple(sb0 * va[c] + sb1 * vb[c] + sb2 * vc[c]
                      for c in range(3))
        ngl_u = _cross3(tuple(vb[c] - va[c] for c in range(3)),
                        tuple(vc[c] - va[c] for c in range(3)))
        ngl, ngl_len = _normalize3(ngl_u)
        area_l = 0.5 * ngl_len
        d_tri = tuple(p_tri[c] - p[c] for c in range(3))
        dist2 = jnp.maximum(_dot3(d_tri, d_tri), 1e-12)
        inv_dist = jax.lax.rsqrt(dist2)
        wi = tuple(d_tri[c] * inv_dist for c in range(3))
        cos_l = -_dot3(ngl, wi)
        l_emit_ok = (lts > 0.5) | (cos_l > 0)
        pdf_l = _safe_div(dist2, jnp.abs(cos_l) * area_l) * pmf
        wi_local = (_dot3(wi, t1), _dot3(wi, t2), _dot3(wi, ns))
        same = wo_local[2] * wi_local[2] > 0
        awi = jnp.abs(wi_local[2])
        f = [jnp.where(same, albedo[c] * _INV_PI * awi, 0.0)
             for c in range(4)]
        pdf_b = jnp.where(same, awi * _INV_PI, 0.0)
        Le_l = [jnp.where(l_emit_ok, Le_in[c] * lscale, 0.0)
                for c in range(4)]
        any_L = (Le_l[0] > 0) | (Le_l[1] > 0) | (Le_l[2] > 0) | (Le_l[3] > 0)
        any_f = (f[0] > 0) | (f[1] > 0) | (f[2] > 0) | (f[3] > 0)
        ls_valid = (pdf_l > 0) & any_L
        contrib_ok = active & ls_valid & any_f
        o_sh = _offset_origin(p, p_err, ng, wi)
        dist_sh = jnp.sqrt(jnp.maximum(
            _dot3((p_tri[0] - o_sh[0], p_tri[1] - o_sh[1],
                   p_tri[2] - o_sh[2]),
                  (p_tri[0] - o_sh[0], p_tri[1] - o_sh[1],
                   p_tri[2] - o_sh[2])), 0.0))
        if "no_shadow" in ablate:
            occluded = jnp.zeros(shape, jnp.bool_)
        else:
            _t, k_sh, _b1, _b2 = _tri_block_math(
                tri_ref, o_sh[0], o_sh[1], o_sh[2], wi[0], wi[1], wi[2],
                dist_sh * 0.999, n_tris, n_real, any_hit=True)
            occluded = k_sh >= 0.0
        contrib_ok = contrib_ok & ~occluded
        w_mis = _power_heuristic(pdf_l, pdf_b)
        inv_pl = _safe_div(w_mis, pdf_l)
        for c in range(4):
            L[c] = L[c] + jnp.where(contrib_ok,
                                    beta[c] * f[c] * Le_l[c] * inv_pl, 0.0)

        # --- BSDF sample (diffuse cosine lobe) ---
        ub0, ub1 = zs_2d(mi, base + 4, seed, B)
        wx, wy, wz = _sample_cosine_hemisphere(ub0, ub1)
        wz = jnp.where(wo_local[2] < 0, -wz, wz)
        same_b = wo_local[2] * wz > 0
        acb = jnp.abs(wz)
        pdf_s = jnp.where(same_b, acb * _INV_PI, 0.0)
        thr = _safe_div(acb, pdf_s) * _INV_PI
        beta_new = [beta[c] * jnp.where(same_b, albedo[c] * thr, 0.0)
                    for c in range(4)]
        any_beta = (beta_new[0] > 0) | (beta_new[1] > 0) | \
            (beta_new[2] > 0) | (beta_new[3] > 0)
        active = active & (pdf_s > 0) & any_beta
        beta = [jnp.where(active, beta_new[c], beta[c]) for c in range(4)]
        prev_pdf = pdf_s
        wi_w = tuple(wx * t1[c] + wy * t2[c] + wz * ns[c] for c in range(3))

        # --- Russian roulette on beta (path.py; integrators.cpp:749) ---
        if depth >= rr_start and depth + 1 < max_depth:
            u_rr = zs_1d(mi, base + 6, seed, B)
            bmax = jnp.maximum(jnp.maximum(beta[0], beta[1]),
                               jnp.maximum(beta[2], beta[3]))
            q = jnp.maximum(0.0, 1.0 - bmax)
            do_rr = bmax < 1.0
            killed = do_rr & (u_rr < q)
            active = active & ~killed
            scale_rr = 1.0 / jnp.maximum(1.0 - q, 1e-6)
            keep = do_rr & ~killed
            beta = [jnp.where(keep, beta[c] * scale_rr, beta[c])
                    for c in range(4)]

        if depth + 1 < max_depth:
            o = _offset_origin(p, p_err, ng, wi_w)
            d = wi_w

    return L


def _wave_kernel(tri_ref, attr_ref, light_ref, mat_ref,
                 ox, oy, oz, dx, dy, dz, mi_ref,
                 l0, l1, l2, l3, e0, e1, e2, e3,
                 L0, L1, L2, L3, **statics):
    """Kernel with XLA-built camera rays (see _path_loop for the body)."""
    o = (ox[...], oy[...], oz[...])
    d = (dx[...], dy[...], dz[...])
    mi = jax.lax.bitcast_convert_type(mi_ref[...], jnp.uint32)
    lam4 = (l0[...], l1[...], l2[...], l3[...])
    Le_in = (e0[...], e1[...], e2[...], e3[...])
    L = _path_loop(tri_ref, attr_ref, light_ref, mat_ref, o, d, mi, lam4,
                   Le_in, **statics)
    L0[...] = L[0]
    L1[...] = L[1]
    L2[...] = L[2]
    L3[...] = L[3]


def _compact_bits_2(v):
    """Inverse of utils.rng.left_shift_2: gather the even bits of v."""
    v = v & _U32(0x55555555)
    v = (v | (v >> np.uint32(1))) & _U32(0x33333333)
    v = (v | (v >> np.uint32(2))) & _U32(0x0F0F0F0F)
    v = (v | (v >> np.uint32(4))) & _U32(0x00FF00FF)
    v = (v | (v >> np.uint32(8))) & _U32(0x0000FFFF)
    return v


def _wave_kernel_full(cam_ref, tri_ref, attr_ref, light_ref, mat_ref,
                      mi_ref, l0, l1, l2, l3, e0, e1, e2, e3,
                      L0, L1, L2, L3, FW, *, log2_spp, fparams, ablate=(),
                      **statics):
    """Full-pipeline kernel: pixel decode + ZSobol camera dims + gaussian
    filter importance sample + PINHOLE perspective ray — all in-kernel
    (megakernel v2; reference wavefront GenerateCameraRays role,
    wavefront/camera.cpp:15). The XLA front-end shrinks to wavelength
    sampling + light-spectrum eval; per-lane kernel input drops from
    60 B to 36 B and the front-end fusions disappear.

    cam_ref: (19,) SMEM scalars [c2w m00..m23 (12) | screen smin0 smin1
    smax0 smax1 | tan_half_fov | W | H]. fparams: static (sigma, rx, ry) of the
    gaussian filter. Matches the XLA path bit-for-bit: same _zs draws,
    same Giles erf-inv polynomial (utils/math.erf_inv), same camera math
    (cameras.py generate_ray)."""
    import math as _math
    mi = jax.lax.bitcast_convert_type(mi_ref[...], jnp.uint32)
    lam4 = (l0[...], l1[...], l2[...], l3[...])
    Le_in = (e0[...], e1[...], e2[...], e3[...])
    seed, B = statics["seed"], statics["B"]

    # pixel coords from the morton|spp lane index
    pm = mi >> np.uint32(log2_spp)
    pxf = _compact_bits_2(pm).astype(jnp.int32).astype(jnp.float32)
    pyf = _compact_bits_2(pm >> np.uint32(1)).astype(jnp.int32) \
        .astype(jnp.float32)

    # gaussian filter importance sample (filters.py sample(); weight
    # f(p)/pdf(p) with the SAME truncated-inverse-CDF construction)
    u0, u1 = _zs_2d(mi, 0, seed, B)
    sigma, rx, ry = fparams
    s2 = np.float32(sigma * _math.sqrt(2.0))
    inv_2s2 = np.float32(1.0 / (2.0 * sigma * sigma))
    norm = np.float32(1.0 / (sigma * _math.sqrt(2.0 * _math.pi)))

    def samp_axis(uu, r):
        z = np.float32(_math.erf(r / float(s2)))
        x = s2 * _math_mod.erf_inv(
            jnp.clip((2.0 * uu - 1.0) * z, -0.999999, 0.999999))
        x = jnp.clip(x, -r, r)
        pdf = jnp.exp(-x * x * inv_2s2) * norm / z
        return x, pdf

    fx, pdf_x = samp_axis(u0, np.float32(rx))
    fy, pdf_y = samp_axis(u1, np.float32(ry))
    gx = jnp.maximum(0.0, jnp.exp(-fx * fx * inv_2s2)
                     - np.float32(_math.exp(-rx * rx / (2 * sigma ** 2))))
    gy = jnp.maximum(0.0, jnp.exp(-fy * fy * inv_2s2)
                     - np.float32(_math.exp(-ry * ry / (2 * sigma ** 2))))
    fw = (gx * gy) / jnp.maximum(pdf_x * pdf_y, 1e-12)

    # pinhole perspective ray (cameras.py generate_ray)
    W = cam_ref[17]
    H = cam_ref[18]
    sx = cam_ref[12] + ((pxf + 0.5 + fx) / W) * (cam_ref[14] - cam_ref[12])
    sy = cam_ref[15] - ((pyf + 0.5 + fy) / H) * (cam_ref[15] - cam_ref[13])
    thf = cam_ref[16]
    dc = (sx * thf, sy * thf)
    dwx = cam_ref[0] * dc[0] + cam_ref[1] * dc[1] + cam_ref[2]
    dwy = cam_ref[4] * dc[0] + cam_ref[5] * dc[1] + cam_ref[6]
    dwz = cam_ref[8] * dc[0] + cam_ref[9] * dc[1] + cam_ref[10]
    (dwx, dwy, dwz), _len = _normalize3((dwx, dwy, dwz))
    shape = dwx.shape
    o = (jnp.full(shape, cam_ref[3]), jnp.full(shape, cam_ref[7]),
         jnp.full(shape, cam_ref[11]))
    d = (dwx, dwy, dwz)

    L = _path_loop(tri_ref, attr_ref, light_ref, mat_ref, o, d, mi, lam4,
                   Le_in, ablate=ablate, **statics)
    L0[...] = L[0]
    L1[...] = L[1]
    L2[...] = L[2]
    L3[...] = L[3]
    FW[...] = fw


@functools.partial(
    jax.jit, static_argnames=("n_tris", "n_real", "n_mats", "n_lights",
                              "max_depth", "rr_start", "seed", "B",
                              "ls_uniform", "interpret", "ablate", "rows"))
def _run(tri_flat, attr_flat, light_flat, mat_flat,
         ox, oy, oz, dx, dy, dz, mi, l4, e4,
         n_tris, n_real, n_mats, n_lights, max_depth, rr_start, seed, B,
         ls_uniform, interpret=False, ablate=(), rows=BLOCK_ROWS):
    nb = ox.shape[0] // rows
    ray_spec = pl.BlockSpec((rows, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((rows, LANES), lambda i, *_: (i, 0),
                              memory_space=pltpu.VMEM)] * 4
    out_shape = [jax.ShapeDtypeStruct(ox.shape, jnp.float32)] * 4
    kern = functools.partial(
        _wave_kernel, n_tris=n_tris, n_real=n_real, n_mats=n_mats,
        n_lights=n_lights, max_depth=max_depth, rr_start=rr_start,
        seed=seed, B=B, ls_uniform=ls_uniform, uniform_dpdu=True,
        ablate=ablate)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb,),
        in_specs=[ray_spec] * 15,
        out_specs=out_specs,
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
    )(tri_flat, attr_flat, light_flat, mat_flat,
      ox, oy, oz, dx, dy, dz, mi,
      l4[:, :, 0], l4[:, :, 1], l4[:, :, 2], l4[:, :, 3],
      e4[:, :, 0], e4[:, :, 1], e4[:, :, 2], e4[:, :, 3])


def scene_tables(scene):
    """Build the SMEM side tables (traced jnp ops; tiny).

    attr: (T*ATTR_COLS,) [p0 p1 p2 mat light] in pool order;
    light: (L*LIGHT_COLS,) [va vb vc scale pmf two_sided q alias pmf_s
    pmf_a]; mat: (M*3,) sigmoid albedo coefficients."""
    ta = scene.tri_all
    attr = jnp.concatenate([ta[:, 0:9], ta[:, 25:27]], axis=1)
    lp = scene.lights.packed  # (L, 24)
    ls = scene.light_sampler
    n_lights = int(lp.shape[0])
    if ls.kind == 1 and ls.rows is not None:  # LS_POWER alias rows
        al = ls.rows[:, 0:4]
    else:
        al = jnp.tile(jnp.asarray([[1.0, 0.0, 1.0 / max(n_lights, 1),
                                    1.0 / max(n_lights, 1)]], jnp.float32),
                      (n_lights, 1))
    light = jnp.concatenate([
        lp[:, 15:24],                      # va vb vc
        lp[:, 8:9],                        # scale
        lp[:, 14:15],                      # pmf
        lp[:, 10:11],                      # two_sided
        al], axis=1)
    mat = scene.materials.packed[:, 1:4]
    return attr.reshape(-1), light.reshape(-1), mat.reshape(-1)


def trace(scene, sampler, px, py, sample_index, o, d, lam,
          max_depth=5, rr_start=1, interpret=None, ablate=(), rows=None):
    """Megakernel path trace. Returns L (N, 4) spectral radiance (matching
    integrators/path.py::trace_paths for eligible scenes)."""
    from ..utils import rng as prng
    from .. import lights as lgt

    N = o.shape[0]
    morton = prng.encode_morton_2(px.astype(_U32), py.astype(_U32))
    mi = (morton << np.uint32(sampler.log2_spp)) | \
        jnp.asarray(sample_index).astype(_U32)
    B = min(2 * sampler.n_base4_digits - (sampler.log2_spp & 1), 32)

    # per-lane emission spectrum of the (single) light spectrum at lam
    meta = scene.mega
    spec_idx = jnp.full((N,), meta.light_spec, jnp.int32)
    Le = lgt.eval_light_spectrum(scene.spectra_pool, spec_idx,
                                 jnp.ones((N,), jnp.float32), lam)

    # rows: lanes-per-block (hides dependent-chain latency; the kernel is
    # latency-bound — tools/exp_r5d.py). Padded wave size must tile by it.
    rows = BLOCK_ROWS if rows is None else int(rows)
    blk = rows * LANES
    n_pad = -(-N // blk) * blk
    tot_rows = n_pad // LANES

    def prep(v, fill, dtype=jnp.float32):
        v = jnp.asarray(v, dtype)
        if n_pad != N:
            v = jnp.concatenate([v, jnp.full((n_pad - N,) + v.shape[1:],
                                             fill, dtype)])
        return v.reshape((tot_rows, LANES) + v.shape[1:])

    ox, oy, oz = (prep(o[:, c], 0.0) for c in range(3))
    dx, dy, dz = (prep(d[:, c], 1.0) for c in range(3))
    mi_i = prep(jax.lax.bitcast_convert_type(mi, jnp.int32), 0, jnp.int32)
    l4 = prep(lam, 550.0)
    e4 = prep(Le, 0.0)

    attr, light, mat = scene_tables(scene)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_pool = int(scene.tri_pallas.shape[0]) // 16
    outs = _run(scene.tri_pallas, attr, light, mat,
                ox, oy, oz, dx, dy, dz, mi_i, l4, e4,
                n_pool, meta.n_tris, meta.n_mats, meta.n_lights,
                int(max_depth), int(rr_start), int(sampler.seed), int(B),
                bool(meta.ls_uniform), interpret=bool(interpret),
                ablate=tuple(ablate), rows=rows)
    L = jnp.stack([outs[c].reshape(-1)[:N] for c in range(4)], axis=-1)
    return L


def eligible(scene, sampler, opts) -> bool:
    """Static megakernel eligibility (checked per compile)."""
    from .. import samplers as smp
    meta = getattr(scene, "mega", None)
    if meta is None:
        return False
    if sampler.kind != smp.SAMPLER_ZSOBOL:
        return False
    if getattr(opts, "collect_stats", False):
        return False
    return True


@functools.partial(
    jax.jit, static_argnames=("n_tris", "n_real", "n_mats", "n_lights",
                              "max_depth", "rr_start", "seed", "B",
                              "ls_uniform", "log2_spp", "fparams",
                              "interpret", "ablate", "rows"))
def _run_full(cam, tri_flat, attr_flat, light_flat, mat_flat,
              mi, l4, e4,
              n_tris, n_real, n_mats, n_lights, max_depth, rr_start, seed,
              B, ls_uniform, log2_spp, fparams, interpret=False, ablate=(),
              rows=BLOCK_ROWS):
    nb = mi.shape[0] // rows
    ray_spec = pl.BlockSpec((rows, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((rows, LANES), lambda i, *_: (i, 0),
                              memory_space=pltpu.VMEM)] * 5
    out_shape = [jax.ShapeDtypeStruct(mi.shape, jnp.float32)] * 5
    kern = functools.partial(
        _wave_kernel_full, n_tris=n_tris, n_real=n_real, n_mats=n_mats,
        n_lights=n_lights, max_depth=max_depth, rr_start=rr_start,
        seed=seed, B=B, ls_uniform=ls_uniform, uniform_dpdu=True,
        log2_spp=log2_spp, fparams=fparams, ablate=ablate)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nb,),
        in_specs=[ray_spec] * 9,
        out_specs=out_specs,
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
    )(cam, tri_flat, attr_flat, light_flat, mat_flat,
      mi,
      l4[:, :, 0], l4[:, :, 1], l4[:, :, 2], l4[:, :, 3],
      e4[:, :, 0], e4[:, :, 1], e4[:, :, 2], e4[:, :, 3])


def trace_full(scene, sampler, camera, filt, px, py, sample_index, lam,
               max_depth=5, rr_start=1, interpret=None, ablate=(),
               rows=None):
    """Full-pipeline megakernel (v2): camera dims + gaussian filter +
    pinhole ray generation run IN-KERNEL (reference wavefront
    GenerateCameraRays, wavefront/camera.cpp:15). Returns (L (N, 4),
    filter_weight (N,)). Gate with eligible_full()."""
    from ..utils import rng as prng
    from .. import lights as lgt
    from .. import filters as flt

    N = px.shape[0]
    morton = prng.encode_morton_2(px.astype(_U32), py.astype(_U32))
    mi = (morton << np.uint32(sampler.log2_spp)) | \
        jnp.asarray(sample_index).astype(_U32)
    B = min(2 * sampler.n_base4_digits - (sampler.log2_spp & 1), 32)

    meta = scene.mega
    spec_idx = jnp.full((N,), meta.light_spec, jnp.int32)
    Le = lgt.eval_light_spectrum(scene.spectra_pool, spec_idx,
                                 jnp.ones((N,), jnp.float32), lam)

    rows = BLOCK_ROWS if rows is None else int(rows)
    blk = rows * LANES
    n_pad = -(-N // blk) * blk
    tot_rows = n_pad // LANES

    def prep(v, fill, dtype=jnp.float32):
        v = jnp.asarray(v, dtype)
        if n_pad != N:
            v = jnp.concatenate([v, jnp.full((n_pad - N,) + v.shape[1:],
                                             fill, dtype)])
        return v.reshape((tot_rows, LANES) + v.shape[1:])

    mi_i = prep(jax.lax.bitcast_convert_type(mi, jnp.int32), 0, jnp.int32)
    l4 = prep(lam, 550.0)
    e4 = prep(Le, 0.0)

    # cam layout: [m00..m23 (12) | smin0 smin1 smax0 smax1 | thf | W H]
    m = jnp.asarray(camera.c2w_m, jnp.float32)
    smin = jnp.asarray(camera.screen_min, jnp.float32)
    smax = jnp.asarray(camera.screen_max, jnp.float32)
    cam = jnp.concatenate([
        m[:3].reshape(-1),
        jnp.stack([smin[0], smin[1], smax[0], smax[1],
                   jnp.reshape(jnp.asarray(camera.tan_half_fov,
                                           jnp.float32), ()),
                   jnp.asarray(camera.width, jnp.float32),
                   jnp.asarray(camera.height, jnp.float32)])])

    attr, light, mat = scene_tables(scene)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_pool = int(scene.tri_pallas.shape[0]) // 16
    fparams = (float(filt.sigma), float(filt.radius[0]),
               float(filt.radius[1]))
    outs = _run_full(cam, scene.tri_pallas, attr, light, mat,
                     mi_i, l4, e4,
                     n_pool, meta.n_tris, meta.n_mats, meta.n_lights,
                     int(max_depth), int(rr_start), int(sampler.seed),
                     int(B), bool(meta.ls_uniform),
                     int(sampler.log2_spp), fparams,
                     interpret=bool(interpret), ablate=tuple(ablate),
                     rows=rows)
    L = jnp.stack([outs[c].reshape(-1)[:N] for c in range(4)], axis=-1)
    fw = outs[4].reshape(-1)[:N]
    return L, fw


def eligible_full(scene, sampler, camera, filt, opts) -> bool:
    """v2 (in-kernel camera) eligibility: megakernel scene + pinhole
    perspective camera + gaussian filter + jitter not disabled + the
    morton|spp index fits 32 bits (it must round-trip to pixel coords
    in-kernel)."""
    from .. import cameras as cam_mod
    from .. import filters as flt
    from ..options import get_options
    if not eligible(scene, sampler, opts):
        return False
    if camera.kind != cam_mod.CAMERA_PERSPECTIVE or camera.has_lens:
        return False
    if filt.kind != flt.FILTER_GAUSSIAN:
        return False
    gopts = get_options()
    if gopts.disable_pixel_jitter or gopts.disable_wavelength_jitter:
        return False
    import math
    side_bits = max(1, math.ceil(math.log2(max(camera.width,
                                               camera.height))))
    return 2 * side_bits + sampler.log2_spp <= 32
