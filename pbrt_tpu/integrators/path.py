"""Wavefront-style path integrator with NEE + MIS (reference
cpu/integrators.cpp PathIntegrator:628 / wavefront render loop,
wavefront/integrator.cpp).

TPU mapping of the wavefront architecture (SURVEY.md §2.6): instead of
atomic-compaction work queues, all rays of a wave stay in fixed SoA arrays
with an active-lane mask; each `fori_loop` iteration is one wavefront depth
(the reference's GenerateRaySamples -> IntersectClosest -> shade -> shadow
pipeline fused into one XLA program). Dimension indexing follows the
reference's pre-drawn per-bounce sampler dimensions (samples.cpp:19).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import scene_core as sc
from .. import samplers as smp
from .. import bxdfs
from .. import materials as mtl
from .. import lights as lgt
from .. import lightsamplers as lsamp
from .. import cameras as cam_mod
from .. import filters as flt
from ..utils import vecmath as vm
from ..utils import spectrum as spc
from ..utils.math import power_heuristic, safe_div

# sampler dimension layout (camera: 0-4, lambda: 5, then 7 dims per bounce)
_CAM_DIMS = 6
_DIMS_PER_BOUNCE = 7


@struct.dataclass
class PathOptions:
    max_depth: int = struct.field(pytree_node=False, default=5)
    rr_start_depth: int = struct.field(pytree_node=False, default=1)
    sample_visible_wavelengths: bool = struct.field(pytree_node=False, default=True)


def _to_local(ns, t1, t2, w):
    return jnp.stack([vm.dot(w, t1), vm.dot(w, t2), vm.dot(w, ns)], axis=-1)


def _to_world(ns, t1, t2, w):
    return w[..., 0:1] * t1 + w[..., 1:2] * t2 + w[..., 2:3] * ns


# ---------------------------------------------------------------------------
# Volumetrics: delta-tracking free flights + ratio-tracked transmittance
# (reference SampleT_maj media.h:725, VolPathIntegrator integrators.cpp:953,
# TraceTransmittance wavefront/intersect.h:165). Media participate within
# their world-space boxes (SURVEY: GridMedium bounds); flights run as a
# bounded lax.while_loop with all lanes masked.

_MAX_FLIGHT_EVENTS = 256
FL_FLYING, FL_REACH, FL_SCATTER, FL_ABSORB = 0, 1, 2, 3


def _medium_overlap(scene, o, d, t_max):
    """First medium box the ray segment [0, t_max] overlaps (static unroll
    over the medium pool; media are assumed non-overlapping).
    Returns (med_idx (N,), t0 (N,), t1 (N,))."""
    N = o.shape[0]
    M = scene.media.desc.shape[0]
    best_idx = jnp.full((N,), -1, jnp.int32)
    best_t0 = jnp.full((N,), jnp.inf, jnp.float32)
    best_t1 = jnp.zeros((N,), jnp.float32)
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-20, d)
    for m in range(M):
        row = scene.media.desc[m]
        # (a dummy/empty medium has lo == hi == 0 -> never overlaps)
        lo, hi = row[15:18], row[18:21]
        ta = (lo - o) * inv_d
        tb = (hi - o) * inv_d
        t_near = jnp.max(jnp.minimum(ta, tb), axis=-1)
        t_far = jnp.min(jnp.maximum(ta, tb), axis=-1)
        t0 = jnp.maximum(t_near, 0.0)
        t1 = jnp.minimum(t_far, t_max)
        valid = t1 > t0
        pick = valid & (t0 < best_t0)
        best_idx = jnp.where(pick, m, best_idx)
        best_t0 = jnp.where(pick, t0, best_t0)
        best_t1 = jnp.where(pick, t1, best_t1)
    return best_idx, jnp.where(best_idx >= 0, best_t0, 0.0), best_t1


def _flight(scene, o, d, med_idx, t0, t1, lam, seed, active):
    """Delta-tracking free flight through [t0, t1] of medium med_idx.
    Returns dict(status, t_event, weight (N,4) spectral event-ratio weight,
    g (N,) HG asymmetry at event)."""
    from .. import media as med_mod
    from ..utils import rng as prng
    N = o.shape[0]
    row = med_mod.medium_row(scene.media, med_idx)
    sigma_bar = med_mod.majorant(row)
    in_med = active & (med_idx >= 0) & (t1 > t0) & (sigma_bar > 0)
    status0 = jnp.where(in_med, FL_FLYING, FL_REACH)

    def cond(state):
        status, t, w, it = state
        return jnp.any(status == FL_FLYING) & (it < _MAX_FLIGHT_EVENTS)

    def body(state):
        status, t, w, it = state
        flying = status == FL_FLYING
        u1 = prng.uniform_float(seed, jnp.uint32(it), jnp.uint32(0x51a7))
        u2 = prng.uniform_float(seed, jnp.uint32(it), jnp.uint32(0x9bd3))
        dt = -jnp.log1p(-u1) / jnp.maximum(sigma_bar, 1e-9)
        t_new = t + dt
        reach = t_new >= t1
        p_ev = o + d * t_new[..., None]
        sa, ss = med_mod.sigma_at(scene.media, row, p_ev, lam)
        sa_h = sa[..., 0]
        ss_h = ss[..., 0]
        pa = sa_h / sigma_bar
        ps = ss_h / sigma_bar
        absorb = u2 < pa
        scat = ~absorb & (u2 < pa + ps)
        sn = jnp.maximum(sigma_bar[..., None] - sa - ss, 0.0)
        w_null = sn / jnp.maximum(sn[..., 0:1], 1e-9)
        w_scat = ss / jnp.maximum(ss[..., 0:1], 1e-9)
        act = flying & ~reach
        status = jnp.where(flying & reach, FL_REACH, status)
        status = jnp.where(act & absorb, FL_ABSORB,
                 jnp.where(act & scat, FL_SCATTER, status))
        w = jnp.where((act & scat)[..., None], w * w_scat,
            jnp.where((act & ~absorb & ~scat)[..., None], w * w_null, w))
        t = jnp.where(flying, t_new, t)
        return (status, t, w, it + 1)

    state = (status0, jnp.asarray(t0, jnp.float32) + jnp.zeros((N,)),
             jnp.ones((N, 4), jnp.float32), jnp.asarray(0, jnp.int32))
    status, t, w, _ = jax.lax.while_loop(cond, body, state)
    return dict(status=status, t=t, weight=w, g=med_mod.hg_g(row))


def _transmittance(scene, o, d, dist, lam, seed, active):
    """Ratio-tracked spectral transmittance along a shadow ray (N,4)."""
    from .. import media as med_mod
    from ..utils import rng as prng
    N = o.shape[0]
    med_idx, t0, t1 = _medium_overlap(scene, o, d, dist)
    row = med_mod.medium_row(scene.media, med_idx)
    sigma_bar = med_mod.majorant(row)
    in_med = active & (med_idx >= 0) & (t1 > t0) & (sigma_bar > 0)

    def cond(state):
        flying, t, T, it = state
        return jnp.any(flying) & (it < _MAX_FLIGHT_EVENTS)

    def body(state):
        flying, t, T, it = state
        u1 = prng.uniform_float(seed, jnp.uint32(it), jnp.uint32(0x7b55))
        dt = -jnp.log1p(-u1) / jnp.maximum(sigma_bar, 1e-9)
        t_new = t + dt
        done = t_new >= t1
        p_ev = o + d * t_new[..., None]
        sa, ss = med_mod.sigma_at(scene.media, row, p_ev, lam)
        sn_ratio = jnp.maximum(sigma_bar[..., None] - sa - ss, 0.0) / \
            jnp.maximum(sigma_bar[..., None], 1e-9)
        T = jnp.where((flying & ~done)[..., None], T * sn_ratio, T)
        t = jnp.where(flying, t_new, t)
        flying = flying & ~done & jnp.any(T > 1e-5, axis=-1)
        return (flying, t, T, it + 1)

    state = (in_med, jnp.asarray(t0, jnp.float32) + jnp.zeros((N,)),
             jnp.ones((N, 4), jnp.float32), jnp.asarray(0, jnp.int32))
    _, _, T, _ = jax.lax.while_loop(cond, body, state)
    return T


def trace_paths(scene: sc.Scene, sampler: smp.SamplerParams, px, py,
                sample_index, o, d, swl: spc.SampledWavelengths,
                opts: PathOptions):
    """Trace one wave of paths. px/py: (N,) pixel ints; o, d: (N, 3) camera
    rays. Returns L (N, 4) spectral radiance estimates (pdf NOT divided out —
    the film's sensor projection divides by swl.pdf)."""
    N = o.shape[0]
    lam = swl.lam

    def nee(p, ns, ng, t1, t2, wo_local, bp, active, depth,
            scattered=None, wo_world=None, g_hg=None, seed=None):
        """Next-event estimation (reference SampleLd, integrators.cpp:764).
        `scattered` lanes shade a medium interaction (phase function) at p."""
        from ..utils import sampling as usamp
        base = _CAM_DIMS + depth * _DIMS_PER_BOUNCE
        u_pick = smp.sample_1d(sampler, px, py, sample_index, base)
        u_l = smp.sample_2d(sampler, px, py, sample_index, base + 1)
        li_idx, pmf, u_pick2 = lsamp.sample_light(scene.light_sampler, u_pick,
                                                   p=p)
        li_idx = jnp.maximum(li_idx, 0)
        ls = lgt.sample_li(scene.lights, li_idx, p, ns, u_l, lam,
                           scene.spectra_pool, scene.tri_geo,
                           scene.scene_radius, env=scene.env)
        wi = ls["wi"]
        wi_local = _to_local(ns, t1, t2, wi)
        f = bxdfs.bsdf_f(bp, wo_local, wi_local) * \
            jnp.abs(wi_local[..., 2])[..., None]
        pdf_b = bxdfs.bsdf_pdf(bp, wo_local, wi_local)
        if scattered is not None:
            ph = usamp.henyey_greenstein(vm.dot(wo_world, wi), g_hg)
            f = jnp.where(scattered[..., None], ph[..., None], f)
            pdf_b = jnp.where(scattered, ph, pdf_b)
        pdf_l = ls["pdf"] * pmf
        contrib_ok = active & ls["valid"] & (pdf_l > 0) & jnp.any(f > 0, axis=-1)
        # shadow ray (medium lanes: no normal offset needed)
        o_sh = sc.offset_ray_origin(p, ng, wi)
        if scattered is not None:
            o_sh = jnp.where(scattered[..., None], p + 1e-5 * wi, o_sh)
        dist = vm.length(ls["p_light"] - o_sh)
        occluded = sc.intersect_p(scene, o_sh, wi, dist * 0.999)
        contrib_ok = contrib_ok & ~occluded
        w_mis = jnp.where(ls["is_delta"], 1.0,
                          power_heuristic(1.0, pdf_l, 1.0, pdf_b))
        Ld = f * ls["L"] * safe_div(w_mis, pdf_l)[..., None]
        if scene.has_media:
            T_sh = _transmittance(scene, o_sh, wi, dist, lam, seed, contrib_ok)
            Ld = Ld * T_sh
        return jnp.where(contrib_ok[..., None], Ld, 0.0)

    def body(depth, state):
        (o, d, beta, L, active, spec_bounce, prev_pdf, eta_scale) = state
        isect = sc.intersect(scene, o, d, jnp.full((N,), 1e30, jnp.float32))

        # --- participating media: delta-tracked free flight ---
        if scene.has_media:
            from ..utils import rng as prng
            seed_fl = prng.hash_u32(px.astype(jnp.uint32), py.astype(jnp.uint32),
                                    sample_index.astype(jnp.uint32),
                                    jnp.asarray(depth, jnp.uint32),
                                    np.uint32(0x6d3a))
            med_idx, tm0, tm1 = _medium_overlap(scene, o, d, isect["t"])
            fl = _flight(scene, o, d, med_idx, tm0, tm1, lam, seed_fl, active)
            scattered = active & (fl["status"] == FL_SCATTER)
            absorbed = active & (fl["status"] == FL_ABSORB)
            reach = fl["status"] == FL_REACH
            beta = beta * fl["weight"]
            p_med = o + d * fl["t"][..., None]
        else:
            scattered = jnp.zeros((N,), bool)
            absorbed = scattered
            reach = jnp.ones((N,), bool)
            fl = None
            p_med = o
            seed_fl = None
        hit = isect["hit"] & active & reach

        # --- emitted radiance at hits of emissive triangles ---
        if scene.has_area_lights:
            light_idx = isect["light"]
            is_emitter = hit & (light_idx >= 0)
            li_safe = jnp.maximum(light_idx, 0)
            from ..ops.gather import pool_lookup
            lrow = lgt.LightRow(pool_lookup(scene.lights.packed, li_safe))
            Le = lgt.area_light_radiance(lrow, isect["ng"], isect["wo"], lam,
                                         scene.spectra_pool)
            # the hit triangle IS the light's triangle: reuse intersect's verts
            tri_rows = jnp.concatenate([isect["p0"], isect["p1"], isect["p2"]],
                                       axis=-1)
            if scene.light_sampler.kind == lsamp.LS_BVH:
                pick_pmf = lsamp.light_pmf(scene.light_sampler,
                                           light_idx=li_safe, p=o)
            else:
                pick_pmf = lrow.pmf
            pdf_light = lgt.pdf_li_area_tri(lrow, o, d, isect["p"], tri_rows)
            if scene.n_spheres > 0:
                pdf_light = jnp.where(lrow.tag == lgt.LIGHT_AREA_SPHERE,
                                      lgt.pdf_li_sphere(lrow, o), pdf_light)
            pdf_light = pdf_light * pick_pmf
            w_emit = jnp.where((depth == 0) | spec_bounce, 1.0,
                               power_heuristic(1.0, prev_pdf, 1.0, pdf_light))
            L = L + jnp.where(is_emitter[..., None],
                              beta * Le * w_emit[..., None], 0.0)

        # --- escaped rays: image infinite light (env map) ---
        if scene.env is not None:
            escaped = active & reach & ~isect["hit"]
            Le_env = lgt.env_radiance(scene.env, d, lam)
            pmf_env = scene.light_sampler.pmf_table[scene.env.light_index]
            pdf_env = lgt.env_pdf_li(scene.env, d) * pmf_env
            w_env = jnp.where((depth == 0) | spec_bounce, 1.0,
                              power_heuristic(1.0, prev_pdf, 1.0, pdf_env))
            L = L + jnp.where(escaped[..., None],
                              beta * Le_env * w_env[..., None], 0.0)

        # --- escaped rays: uniform infinite lights ---
        if scene.n_infinite > 0:
            escaped = active & reach & ~isect["hit"]
            Le_inf = lgt.infinite_light_radiance(scene.lights, lam,
                                                 scene.spectra_pool, d,
                                                 scene.inf_indices)
            # MIS vs uniform-sphere light sampling (static index: no gather)
            inf_idx = scene.inf_indices[0]
            pmf_inf = scene.light_sampler.pmf_table[int(inf_idx)]
            pdf_inf = pmf_inf * (1.0 / (4.0 * np.pi))
            w_inf = jnp.where((depth == 0) | spec_bounce, 1.0,
                              power_heuristic(1.0, prev_pdf, 1.0, pdf_inf))
            L = L + jnp.where(escaped[..., None], beta * Le_inf * w_inf[..., None], 0.0)

        active = hit | scattered
        # --- shading frame (shading normal + tangents) ---
        ns = isect["ns"]
        ng = isect["ng"]
        t1, t2 = vm.coordinate_system(ns)
        wo_local = _to_local(ns, t1, t2, isect["wo"])
        # lanes where wo is below the shading surface: treat as inactive
        # (reference handles via shading-normal adjustments)
        bp = mtl.get_bsdf_params(scene.materials, isect["mat"], lam,
                                 scene.spectra_pool, textures=scene.textures,
                                 uv=isect["uv"], p_world=isect["p"])

        # --- NEE (surface lanes: BSDF; medium lanes: phase function) ---
        if scene.light_sampler.n_lights > 0:
            p_shade = jnp.where(scattered[..., None], p_med, isect["p"]) \
                if scene.has_media else isect["p"]
            Ld = nee(p_shade, ns, ng, t1, t2, wo_local, bp, active, depth,
                     scattered=scattered if scene.has_media else None,
                     wo_world=-d, g_hg=fl["g"] if fl is not None else None,
                     seed=seed_fl)
            L = L + beta * Ld

        # --- BSDF sampling for the next bounce ---
        base = _CAM_DIMS + depth * _DIMS_PER_BOUNCE
        uc = smp.sample_1d(sampler, px, py, sample_index, base + 3)
        u2 = smp.sample_2d(sampler, px, py, sample_index, base + 4)
        bs = bxdfs.bsdf_sample(bp, wo_local, uc, u2)
        wi_world = _to_world(ns, t1, t2, bs["wi"])
        cos_factor = jnp.abs(bs["wi"][..., 2])
        throughput = bs["f"] * safe_div(cos_factor, bs["pdf"])[..., None]
        sel_pdf = bs["pdf"]
        sel_valid = bs["valid"]
        sel_spec = bs["specular"]
        if scene.has_media:
            from ..utils import sampling as usamp
            wi_hg, pdf_hg = usamp.sample_henyey_greenstein(u2, fl["g"], -d)
            wi_world = jnp.where(scattered[..., None], wi_hg, wi_world)
            # HG importance sampling is exact: phase/pdf == 1
            throughput = jnp.where(scattered[..., None], 1.0, throughput)
            sel_pdf = jnp.where(scattered, pdf_hg, sel_pdf)
            sel_valid = jnp.where(scattered, pdf_hg > 0, sel_valid)
            sel_spec = jnp.where(scattered, False, sel_spec)
        beta_new = beta * throughput
        # dispersion: terminate secondary wavelengths, hero carries 4x weight
        # (reference SampledWavelengths::TerminateSecondary semantics folded
        # into beta; the film divides by the original per-lambda pdfs)
        term = jnp.asarray([4.0, 0.0, 0.0, 0.0], jnp.float32)
        beta_new = jnp.where(bs["dispersed"][..., None], beta_new * term,
                             beta_new)
        active = active & sel_valid & jnp.any(beta_new > 0, axis=-1)
        beta = jnp.where(active[..., None], beta_new, beta)
        eta_scale = eta_scale * jnp.where(scattered, 1.0, bs["eta_scale"])

        # --- Russian roulette on beta * eta_scale (integrators.cpp:749) ---
        rr_beta_max = jnp.max(beta, axis=-1) * eta_scale
        u_rr = smp.sample_1d(sampler, px, py, sample_index, base + 6)
        q = jnp.maximum(0.0, 1.0 - rr_beta_max)
        do_rr = (depth >= opts.rr_start_depth) & (rr_beta_max < 1.0)
        killed = do_rr & (u_rr < q)
        active = active & ~killed
        beta = jnp.where((do_rr & ~killed)[..., None],
                         beta / jnp.maximum(1.0 - q, 1e-6)[..., None], beta)

        o_next = sc.offset_ray_origin(isect["p"], ng, wi_world)
        if scene.has_media:
            o_next = jnp.where(scattered[..., None],
                               p_med + 1e-5 * wi_world, o_next)
        return (o_next, wi_world, beta, L,
                active, sel_spec, sel_pdf, eta_scale)

    state = (o, d,
             jnp.ones((N, 4), jnp.float32),       # beta
             jnp.zeros((N, 4), jnp.float32),      # L
             jnp.ones((N,), bool),                # active
             jnp.zeros((N,), bool),               # specular bounce
             jnp.ones((N,), jnp.float32),         # prev bsdf pdf
             jnp.ones((N,), jnp.float32))         # eta_scale
    state = jax.lax.fori_loop(0, opts.max_depth, body, state)
    return state[3]


def render_wave(scene: sc.Scene, camera: cam_mod.Camera,
                sampler: smp.SamplerParams, filt: flt.Filter,
                pixel_idx, sample_index, opts: PathOptions):
    """One sample-per-pixel wave over a batch of pixels.

    pixel_idx: (N,) flat pixel ids; sample_index: (N,) per-pixel sample no.
    Returns (rgb-ready spectral L (N, 4), swl, filter_weight (N,)).
    """
    px = pixel_idx % camera.width
    py = pixel_idx // camera.width
    u_pix = smp.sample_pixel_2d(sampler, px, py, sample_index, 0)
    u_time = smp.sample_1d(sampler, px, py, sample_index, 2)
    u_lens = smp.sample_2d(sampler, px, py, sample_index, 3)
    u_lam = smp.sample_1d(sampler, px, py, sample_index, 5)
    if opts.sample_visible_wavelengths:
        swl = spc.sample_visible_wavelengths(u_lam)
    else:
        swl = spc.sample_uniform_wavelengths(u_lam)
    f_off, f_weight = flt.sample(filt, u_pix)
    p_film = jnp.stack([px.astype(jnp.float32) + 0.5 + f_off[..., 0],
                        py.astype(jnp.float32) + 0.5 + f_off[..., 1]], axis=-1)
    o, d, _time = cam_mod.generate_ray(camera, p_film, u_lens, u_time)
    L = trace_paths(scene, sampler, px, py, sample_index, o, d, swl, opts)
    return L, swl, f_weight
