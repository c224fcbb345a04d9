"""AOV / G-buffer rendering (reference GBufferFilm, film.h:319: P, dzdx,
N, Ns, uv, albedo, variance) — first-hit geometric channels for denoisers
and ML pipelines, plus the SpectralFilm per-bucket accumulation
(reference SpectralFilm, film.h:401)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import scene_core as sc
from .. import cameras as cam_mod
from .. import samplers as smp
from .. import materials as mtl
from ..utils import spectrum as spc
from ..utils import color as pcolor


@functools.partial(jax.jit, static_argnames=())
def _aov_wave(scene, camera, pixel_idx, sample_index, sampler):
    px = pixel_idx % camera.width
    py = pixel_idx // camera.width
    u_pix = smp.sample_pixel_2d(sampler, px, py, sample_index, 0)
    u_lens = smp.sample_2d(sampler, px, py, sample_index, 3)
    u_time = smp.sample_1d(sampler, px, py, sample_index, 2)
    p_film = jnp.stack([px.astype(jnp.float32) + u_pix[..., 0],
                        py.astype(jnp.float32) + u_pix[..., 1]], -1)
    o, d, _ = cam_mod.generate_ray(camera, p_film, u_lens, u_time)
    isect = sc.intersect(scene, o, d, jnp.full(o.shape[:1], 1e30, jnp.float32))
    # first-hit albedo at hero wavelengths ~ RGB estimate via 3 fixed lambdas
    lam = jnp.broadcast_to(jnp.asarray([602.0, 539.0, 445.0, 500.0]),
                           (o.shape[0], 4))
    bp = mtl.get_bsdf_params(scene.materials, isect["mat"], lam,
                             scene.spectra_pool, textures=scene.textures,
                             uv=isect["uv"], p_world=isect["p"])
    hit = isect["hit"]
    z = jnp.where(hit, isect["t"], 0.0)
    return dict(p=jnp.where(hit[:, None], isect["p"], 0.0),
                n=jnp.where(hit[:, None], isect["ng"], 0.0),
                ns=jnp.where(hit[:, None], isect["ns"], 0.0),
                uv=jnp.where(hit[:, None], isect["uv"], 0.0),
                z=z,
                albedo=jnp.where(hit[:, None], bp.albedo[:, :3], 0.0),
                hit=hit)


def render_aovs(scene: sc.Scene, camera: cam_mod.Camera, spp=4):
    """Returns dict of (H, W, C) numpy AOV images: P, N, Ns, uv, z, albedo."""
    W, H = camera.width, camera.height
    sampler = smp.make_sampler("zsobol", spp=spp, full_resolution=(W, H))
    acc = None
    pix = jnp.arange(W * H, dtype=jnp.int32)
    for s in range(spp):
        out = _aov_wave(scene, camera, pix, jnp.full((W * H,), s, jnp.int32),
                        sampler)
        out = {k: np.asarray(v, np.float64) for k, v in out.items()}
        acc = out if acc is None else {k: acc[k] + out[k] for k in out}
    inv = 1.0 / spp
    return {k: (v * inv).reshape(H, W, -1).astype(np.float32).squeeze()
            for k, v in acc.items()}


# ---------------------------------------------------------------------------
# Spectral film: bucketed per-wavelength accumulation (reference SpectralFilm)

def spectral_film_buckets(n_buckets=16, lam_min=spc.LAMBDA_MIN,
                          lam_max=spc.LAMBDA_MAX):
    edges = np.linspace(lam_min, lam_max, n_buckets + 1)
    return edges


def add_spectral_samples(buckets_sum, buckets_w, pixel_idx, L, swl, n_buckets):
    """Accumulate radiance into wavelength buckets. buckets_sum: (HW, B)."""
    lam = swl.lam
    w = spc.safe_div_spectrum(L, swl.pdf)
    b = jnp.clip(((lam - spc.LAMBDA_MIN) /
                  (spc.LAMBDA_MAX - spc.LAMBDA_MIN) * n_buckets).astype(jnp.int32),
                 0, n_buckets - 1)
    for k in range(4):  # one scatter per wavelength sample
        buckets_sum = buckets_sum.at[pixel_idx, b[:, k]].add(w[:, k])
        buckets_w = buckets_w.at[pixel_idx, b[:, k]].add(1.0)
    return buckets_sum, buckets_w


def render_spectral(scene: sc.Scene, camera: cam_mod.Camera, spp=16,
                    n_buckets=16, max_depth=5):
    """Full spectral render into wavelength buckets (reference SpectralFilm,
    film.h:401). Returns (buckets (H, W, B) mean radiance, edges (B+1,))."""
    from . import path as path_mod
    from .. import filters as flt
    W, H = camera.width, camera.height
    sampler = smp.make_sampler("zsobol", spp=spp, full_resolution=(W, H))
    filt = flt.make_filter("box")
    edges = spectral_film_buckets(n_buckets)
    hw = W * H
    bsum = jnp.zeros((hw, n_buckets), jnp.float32)
    bw = jnp.zeros((hw, n_buckets), jnp.float32)
    pix = jnp.arange(hw, dtype=jnp.int32)
    opts = path_mod.PathOptions(max_depth=max_depth)

    @jax.jit
    def wave(bsum, bw, s):
        L, swl, _ = path_mod.render_wave(scene, camera, sampler, filt, pix,
                                         jnp.full((hw,), s, jnp.int32),
                                         opts)
        return add_spectral_samples(bsum, bw, pix, L, swl, n_buckets)

    for s in range(spp):
        bsum, bw = wave(bsum, bw, jnp.int32(s))
    out = np.asarray(bsum) / np.maximum(np.asarray(bw), 1.0)
    return out.reshape(H, W, n_buckets), edges


def write_spectral_exr(path, buckets, edges):
    """EXR with one channel per wavelength bucket, named like the
    reference's SpectralFilm output (S.<lo>-<hi>nm)."""
    from ..utils import image as pimg
    chans = {}
    for i in range(buckets.shape[-1]):
        chans[f"S.{edges[i]:.0f}-{edges[i + 1]:.0f}nm"] = buckets[..., i]
    pimg.write_exr_channels(path, chans)


def write_gbuffer_exr(path, aovs, variance=None, rel_variance=None):
    """Multi-channel G-buffer EXR (reference GBufferFilm::WriteImage):
    P.{X,Y,Z}, N/Ns.{X,Y,Z}, u, v, z, Albedo.{R,G,B} [+ Variance]."""
    from ..utils import image as pimg
    ch = {}
    for i, ax in enumerate("XYZ"):
        ch[f"P.{ax}"] = aovs["p"][..., i]
        ch[f"N.{ax}"] = aovs["n"][..., i]
        ch[f"Ns.{ax}"] = aovs["ns"][..., i]
    ch["u"] = aovs["uv"][..., 0]
    ch["v"] = aovs["uv"][..., 1]
    ch["z"] = aovs["z"]
    for i, c in enumerate("RGB"):
        ch[f"Albedo.{c}"] = aovs["albedo"][..., i]
    if variance is not None:
        ch["Variance"] = variance
    if rel_variance is not None:
        ch["RelativeVariance"] = rel_variance
    pimg.write_exr_channels(path, ch)
