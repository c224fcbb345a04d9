"""Material pool (reference materials.{h,cpp}; closed world base/material.h:22).

Round-1 material set: Diffuse, Conductor, Dielectric, ThinDielectric,
DiffuseTransmission — each bound to constant or (later) image textures.
Materials are compiled into an SoA pool; `get_bsdf` evaluates textures at the
hit and returns per-lane BSDFParams for the bxdfs module (the analogue of
the reference's Material::GetBxDF texture-evaluator dispatch,
surfscatter.cpp:39).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from . import bxdfs
from .utils import color as pcolor
from .utils import spectrum as spc


@struct.dataclass
class MaterialPool:
    """Packed material rows: one gather per shading lookup (TPU gathers are
    ~1ms flat; see ops/gather.py).

    packed columns: [bits(tag), albedo_coeffs(3), trans_coeffs(3), ur, vr,
                     eta_const, bits(eta_spec_idx), bits(k_spec_idx),
                     bits(albedo_tex), remap] = 14
    """
    packed: jnp.ndarray         # (M, 14) f32
    has_spectral_eta: bool = struct.field(pytree_node=False, default=False)
    has_textures: bool = struct.field(pytree_node=False, default=False)


class MaterialBuilder:
    """Host-side accumulation of materials into pool arrays."""

    def __init__(self, colorspace=None):
        self.cs = colorspace or pcolor.srgb()
        self.rows = []

    def _add(self, **kw):
        row = dict(bxdf_tag=bxdfs.BXDF_DIFFUSE,
                   albedo_coeffs=np.zeros(3, np.float32),
                   trans_coeffs=np.zeros(3, np.float32),
                   uroughness=0.0, vroughness=0.0, eta_const=1.5,
                   eta_spec_idx=-1, k_spec_idx=-1, albedo_tex=-1,
                   remap_roughness=True)
        row.update(kw)
        self.rows.append(row)
        return len(self.rows) - 1

    def add_diffuse(self, reflectance=(0.5, 0.5, 0.5), albedo_tex=-1):
        return self._add(bxdf_tag=bxdfs.BXDF_DIFFUSE,
                         albedo_coeffs=self.cs.to_spectrum_coeffs(np.asarray(reflectance)),
                         albedo_tex=albedo_tex)

    def add_conductor(self, eta_spec_idx=-1, k_spec_idx=-1, roughness=0.0,
                      uroughness=None, vroughness=None, remap=True,
                      reflectance=None):
        return self._add(bxdf_tag=bxdfs.BXDF_CONDUCTOR,
                         eta_spec_idx=eta_spec_idx, k_spec_idx=k_spec_idx,
                         uroughness=roughness if uroughness is None else uroughness,
                         vroughness=roughness if vroughness is None else vroughness,
                         remap_roughness=remap,
                         albedo_coeffs=(self.cs.to_spectrum_coeffs(np.asarray(reflectance))
                                        if reflectance is not None else np.zeros(3, np.float32)))

    def add_dielectric(self, eta=1.5, roughness=0.0, uroughness=None,
                       vroughness=None, remap=True, thin=False,
                       eta_spec_idx=-1):
        """eta_spec_idx: spectrum-pool row of a dispersive IOR curve
        (e.g. glass-BK7); enables hero-wavelength dispersion."""
        return self._add(
            bxdf_tag=bxdfs.BXDF_THIN_DIELECTRIC if thin else bxdfs.BXDF_DIELECTRIC,
            eta_const=eta, eta_spec_idx=eta_spec_idx,
            uroughness=roughness if uroughness is None else uroughness,
            vroughness=roughness if vroughness is None else vroughness,
            remap_roughness=remap)

    def add_coated_diffuse(self, reflectance=(0.5,) * 3, roughness=0.1,
                           eta=1.5, remap=True):
        """Fresnel-blend coat over a diffuse base (reference CoatedDiffuse
        approximated; see bxdfs._coated_diffuse_f_pdf)."""
        return self._add(bxdf_tag=bxdfs.BXDF_COATED_DIFFUSE,
                         albedo_coeffs=self.cs.to_spectrum_coeffs(np.asarray(reflectance)),
                         uroughness=roughness, vroughness=roughness,
                         eta_const=eta, remap_roughness=remap)

    def add_diffuse_transmission(self, reflectance=(0.25,) * 3,
                                 transmittance=(0.25,) * 3):
        return self._add(bxdf_tag=bxdfs.BXDF_DIFFUSE_TRANSMISSION,
                         albedo_coeffs=self.cs.to_spectrum_coeffs(np.asarray(reflectance)),
                         trans_coeffs=self.cs.to_spectrum_coeffs(np.asarray(transmittance)))

    def build(self) -> MaterialPool:
        if not self.rows:
            self.add_diffuse()

        def col(k, dtype=np.float32):
            return np.stack([np.asarray(r[k]) for r in self.rows]).astype(dtype)

        packed = np.concatenate([
            col("bxdf_tag", np.float32)[:, None],         # value-encoded ints
            col("albedo_coeffs").reshape(-1, 3),
            col("trans_coeffs").reshape(-1, 3),
            col("uroughness")[:, None], col("vroughness")[:, None],
            col("eta_const")[:, None],
            col("eta_spec_idx", np.float32)[:, None],
            col("k_spec_idx", np.float32)[:, None],
            col("albedo_tex", np.float32)[:, None],
            col("remap_roughness", np.float32)[:, None]], axis=1)
        return MaterialPool(
            packed=jnp.asarray(packed),
            has_spectral_eta=bool((col("eta_spec_idx", np.int32) >= 0).any() or
                                  (col("k_spec_idx", np.int32) >= 0).any()),
            has_textures=bool((col("albedo_tex", np.int32) >= 0).any()))


# Default conductor (Cu) dense spectra indices are resolved at scene compile.

def get_bsdf_params(pool: MaterialPool, mat_idx, lam, spectra_pool,
                    textures=None, uv=None, p_world=None) -> bxdfs.BSDFParams:
    """Evaluate material textures at the hit -> per-lane BSDFParams.

    mat_idx: (N,) int32; lam: (N, 4). textures: optional TexturePool;
    uv: (N, 2) hit uv for texture evaluation (used where albedo_tex >= 0).

    One packed-row lookup + (only if the scene has spectral eta/k) one fused
    spectrum-pool gather each for eta and k + (only if textured) one texture
    evaluation (coeffs baked at compile; see textures.py).
    """
    from .ops.gather import pool_lookup, f32_to_i32
    rows = pool_lookup(pool.packed, mat_idx)
    tag = f32_to_i32(rows[..., 0])
    coeffs = rows[..., 1:4]
    albedo = pcolor.eval_rgb_sigmoid_polynomial(coeffs, lam)
    if textures is not None and pool.has_textures and uv is not None:
        from . import textures as tex_mod
        tex_idx = f32_to_i32(rows[..., 12])
        tc, tscale = tex_mod.eval_texture(textures, tex_idx, uv, p_world)
        tex_albedo = pcolor.eval_rgb_sigmoid_polynomial(tc, lam) * tscale[..., None]
        albedo = jnp.where((tex_idx >= 0)[..., None], tex_albedo, albedo)
    trans = pcolor.eval_rgb_sigmoid_polynomial(rows[..., 4:7], lam)
    ur = rows[..., 7]
    vr = rows[..., 8]
    remap = rows[..., 13] > 0.5
    ax = jnp.where(remap, bxdfs.roughness_to_alpha(ur), ur)
    ay = jnp.where(remap, bxdfs.roughness_to_alpha(vr), vr)
    eta_const = rows[..., 9]
    ones = jnp.ones_like(lam)
    if pool.has_spectral_eta:
        from .lights import eval_light_spectrum
        eidx = f32_to_i32(rows[..., 10])
        kidx = f32_to_i32(rows[..., 11])
        one = jnp.ones_like(ur)
        eta_dense = eval_light_spectrum(spectra_pool, jnp.maximum(eidx, 0), one, lam)
        k_dense = eval_light_spectrum(spectra_pool, jnp.maximum(kidx, 0), one, lam)
        eta = jnp.where((eidx >= 0)[..., None], eta_dense, eta_const[..., None] * ones)
        k = jnp.where((kidx >= 0)[..., None], k_dense, ones)
    else:
        eta = eta_const[..., None] * ones
        k = ones
    # diffuse-transmission stores transmittance in the k slot (see bxdfs)
    k = jnp.where((tag == bxdfs.BXDF_DIFFUSE_TRANSMISSION)[..., None], trans, k)
    return bxdfs.BSDFParams(tag=tag, albedo=albedo, alpha_x=ax, alpha_y=ay,
                            eta=eta, k=k)
