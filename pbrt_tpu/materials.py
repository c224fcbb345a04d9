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
    bxdf_tag: jnp.ndarray       # (M,) int32
    albedo_coeffs: jnp.ndarray  # (M, 3) sigmoid-poly coeffs (reflectance)
    trans_coeffs: jnp.ndarray   # (M, 3) transmittance (diffusetransmission)
    uroughness: jnp.ndarray     # (M,)
    vroughness: jnp.ndarray     # (M,)
    eta_const: jnp.ndarray      # (M,) scalar IOR (dielectric)
    eta_spec_idx: jnp.ndarray   # (M,) int32 into spectrum pool, -1 = constant
    k_spec_idx: jnp.ndarray     # (M,) int32, -1 = none
    albedo_tex: jnp.ndarray     # (M,) int32 texture id, -1 = constant
    remap_roughness: jnp.ndarray  # (M,) bool


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
                       vroughness=None, remap=True, thin=False):
        return self._add(
            bxdf_tag=bxdfs.BXDF_THIN_DIELECTRIC if thin else bxdfs.BXDF_DIELECTRIC,
            eta_const=eta,
            uroughness=roughness if uroughness is None else uroughness,
            vroughness=roughness if vroughness is None else vroughness,
            remap_roughness=remap)

    def add_diffuse_transmission(self, reflectance=(0.25,) * 3,
                                 transmittance=(0.25,) * 3):
        return self._add(bxdf_tag=bxdfs.BXDF_DIFFUSE_TRANSMISSION,
                         albedo_coeffs=self.cs.to_spectrum_coeffs(np.asarray(reflectance)),
                         trans_coeffs=self.cs.to_spectrum_coeffs(np.asarray(transmittance)))

    def build(self) -> MaterialPool:
        if not self.rows:
            self.add_diffuse()
        def col(k, dtype=np.float32):
            return jnp.asarray(np.stack([np.asarray(r[k]) for r in self.rows]).astype(dtype))
        return MaterialPool(
            bxdf_tag=col("bxdf_tag", np.int32),
            albedo_coeffs=col("albedo_coeffs"),
            trans_coeffs=col("trans_coeffs"),
            uroughness=col("uroughness"), vroughness=col("vroughness"),
            eta_const=col("eta_const"),
            eta_spec_idx=col("eta_spec_idx", np.int32),
            k_spec_idx=col("k_spec_idx", np.int32),
            albedo_tex=col("albedo_tex", np.int32),
            remap_roughness=col("remap_roughness", bool))


# Default conductor (Cu) dense spectra indices are resolved at scene compile.

def get_bsdf_params(pool: MaterialPool, mat_idx, lam, spectra_pool,
                    albedo_override=None) -> bxdfs.BSDFParams:
    """Evaluate material textures at the hit -> per-lane BSDFParams.

    mat_idx: (N,) int32; lam: (N, 4). albedo_override: optional (N, 4) from
    image-texture evaluation (applied where albedo_tex >= 0).
    """
    tag = pool.bxdf_tag[mat_idx]
    coeffs = pool.albedo_coeffs[mat_idx]
    albedo = pcolor.eval_rgb_sigmoid_polynomial(coeffs, lam)
    if albedo_override is not None:
        has_tex = pool.albedo_tex[mat_idx] >= 0
        albedo = jnp.where(has_tex[..., None], albedo_override, albedo)
    trans = pcolor.eval_rgb_sigmoid_polynomial(pool.trans_coeffs[mat_idx], lam)
    ur = pool.uroughness[mat_idx]
    vr = pool.vroughness[mat_idx]
    remap = pool.remap_roughness[mat_idx]
    ax = jnp.where(remap, bxdfs.roughness_to_alpha(ur), ur)
    ay = jnp.where(remap, bxdfs.roughness_to_alpha(vr), vr)
    # eta/k: spectral where a named spectrum is set, else constant
    from .lights import eval_light_spectrum
    eidx = pool.eta_spec_idx[mat_idx]
    kidx = pool.k_spec_idx[mat_idx]
    ones = jnp.ones_like(lam)
    eta_dense = eval_light_spectrum(spectra_pool, jnp.maximum(eidx, 0),
                                    jnp.ones_like(ur), lam)
    k_dense = eval_light_spectrum(spectra_pool, jnp.maximum(kidx, 0),
                                  jnp.ones_like(ur), lam)
    eta = jnp.where((eidx >= 0)[..., None], eta_dense,
                    pool.eta_const[mat_idx][..., None] * ones)
    k = jnp.where((kidx >= 0)[..., None], k_dense, ones)
    # diffuse-transmission stores transmittance in the k slot (see bxdfs)
    k = jnp.where((tag == bxdfs.BXDF_DIFFUSE_TRANSMISSION)[..., None], trans, k)
    return bxdfs.BSDFParams(tag=tag, albedo=albedo, alpha_x=ax, alpha_y=ay,
                            eta=eta, k=k)
