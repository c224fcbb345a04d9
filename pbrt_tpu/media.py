"""Participating media (reference media.{h,cpp}: HomogeneousMedium:217,
GridMedium:265, RGBGridMedium:355, DDAMajorantIterator:136, SampleT_maj:725).

TPU design: media live in a descriptor pool + one flat density-grid array.
Free-flight sampling is delta tracking against a SPECTRALLY-CONSTANT scalar
majorant (sigma_bar >= max over lambda and space of sigma_t), which makes the
majorant transmittance cancel and keeps the flight loop branch-free; spectral
weighting happens at events via sigma(lambda)/sigma(hero) ratios with
rescaled-probability bookkeeping in the integrator (the reference's r_u/r_l,
integrators.cpp:957). A per-medium majorant GRID (DDA iteration) is the
planned upgrade for sparse volumes.

Medium boxes are axis-aligned in world space (transformed grids pending).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .ops.gather import pool_lookup, f32_to_i32
from .utils import color as pcolor

MEDIUM_HOMOGENEOUS = 0
MEDIUM_GRID = 1

# descriptor columns:
# [0]=tag [1:4]=sigma_a coeffs [4]=sigma_a scale [5:8]=sigma_s coeffs
# [8]=sigma_s scale [9]=g [10]=sigma_maj (scalar majorant, premultiplied)
# [11]=grid_offset [12]=nx [13]=ny [14]=nz [15:18]=bounds_lo [18:21]=bounds_hi
# [21]=density_scale [22]=Le_scale [23]=pad
MED_COLS = 24


@struct.dataclass
class MediumPool:
    desc: jnp.ndarray   # (M, MED_COLS)
    grid: jnp.ndarray   # (G,) flat density pool
    max_majorant: float = struct.field(pytree_node=False, default=0.0)


class MediumBuilder:
    def __init__(self, colorspace=None):
        self.cs = colorspace or pcolor.srgb()
        self.rows = []
        self.grid = [np.zeros(1, np.float32)]
        self.grid_size = 1

    def _sigma_coeffs(self, rgb, scale):
        rgb = np.asarray(rgb, np.float64) * scale
        m = max(float(np.max(rgb)), 1e-9)
        s = 2.0 * m if m > 1.0 else 1.0
        c = self.cs.to_spectrum_coeffs(np.clip(rgb / s, 0, 1))
        return np.asarray(c, np.float32), np.float32(s), float(np.max(rgb))

    def add_homogeneous(self, sigma_a=(1.0,) * 3, sigma_s=(1.0,) * 3,
                        g=0.0, scale=1.0, bounds_lo=(-1e5,) * 3,
                        bounds_hi=(1e5,) * 3):
        """Media participate within their world-space box (bounds); a 'global'
        fog medium uses a box enclosing the scene."""
        ca, sa, max_a = self._sigma_coeffs(sigma_a, scale)
        cs_, ss, max_s = self._sigma_coeffs(sigma_s, scale)
        row = np.zeros(MED_COLS, np.float32)
        row[0] = MEDIUM_HOMOGENEOUS
        row[1:4] = ca
        row[4] = sa
        row[5:8] = cs_
        row[8] = ss
        row[9] = g
        row[10] = 1.05 * (max_a + max_s)  # scalar majorant with 5% slack
        row[15:18] = np.asarray(bounds_lo, np.float32)
        row[18:21] = np.asarray(bounds_hi, np.float32)
        row[21] = 1.0
        self.rows.append(row)
        return len(self.rows) - 1

    def add_grid(self, density, bounds_lo, bounds_hi, sigma_a=(1.0,) * 3,
                 sigma_s=(1.0,) * 3, g=0.0, scale=1.0, le_scale=0.0):
        """density: (nz, ny, nx) float array."""
        density = np.asarray(density, np.float32)
        nz, ny, nx = density.shape
        ca, sa, max_a = self._sigma_coeffs(sigma_a, scale)
        cs_, ss, max_s = self._sigma_coeffs(sigma_s, scale)
        dmax = float(density.max())
        row = np.zeros(MED_COLS, np.float32)
        row[0] = MEDIUM_GRID
        row[1:4] = ca
        row[4] = sa
        row[5:8] = cs_
        row[8] = ss
        row[9] = g
        row[10] = 1.05 * (max_a + max_s) * dmax
        row[11] = self.grid_size
        row[12] = nx
        row[13] = ny
        row[14] = nz
        row[15:18] = np.asarray(bounds_lo, np.float32)
        row[18:21] = np.asarray(bounds_hi, np.float32)
        row[21] = 1.0
        row[22] = le_scale
        self.grid.append(density.reshape(-1))
        self.grid_size += density.size
        self.rows.append(row)
        return len(self.rows) - 1

    def build(self) -> MediumPool:
        if not self.rows:
            row = np.zeros((1, MED_COLS), np.float32)
            return MediumPool(desc=jnp.asarray(row),
                              grid=jnp.asarray(np.zeros(1, np.float32)),
                              max_majorant=0.0)
        desc = np.stack(self.rows)
        return MediumPool(desc=jnp.asarray(desc),
                          grid=jnp.asarray(np.concatenate(self.grid)),
                          max_majorant=float(desc[:, 10].max()))


def medium_row(pool: MediumPool, med_idx):
    return pool_lookup(pool.desc, jnp.maximum(med_idx, 0))


def density_at(pool: MediumPool, row, p):
    """Trilinear density lookup in the medium's grid; 1.0 for homogeneous.

    row: (N, MED_COLS) gathered descriptor rows; p: (N, 3) world points.
    One fused 8-tap gather."""
    tag = f32_to_i32(row[..., 0])
    lo = row[..., 15:18]
    hi = row[..., 18:21]
    n = row[..., 12:15]  # nx, ny, nz
    g = (p - lo) / jnp.maximum(hi - lo, 1e-9) * n - 0.5
    g0 = jnp.floor(g)
    frac = g - g0

    def clampi(x, nn):
        return jnp.clip(x, 0.0, jnp.maximum(nn - 1.0, 0.0))

    xs = jnp.stack([clampi(g0[..., 0], n[..., 0]),
                    clampi(g0[..., 0] + 1, n[..., 0])], -1)  # (N, 2)
    ys = jnp.stack([clampi(g0[..., 1], n[..., 1]),
                    clampi(g0[..., 1] + 1, n[..., 1])], -1)
    zs = jnp.stack([clampi(g0[..., 2], n[..., 2]),
                    clampi(g0[..., 2] + 1, n[..., 2])], -1)
    base = row[..., 11]
    nx = n[..., 0]
    nxy = n[..., 0] * n[..., 1]
    idx = (base[..., None, None, None] +
           zs[..., :, None, None] * nxy[..., None, None, None] +
           ys[..., None, :, None] * nx[..., None, None, None] +
           xs[..., None, None, :])                     # (N, 2, 2, 2)
    d = pool.grid[f32_to_i32(idx)]                     # ONE gather (N,2,2,2)
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    dx0 = d[..., :, :, 0] * (1 - fx)[..., None, None] + \
        d[..., :, :, 1] * fx[..., None, None]
    dy0 = dx0[..., :, 0] * (1 - fy)[..., None] + dx0[..., :, 1] * fy[..., None]
    dens = dy0[..., 0] * (1 - fz) + dy0[..., 1] * fz
    inside = jnp.all((p >= lo) & (p <= hi), axis=-1)
    dens = jnp.where(inside, dens, 0.0) * row[..., 21]
    return jnp.where(tag == MEDIUM_HOMOGENEOUS, 1.0, dens)


def sigma_at(pool: MediumPool, row, p, lam):
    """(sigma_a (N,4), sigma_s (N,4)) at world point p, wavelengths lam."""
    dens = density_at(pool, row, p)
    sa = pcolor.eval_rgb_sigmoid_polynomial(row[..., 1:4], lam) * \
        row[..., 4:5] * dens[..., None]
    ss = pcolor.eval_rgb_sigmoid_polynomial(row[..., 5:8], lam) * \
        row[..., 8:9] * dens[..., None]
    return sa, ss


def majorant(row):
    """Scalar majorant (N,)."""
    return row[..., 10]


def hg_g(row):
    return row[..., 9]
