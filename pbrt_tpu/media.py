"""Participating media (reference media.{h,cpp}: HomogeneousMedium:217,
GridMedium:265, RGBGridMedium:355, DDAMajorantIterator:136, SampleT_maj:725).

TPU design: media live in a descriptor pool + one flat density-grid array.
Free-flight sampling is delta tracking by DDA over ONE scene-level majorant
super-grid that covers the union of all medium boxes; each cell stores a
SPECTRALLY-CONSTANT scalar majorant (>= max over lambda, media, and space of
sigma_t in the cell). A spectrally-constant majorant makes every T_maj factor
cancel out of the reference's rescaled-probability ratios (beta, r_u, r_l —
integrators.cpp:957-1050), so the flight loop tracks only event ratios: no
exponentials, no spectral majorant bookkeeping, branch-free lanes. The single
scene grid also handles any number of disjoint/overlapping medium boxes in
one DDA sweep (gaps between media are zero-majorant cells the DDA skips at
grid speed) — the reference instead chains per-medium iterators
(MajorantGrid media.h:105, DDAMajorantIterator media.h:136).

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
# [21]=density_scale [22]=Le_scale [23]=sigma_t_peak (spectral peak, no dens)
MED_COLS = 24


@struct.dataclass
class MediumPool:
    desc: jnp.ndarray   # (M, MED_COLS)
    grid: jnp.ndarray   # (G,) flat density pool
    # scene-level majorant super-grid (scalar sigma majorants per cell)
    maj_grid: jnp.ndarray = None    # (mz*my*mx,)
    maj_lo: jnp.ndarray = None      # (3,)
    maj_hi: jnp.ndarray = None      # (3,)
    maj_res: tuple = struct.field(pytree_node=False, default=(1, 1, 1))
    max_majorant: float = struct.field(pytree_node=False, default=0.0)


class MediumBuilder:
    def __init__(self, colorspace=None):
        self.cs = colorspace or pcolor.srgb()
        self.rows = []
        self.grid = [np.zeros(1, np.float32)]
        self.grid_size = 1
        self._densities = {}  # medium index -> (nz, ny, nx) density array

    def _sigma_coeffs(self, rgb, scale):
        rgb = np.asarray(rgb, np.float64) * scale
        m = max(float(np.max(rgb)), 1e-9)
        s = 2.0 * m if m > 1.0 else 1.0
        c = self.cs.to_spectrum_coeffs(np.clip(rgb / s, 0, 1))
        c = np.asarray(c, np.float32)
        # The majorant must bound the FITTED spectrum, not the RGB values:
        # the sigmoid fit can exceed max(rgb) at the spectrum edges for
        # saturated colors (reference uses SampledSpectrum majorants).
        peak = float(pcolor.sigmoid_poly_max_value(jnp.asarray(c))) * float(s)
        return c, np.float32(s), peak

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
        row[10] = max_a + max_s  # scalar majorant (fitted-spectrum peaks)
        row[15:18] = np.asarray(bounds_lo, np.float32)
        row[18:21] = np.asarray(bounds_hi, np.float32)
        row[21] = 1.0
        row[23] = max_a + max_s  # sigma_t spectral peak (density-free)
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
        row[10] = (max_a + max_s) * dmax
        row[23] = max_a + max_s
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
        self._densities[len(self.rows)] = density
        self.rows.append(row)
        return len(self.rows) - 1

    def build(self, maj_res=None) -> MediumPool:
        if not self.rows:
            row = np.zeros((1, MED_COLS), np.float32)
            one = np.ones(3, np.float32)
            return MediumPool(desc=jnp.asarray(row),
                              grid=jnp.asarray(np.zeros(1, np.float32)),
                              maj_grid=jnp.asarray(np.zeros(1, np.float32)),
                              maj_lo=jnp.asarray(-one), maj_hi=jnp.asarray(one),
                              maj_res=(1, 1, 1), max_majorant=0.0)
        desc = np.stack(self.rows)
        maj, lo, hi, res = self._build_majorant_supergrid(desc, maj_res)
        return MediumPool(desc=jnp.asarray(desc),
                          grid=jnp.asarray(np.concatenate(self.grid)),
                          maj_grid=jnp.asarray(maj.reshape(-1)),
                          maj_lo=jnp.asarray(lo), maj_hi=jnp.asarray(hi),
                          maj_res=res,
                          max_majorant=float(desc[:, 10].max()))

    def _build_majorant_supergrid(self, desc, maj_res=None):
        """Scene-level scalar majorant grid (reference MajorantGrid media.h:105
        generalized to cover all media). Cell value = max over media
        overlapping the cell of sigma_t_peak * (local max density), dilated by
        one density voxel so trilinear filtering support is bounded."""
        lo = desc[:, 15:18].min(axis=0).astype(np.float32)
        hi = desc[:, 18:21].max(axis=0).astype(np.float32)
        ext = np.maximum(hi - lo, 1e-6)
        if maj_res is None:
            n = 64 if self._densities else 8
            # scale per-axis resolution to the domain aspect (min 1)
            longest = float(ext.max())
            res = tuple(max(1, int(round(n * float(e) / longest)))
                        for e in ext)
        else:
            res = tuple(maj_res)
        mx, my, mz = res
        maj = np.zeros((mz, my, mx), np.float32)
        cell = ext / np.asarray([mx, my, mz], np.float32)
        for i, row in enumerate(desc):
            blo, bhi = row[15:18], row[18:21]
            c0 = np.clip(np.floor((blo - lo) / cell).astype(int), 0,
                         [mx - 1, my - 1, mz - 1])
            c1 = np.clip(np.ceil((bhi - lo) / cell).astype(int), 1,
                         [mx, my, mz])
            peak = float(row[23]) * float(row[21])  # sigma_t_peak * dens_scale
            if i not in self._densities:
                maj[c0[2]:c1[2], c0[1]:c1[1], c0[0]:c1[0]] = np.maximum(
                    maj[c0[2]:c1[2], c0[1]:c1[1], c0[0]:c1[0]], peak)
                continue
            dens = self._densities[i]
            # 3^3 max-filter dilation (trilinear support spills +-1 voxel)
            dil = dens
            for ax in range(3):
                pads = [(0, 0)] * 3
                pads[ax] = (1, 1)
                ap = np.pad(dil, pads, mode="edge")
                n_ax = dil.shape[ax]
                out = dil
                for off in (0, 2):
                    s = [slice(None)] * 3
                    s[ax] = slice(off, off + n_ax)
                    out = np.maximum(out, ap[tuple(s)])
                dil = out
            nz, ny, nx = dens.shape
            bext = np.maximum(bhi - blo, 1e-9)
            # Resample the dilated density to a fine grid at least 2x the
            # super-grid resolution inside the box (nearest-voxel, which is
            # max-preserving under upsampling) so that every supercell the
            # box overlaps receives at least one sample — a plain
            # voxel-center scatter would leave zero-majorant holes whenever
            # density voxels are coarser than supercells.
            span = np.maximum(c1 - c0, 1)
            f = [max(n, 2 * int(s)) for n, s in zip((nz, ny, nx),
                                                    (span[2], span[1],
                                                     span[0]))]
            iz = np.minimum((np.arange(f[0]) + 0.5) * nz / f[0], nz - 1).astype(int)
            iy = np.minimum((np.arange(f[1]) + 0.5) * ny / f[1], ny - 1).astype(int)
            ix = np.minimum((np.arange(f[2]) + 0.5) * nx / f[2], nx - 1).astype(int)
            fine = dil[np.ix_(iz, iy, ix)]
            wz = blo[2] + (np.arange(f[0]) + 0.5) / f[0] * bext[2]
            wy = blo[1] + (np.arange(f[1]) + 0.5) / f[1] * bext[1]
            wx = blo[0] + (np.arange(f[2]) + 0.5) / f[2] * bext[0]
            sz = np.clip(((wz - lo[2]) / cell[2]).astype(int), 0, mz - 1)
            sy = np.clip(((wy - lo[1]) / cell[1]).astype(int), 0, my - 1)
            sx = np.clip(((wx - lo[0]) / cell[0]).astype(int), 0, mx - 1)
            flat = ((sz[:, None, None] * my + sy[None, :, None]) * mx +
                    sx[None, None, :])
            np.maximum.at(maj.reshape(-1), flat.reshape(-1),
                          (fine * peak).reshape(-1))
        return maj, lo, hi, res


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
