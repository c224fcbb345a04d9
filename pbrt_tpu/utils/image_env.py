"""Environment-map reparameterization (reference cmd/imgtool.cpp makeequiarea:
lat-long equirectangular -> equal-area octahedral square)."""
from __future__ import annotations

import numpy as np

from . import vecmath as vm


def equalarea_from_latlong(img: np.ndarray, res: int = None) -> np.ndarray:
    """img: (H, W, 3) equirect (theta maps to rows, phi to cols).
    Returns (res, res, 3) equal-area octahedral image."""
    import jax.numpy as jnp
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    if res is None:
        res = max(16, int(2 ** np.round(np.log2(max(h, 1)))))
    u, v = np.meshgrid((np.arange(res) + 0.5) / res,
                       (np.arange(res) + 0.5) / res, indexing="xy")
    uv = jnp.asarray(np.stack([u, v], -1).reshape(-1, 2), jnp.float32)
    d = np.asarray(vm.equal_area_square_to_sphere(uv))
    theta = np.arccos(np.clip(d[:, 2], -1, 1))
    phi = np.arctan2(d[:, 1], d[:, 0])
    phi = np.where(phi < 0, phi + 2 * np.pi, phi)
    x = phi / (2 * np.pi) * w - 0.5
    y = theta / np.pi * h - 0.5
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    xs0 = np.mod(x0, w)
    xs1 = np.mod(x0 + 1, w)
    ys0 = np.clip(y0, 0, h - 1)
    ys1 = np.clip(y0 + 1, 0, h - 1)
    out = (img[ys0, xs0] * (1 - fx) * (1 - fy) + img[ys0, xs1] * fx * (1 - fy) +
           img[ys1, xs0] * (1 - fx) * fy + img[ys1, xs1] * fx * fy)
    return out.reshape(res, res, 3).astype(np.float32)


def latlong_from_equalarea(img: np.ndarray, width: int = None) -> np.ndarray:
    """Inverse resampling (for round-trips/inspection)."""
    import jax.numpy as jnp
    img = np.asarray(img, np.float32)
    res = img.shape[0]
    if width is None:
        width = 2 * res
    h = width // 2
    theta = (np.arange(h) + 0.5) / h * np.pi
    phi = (np.arange(width) + 0.5) / width * 2 * np.pi
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    d = np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp),
                  np.cos(tt)], -1)
    uv = np.asarray(vm.equal_area_sphere_to_square(
        jnp.asarray(d.reshape(-1, 3), jnp.float32)))
    x = np.clip((uv[:, 0] * res).astype(np.int64), 0, res - 1)
    y = np.clip((uv[:, 1] * res).astype(np.int64), 0, res - 1)
    return img[y, x].reshape(h, width, 3)
