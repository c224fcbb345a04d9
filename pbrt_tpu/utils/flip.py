"""ꟻLIP perceptual image-difference metric (reference util/imageutil +
cmd/imgtool.cpp:1101-1180 `--metric flip`; algorithm: Andersson et al. 2020,
"FLIP: A Difference Evaluator for Alternating Images").

Numpy implementation of LDR-FLIP: opponent-space CSF filtering for color
differences + point/edge feature detection, combined per pixel into an
error in [0, 1]. Host-side tool code (not a render-path op), so plain
numpy is the right tool here.
"""
from __future__ import annotations

import numpy as np

# sRGB <-> linear and color-space matrices
_A_XYZ = np.array([[0.41238656, 0.35759149, 0.18045049],
                   [0.21263682, 0.71518298, 0.0721802],
                   [0.01933062, 0.11919716, 0.95037259]])
# D65 white
_WHITE = _A_XYZ @ np.ones(3)

# FLIP constants (Andersson et al. 2020, Table 1)
_QC = 0.7
_QF = 0.5
_PC = 0.4
_PT = 0.95


def _srgb_to_linear(c):
    c = np.clip(c, 0.0, 1.0)
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_ycxcz(rgb):
    xyz = rgb @ _A_XYZ.T
    xyz = xyz / _WHITE
    y = 116.0 * xyz[..., 1] - 16.0
    cx = 500.0 * (xyz[..., 0] - xyz[..., 1])
    cz = 200.0 * (xyz[..., 1] - xyz[..., 2])
    return np.stack([y, cx, cz], -1)


def _gauss_kernel(sigma, extent):
    xs = np.arange(-extent, extent + 1)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    g = np.exp(-(X ** 2 + Y ** 2) / (2.0 * sigma ** 2))
    return g / g.sum()


def _sep_filter(img, k):
    """2D filter by a small kernel via FFT-free direct convolution with
    edge clamping (images are small tool inputs)."""
    from numpy.lib.stride_tricks import sliding_window_view
    e = k.shape[0] // 2
    pad = np.pad(img, ((e, e), (e, e)), mode="edge")
    win = sliding_window_view(pad, k.shape)
    return np.einsum("ijkl,kl->ij", win, k)


def _csf_filters(ppd):
    """Spatial CSF approx as Gaussian blends per channel (the FLIP paper's
    fitted parameters: a1,b1,a2,b2 per channel)."""
    params = {
        "A": (1.0, 0.0047, 0.0, 1e-5),       # achromatic
        "RG": (1.0, 0.0053, 0.0, 1e-5),      # red-green
        "BY": (34.1, 0.04, 13.5, 0.025),     # blue-yellow
    }
    filts = {}
    for name, (a1, b1, a2, b2) in params.items():
        # spatial-domain std dev in pixels: sigma = sqrt(b/2)/ (2 pi) * ppd
        s1 = np.sqrt(b1 / 2.0) / (2.0 * np.pi) * ppd * 2 * np.pi
        s2 = np.sqrt(b2 / 2.0) / (2.0 * np.pi) * ppd * 2 * np.pi
        ext = max(int(np.ceil(3 * max(s1, s2))), 1)
        xs = np.arange(-ext, ext + 1)
        X, Y = np.meshgrid(xs, xs, indexing="ij")
        d2 = X ** 2 + Y ** 2
        g1 = a1 * np.sqrt(np.pi / b1) * np.exp(-np.pi ** 2 * d2 /
                                               ((ppd ** 2) * b1))
        g2 = a2 * np.sqrt(np.pi / b2) * np.exp(-np.pi ** 2 * d2 /
                                               ((ppd ** 2) * b2)) \
            if a2 > 0 else 0.0
        k = g1 + g2
        filts[name] = k / k.sum()
    return filts


def _hunt(y, c):
    return 0.01 * y * c


def _hyab(a, b):
    """HyAB distance in (adjusted) L*a*b*-like space."""
    return np.abs(a[..., 0] - b[..., 0]) + \
        np.sqrt((a[..., 1] - b[..., 1]) ** 2 + (a[..., 2] - b[..., 2]) ** 2)


def _feature_kernels(ppd):
    sigma = 0.5 * 0.082 * ppd
    ext = max(int(np.ceil(3 * sigma)), 1)
    xs = np.arange(-ext, ext + 1).astype(np.float64)
    g = np.exp(-xs ** 2 / (2 * sigma ** 2))
    gd = -xs / (sigma ** 2) * g            # first derivative (edge)
    gdd = (xs ** 2 / sigma ** 4 - 1 / sigma ** 2) * g  # second (point)
    # normalize as in the paper
    g /= g.sum()
    gd /= np.abs(gd).sum() / 2
    gdd_pos = np.maximum(gdd, 0.0)
    gdd /= gdd_pos.sum()
    return g, gd, gdd


def _sep2(img, kx, ky):
    e = len(kx) // 2
    pad = np.pad(img, ((0, 0), (e, e)), mode="edge")
    out = np.zeros_like(img)
    for i, w in enumerate(kx):
        out += w * pad[:, i:i + img.shape[1]]
    e = len(ky) // 2
    pad = np.pad(out, ((e, e), (0, 0)), mode="edge")
    out2 = np.zeros_like(img)
    for i, w in enumerate(ky):
        out2 += w * pad[i:i + img.shape[0], :]
    return out2


def flip(ref_linear, test_linear, ppd=67.0):
    """Per-pixel FLIP error map in [0, 1] + mean.

    ref/test: (H, W, 3) LINEAR RGB (HDR values are tone-clamped to [0,1]
    sRGB display range like imgtool's LDR-FLIP path).
    Returns (error_map (H, W), mean_error)."""
    ref = np.clip(np.asarray(ref_linear, np.float64), 0.0, 1.0)
    test = np.clip(np.asarray(test_linear, np.float64), 0.0, 1.0)
    yref = _linear_to_ycxcz(ref)
    ytst = _linear_to_ycxcz(test)

    filts = _csf_filters(ppd)
    chans = ["A", "RG", "BY"]
    fref = np.stack([_sep_filter(yref[..., i], filts[chans[i]])
                     for i in range(3)], -1)
    ftst = np.stack([_sep_filter(ytst[..., i], filts[chans[i]])
                     for i in range(3)], -1)

    # Hunt adjustment (chroma scaled by luminance)
    def hunt_adj(x):
        y = np.clip(x[..., 0], 0.0, 100.0)
        return np.stack([x[..., 0], _hunt(y, x[..., 1]),
                         _hunt(y, x[..., 2])], -1)

    href = hunt_adj(fref)
    htst = hunt_adj(ftst)
    dcolor = _hyab(href, htst)
    # normalize by the max achievable distance (green-to-blue), remap with
    # the exponent qc
    cmax = _hyab(hunt_adj(_linear_to_ycxcz(np.array([[[0.0, 1.0, 0.0]]]))),
                 hunt_adj(_linear_to_ycxcz(np.array([[[0.0, 0.0, 1.0]]]))))
    cmax = float(cmax[0, 0])
    pccmax = _PC * cmax
    dc = np.where(
        dcolor < pccmax,
        (_PT / pccmax) * dcolor,
        _PT + (dcolor - pccmax) / (cmax - pccmax) * (1.0 - _PT))
    dc = np.clip(dc, 0.0, 1.0) ** _QC

    # feature differences on achromatic channel (normalized to [0,1])
    ya_ref = (yref[..., 0] + 16.0) / 116.0
    ya_tst = (ytst[..., 0] + 16.0) / 116.0
    g, gd, gdd = _feature_kernels(ppd)
    feats = []
    for ya in (ya_ref, ya_tst):
        ex = _sep2(ya, gd, g)
        ey = _sep2(ya, g, gd)
        px = _sep2(ya, gdd, g)
        py = _sep2(ya, g, gdd)
        feats.append((np.sqrt(ex ** 2 + ey ** 2),
                      np.sqrt(px ** 2 + py ** 2)))
    (e0, p0), (e1, p1) = feats
    df = np.maximum(np.abs(e0 - e1), np.abs(p0 - p1))
    df = np.clip((1.0 / np.sqrt(2.0)) * df, 0.0, 1.0) ** _QF

    err = dc ** (1.0 - df)
    return err.astype(np.float32), float(err.mean())
