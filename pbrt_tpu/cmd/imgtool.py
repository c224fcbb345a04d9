"""Image utility CLI (reference cmd/imgtool.cpp subcommands: diff, convert,
info, makeequiarea, average, falsecolor).

Usage:
  python -m pbrt_tpu.cmd.imgtool diff a.exr b.exr [--metric mse|mae|mrse|flip]
  python -m pbrt_tpu.cmd.imgtool convert in.exr out.png [--tonemap] [--scale S]
  python -m pbrt_tpu.cmd.imgtool info img.exr
  python -m pbrt_tpu.cmd.imgtool makeequiarea latlong.exr out.exr [--res N]
  python -m pbrt_tpu.cmd.imgtool average *.exr --outfile avg.exr
  python -m pbrt_tpu.cmd.imgtool falsecolor img.exr out.png [--max M]
  python -m pbrt_tpu.cmd.imgtool error noisy.exr --reference ref.exr
  python -m pbrt_tpu.cmd.imgtool assemble crop*.exr --outfile full.exr
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _read(path):
    from ..utils import image as pimg
    p = str(path)
    if p.endswith(".exr"):
        return pimg.read_exr(p)
    if p.endswith(".pfm"):
        return pimg.read_pfm(p)
    img = pimg.read_png(p)
    return img.astype(np.float32) / (65535.0 if img.dtype == np.uint16 else 255.0)


def _write(path, img):
    from ..utils import image as pimg
    p = str(path)
    if p.endswith(".exr"):
        pimg.write_exr(p, img)
    elif p.endswith(".pfm"):
        pimg.write_pfm(p, img)
    else:
        pimg.write_png(p, np.clip(img, 0, 1))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="imgtool")
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("diff")
    d.add_argument("a")
    d.add_argument("b")
    d.add_argument("--metric", default="mse",
                   choices=["mse", "mae", "mrse", "flip"])
    d.add_argument("--ppd", type=float, default=67.0,
                   help="pixels per degree for FLIP")
    d.add_argument("--outfile", default=None, help="write difference image")

    c = sub.add_parser("convert")
    c.add_argument("infile")
    c.add_argument("outfile")
    c.add_argument("--tonemap", action="store_true", help="sRGB transfer")
    c.add_argument("--scale", type=float, default=1.0)

    i = sub.add_parser("info")
    i.add_argument("infile")

    m = sub.add_parser("makeequiarea")
    m.add_argument("infile")
    m.add_argument("outfile")
    m.add_argument("--res", type=int, default=None)

    a = sub.add_parser("average")
    a.add_argument("infiles", nargs="+")
    a.add_argument("--outfile", required=True)

    fc = sub.add_parser("falsecolor",
                        help="viridis-map luminance (imgtool.cpp falsecolor)")
    fc.add_argument("infile")
    fc.add_argument("outfile")
    fc.add_argument("--max", type=float, default=None)
    fc.add_argument("--log", action="store_true")

    er = sub.add_parser("error",
                        help="per-image MSE/MRSE/FLIP vs a reference")
    er.add_argument("infiles", nargs="+")
    er.add_argument("--reference", required=True)

    asm = sub.add_parser("assemble",
                         help="sum partial images (crops rendered "
                              "separately; imgtool.cpp assemble)")
    asm.add_argument("infiles", nargs="+")
    asm.add_argument("--outfile", required=True)

    args = ap.parse_args(argv)

    if args.cmd == "diff":
        from ..utils import image as pimg
        ia, ib = _read(args.a), _read(args.b)
        if ia.shape != ib.shape:
            print(f"size mismatch {ia.shape} vs {ib.shape}", file=sys.stderr)
            return 1
        if args.metric == "flip":
            from ..utils.flip import flip
            emap, mean = flip(ia, ib, ppd=args.ppd)
            print(json.dumps({"flip": mean}))
            if args.outfile:
                _write(args.outfile, np.repeat(emap[..., None], 3, -1))
            return 0
        metric = {"mse": pimg.image_mse, "mae": pimg.image_mae,
                  "mrse": pimg.image_mrse}[args.metric]
        print(json.dumps({args.metric: metric(ia, ib)}))
        if args.outfile:
            _write(args.outfile, np.abs(ia - ib))
        return 0
    if args.cmd == "convert":
        img = _read(args.infile) * args.scale
        if args.tonemap:
            import jax
            jax.config.update("jax_platforms", "cpu")
            import jax.numpy as jnp
            from ..utils.color import linear_to_srgb
            img = np.asarray(linear_to_srgb(jnp.asarray(img)))
        _write(args.outfile, img)
        return 0
    if args.cmd == "info":
        img = _read(args.infile)
        print(json.dumps(dict(shape=list(img.shape),
                              min=float(img.min()), max=float(img.max()),
                              mean=float(img.mean()))))
        return 0
    if args.cmd == "makeequiarea":
        import jax
        jax.config.update("jax_platforms", "cpu")
        from ..utils import image_env
        img = _read(args.infile)
        _write(args.outfile, image_env.equalarea_from_latlong(img, args.res))
        return 0
    if args.cmd == "average":
        imgs = [_read(f) for f in args.infiles]
        _write(args.outfile, np.mean(imgs, axis=0))
        return 0
    if args.cmd == "falsecolor":
        img = _read(args.infile)
        lum = img @ np.asarray([0.2126, 0.7152, 0.0722]) \
            if img.ndim == 3 else img
        if args.log:
            lum = np.log2(np.maximum(lum, 1e-12))
        mx = args.max if args.max is not None else float(lum.max())
        t = np.clip(lum / max(mx, 1e-12), 0.0, 1.0)
        # compact viridis-ish ramp
        stops = np.asarray([[0.267, 0.005, 0.329], [0.283, 0.141, 0.458],
                            [0.254, 0.265, 0.530], [0.207, 0.372, 0.553],
                            [0.164, 0.471, 0.558], [0.128, 0.567, 0.551],
                            [0.135, 0.659, 0.518], [0.267, 0.749, 0.441],
                            [0.478, 0.821, 0.318], [0.741, 0.873, 0.150],
                            [0.993, 0.906, 0.144]])
        x = t * (len(stops) - 1)
        i0 = np.clip(x.astype(int), 0, len(stops) - 2)
        f = (x - i0)[..., None]
        out = stops[i0] * (1 - f) + stops[i0 + 1] * f
        _write(args.outfile, out.astype(np.float32))
        return 0
    if args.cmd == "error":
        from ..utils import image as pimg
        from ..utils.flip import flip
        ref = _read(args.reference)
        for f in args.infiles:
            img = _read(f)
            if img.shape != ref.shape:
                print(f"{f}: size mismatch", file=sys.stderr)
                continue
            print(json.dumps({
                "file": f,
                "mse": pimg.image_mse(img, ref),
                "mrse": pimg.image_mrse(img, ref),
                "flip": flip(ref, img)[1]}))
        return 0
    if args.cmd == "assemble":
        total = None
        for f in args.infiles:
            img = _read(f)
            total = img if total is None else total + img
        _write(args.outfile, total)
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
