"""Image utility CLI (reference cmd/imgtool.cpp subcommands: diff, convert,
info, makeequiarea, average, falsecolor).

Usage:
  python -m pbrt_tpu.cmd.imgtool diff a.exr b.exr [--metric mse|mae|mrse]
  python -m pbrt_tpu.cmd.imgtool convert in.exr out.png [--tonemap] [--scale S]
  python -m pbrt_tpu.cmd.imgtool info img.exr
  python -m pbrt_tpu.cmd.imgtool makeequiarea latlong.exr out.exr [--res N]
  python -m pbrt_tpu.cmd.imgtool average *.exr --outfile avg.exr
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
    d.add_argument("--metric", default="mse", choices=["mse", "mae", "mrse"])
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

    args = ap.parse_args(argv)

    if args.cmd == "diff":
        from ..utils import image as pimg
        ia, ib = _read(args.a), _read(args.b)
        if ia.shape != ib.shape:
            print(f"size mismatch {ia.shape} vs {ib.shape}", file=sys.stderr)
            return 1
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
    return 1


if __name__ == "__main__":
    sys.exit(main())
