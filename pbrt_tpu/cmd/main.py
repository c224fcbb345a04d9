"""pbrt_tpu renderer CLI (reference cmd/pbrt.cpp:105).

Usage: python -m pbrt_tpu.cmd.main scene.pbrt [--outfile out.exr] [--spp N]
       [--maxdepth N] [--resolution WxH] [--cpu] [--stats] [--quiet]
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="pbrt_tpu",
                                 description="TPU-native spectral path tracer")
    ap.add_argument("scene", help=".pbrt scene file")
    ap.add_argument("--outfile", default=None, help="override Film filename")
    ap.add_argument("--spp", type=int, default=None, help="override samples/pixel")
    ap.add_argument("--maxdepth", type=int, default=None)
    ap.add_argument("--resolution", default=None, help="WxH override")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--stats", action="store_true", help="print render stats")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--png", action="store_true", help="also write .png preview")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from ..scene import parser as pparser
    from ..integrators import render as rdr
    from ..integrators.path import PathOptions
    from .. import samplers as smp
    from ..utils import image as pimg

    t0 = time.time()
    desc = pparser.parse_file(args.scene)
    if not args.quiet:
        print(f"parsed + compiled scene in {time.time() - t0:.2f}s "
              f"({desc.scene.tri_p0.shape[0]} triangles, "
              f"{desc.scene.lights.packed.shape[0]} lights)", file=sys.stderr)

    cam = desc.camera
    if args.resolution:
        w, h = map(int, args.resolution.lower().split("x"))
        cam = cam.replace(width=w, height=h)
        desc.film_params["xres"], desc.film_params["yres"] = w, h
    sampler = desc.sampler
    if args.spp:
        sampler = smp.make_sampler("zsobol", spp=args.spp,
                                   full_resolution=(cam.width, cam.height))
    opts = PathOptions(max_depth=args.maxdepth or desc.integrator["max_depth"])

    img, stats = rdr.render(desc.scene, cam, sampler=sampler, opts=opts,
                            verbose=not args.quiet)
    out = args.outfile or desc.film_params["filename"]
    if out.endswith(".pfm"):
        pimg.write_pfm(out, img)
    elif out.endswith(".png"):
        from ..utils.color import linear_to_srgb
        import jax.numpy as jnp
        import numpy as np
        pimg.write_png(out, np.asarray(linear_to_srgb(jnp.asarray(img))))
    else:
        pimg.write_exr(out, img)
    if args.png and not out.endswith(".png"):
        from ..utils.color import linear_to_srgb
        import jax.numpy as jnp
        import numpy as np
        pimg.write_png(out.rsplit(".", 1)[0] + ".png",
                       np.asarray(linear_to_srgb(jnp.asarray(img))))
    if not args.quiet:
        print(f"wrote {out}", file=sys.stderr)
    if args.stats:
        print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
