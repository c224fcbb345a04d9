#!/usr/bin/env python3
"""Golden-image gate: render scenes with pbrt_tpu and compare against
committed reference-pbrt CPU renders (goldens/*.exr) at matched spp.

The oracle images were rendered by the reference binary built from
/root/reference (CPU-only, see BASELINE.md). Because both images are
independent Monte Carlo estimates at the same spp, the gate bounds the
MRSE (relative MSE, imgtool.cpp:1101) and the mean-luminance ratio rather
than demanding pixel equality.

Usage: python tools/golden.py [--spp N] [--update-out DIR]
Exits non-zero on regression. One line of JSON per scene.
"""
import argparse
import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def mrse(img, ref):
    import numpy as np
    d = img - ref
    return float((d * d / (ref * ref + 0.01)).mean())


def mse(img, ref):
    import numpy as np
    d = img - ref
    return float((d * d).mean())


CONFIGS = [
    # name, golden file, spp, max_depth, mrse gate, mean-ratio gate
    # cornell: REFERENCE-ORACLE golden (rendered by the reference binary
    # built from /root/reference; see BASELINE.md)
    ("cornell", "cornell_400_64spp.exr", 64, 5, 0.08, 0.02),
    # the rest are REGRESSION goldens: committed renders of this renderer
    # at a pinned seed (catch regressions, not absolute bias — absolute
    # correctness is covered by the analytic-oracle test suite)
    ("meshfield", "meshfield_200_32spp.exr", 32, 4, 0.08, 0.02),
    ("instances", "instances_200_32spp.exr", 32, 3, 0.08, 0.02),
    ("volume", "volume_200_32spp.exr", 32, 6, 0.10, 0.03),
]


def render_config(name, spp, max_depth):
    from pbrt_tpu import scenes
    from pbrt_tpu import samplers as smp
    from pbrt_tpu.integrators import render as rdr
    from pbrt_tpu.integrators.path import PathOptions
    import numpy as np
    from pbrt_tpu import scene_core as sc, cameras as cam_mod
    from pbrt_tpu.utils import spectrum as spc, transform as tfm
    if name == "cornell":
        scene, cam = scenes.make_cornell_box(width=400, height=400)
    elif name == "meshfield":
        from pbrt_tpu.utils.subdivision import loop_subdivide
        rng = np.random.default_rng(7)
        b = sc.SceneBuilder()
        m = b.materials.add_diffuse((0.6, 0.5, 0.4))
        V0 = np.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                         [0, 0, 1], [0, 0, -1]], np.float32)
        F0 = np.asarray([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])
        V, F = loop_subdivide(V0, F0, 4)
        for i in range(10):
            c = rng.uniform(-3, 3, 3)
            c[1] = rng.uniform(0, 2)
            b.add_mesh(V * rng.uniform(0.3, 0.8) + c, F, m)
        mg = b.materials.add_diffuse((0.4,) * 3)
        b.add_mesh([[-8, -1, -8], [8, -1, -8], [8, -1, 8], [-8, -1, 8]],
                   [[0, 1, 2], [0, 2, 3]], mg)
        b.add_uniform_infinite_light(spc.ConstantSpectrum(1.0))
        scene = b.build()
        cam = cam_mod.make_camera(
            "perspective", fov=50, width=200, height=200,
            camera_from_world=tfm.look_at((0, 3, 9), (0, 0.5, 0),
                                          (0, 1, 0)).inverse())
    elif name == "instances":
        b = sc.SceneBuilder()
        m = b.materials.add_diffuse((0.7, 0.3, 0.3))
        mg = b.materials.add_diffuse((0.5, 0.5, 0.5))
        b.add_mesh([[-10, -1, -10], [10, -1, -10], [10, -1, 10],
                    [-10, -1, 10]], [[0, 1, 2], [0, 2, 3]], mg)
        s_ = 0.5
        Vc = np.asarray([[-s_, -s_, -s_], [s_, -s_, -s_], [s_, s_, -s_],
                         [-s_, s_, -s_], [-s_, -s_, s_], [s_, -s_, s_],
                         [s_, s_, s_], [-s_, s_, s_]], np.float32)
        Fc = np.asarray([[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6],
                         [0, 4, 5], [0, 5, 1], [3, 2, 6], [3, 6, 7],
                         [0, 3, 7], [0, 7, 4], [1, 5, 6], [1, 6, 2]])
        proto = b.new_prototype()
        b.add_proto_mesh(proto, Vc, Fc, m)
        for gx in range(-2, 3):
            for gz in range(-2, 3):
                b.add_instance(proto, tfm.translate((gx * 2.0, 0,
                                                     gz * 2.0)))
        b.add_uniform_infinite_light(spc.ConstantSpectrum(1.0))
        scene = b.build(force_bvh=False)
        cam = cam_mod.make_camera(
            "perspective", fov=55, width=200, height=200,
            camera_from_world=tfm.look_at((5, 5, 9), (0, 0, 0),
                                          (0, 1, 0)).inverse())
    elif name == "volume":
        b = sc.SceneBuilder()
        mg = b.materials.add_diffuse((0.4,) * 3)
        b.add_mesh([[-6, -1.5, -6], [6, -1.5, -6], [6, -1.5, 6],
                    [-6, -1.5, 6]], [[0, 1, 2], [0, 2, 3]], mg)
        rng = np.random.default_rng(3)
        nz = ny = nx = 24
        zz, yy, xx = np.meshgrid(np.linspace(-1, 1, nz),
                                 np.linspace(-1, 1, ny),
                                 np.linspace(-1, 1, nx), indexing="ij")
        dens = np.exp(-3.0 * (xx ** 2 + yy ** 2 + zz ** 2)) *             (1 + 0.5 * rng.standard_normal((nz, ny, nx)))
        dens = np.clip(dens, 0, None).astype(np.float32)
        b.media.add_grid(dens, (-1.2, -1.2, -1.2), (1.2, 1.2, 1.2),
                         sigma_a=(0.2, 0.25, 0.3), sigma_s=(3.0, 3.0, 3.0),
                         g=0.3, scale=2.0)
        b.add_uniform_infinite_light(spc.ConstantSpectrum(1.0))
        scene = b.build(force_bvh=False)
        cam = cam_mod.make_camera(
            "perspective", fov=45, width=200, height=200,
            camera_from_world=tfm.look_at((0, 0.5, 5), (0, 0, 0),
                                          (0, 1, 0)).inverse())
    else:
        raise KeyError(name)
    img, stats = rdr.render(
        scene, cam, spp=spp,
        sampler=smp.make_sampler("zsobol", spp=spp,
                                 full_resolution=(cam.width, cam.height)),
        opts=PathOptions(max_depth=max_depth))
    return np.asarray(img), stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="write rendered images to this dir")
    ap.add_argument("--update-regression", action="store_true",
                    help="(re)write the REGRESSION goldens (never the "
                         "reference-oracle cornell image)")
    args = ap.parse_args()
    from pbrt_tpu.utils import image as pimg
    import numpy as np
    failed = False
    for name, golden, spp, max_depth, gate_mrse, gate_mean in CONFIGS:
        gpath = ROOT / "goldens" / golden
        if args.update_regression and name != "cornell":
            img, stats = render_config(name, spp, max_depth)
            pimg.write_exr(gpath, img)
            print(json.dumps(dict(scene=name, updated=True)))
            continue
        if not gpath.exists():
            print(json.dumps(dict(scene=name, skipped="no golden")))
            continue
        ref = pimg.read_exr(gpath)
        img, stats = render_config(name, spp, max_depth)
        m = mrse(img, ref)
        mean_ratio = float(abs(img.mean() / max(float(ref.mean()), 1e-9)
                               - 1.0))
        ok = (m <= gate_mrse) and (mean_ratio <= gate_mean)
        failed |= not ok
        print(json.dumps(dict(
            scene=name, spp=spp, mrse=round(m, 5), mse=round(mse(img, ref), 6),
            mean_ratio_err=round(mean_ratio, 5),
            paths_per_sec=round(stats["paths_per_sec"]),
            ok=bool(ok))))
        if args.out:
            outdir = Path(args.out)
            outdir.mkdir(parents=True, exist_ok=True)
            pimg.write_exr(outdir / f"{name}_{spp}spp.exr", img)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
