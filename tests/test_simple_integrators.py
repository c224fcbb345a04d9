"""RandomWalk and SimplePath integrators (reference cpu/integrators.h:115,
:183): unoptimized estimators must agree in expectation with the
MIS-weighted path integrator."""
import numpy as np
import pytest

from pbrt_tpu import scenes, samplers as smp
from pbrt_tpu.integrators import render as rdr
from pbrt_tpu.integrators.path import PathOptions


@pytest.mark.parametrize("integ,tol,spp", [("simplepath", 0.05, 64),
                                           ("randomwalk", 0.25, 256)])
def test_matches_path_on_cornell(integ, tol, spp):
    scene, cam = scenes.make_cornell_box(width=32, height=32)
    opts = PathOptions(max_depth=4)
    s = smp.make_sampler("independent", spp=spp, full_resolution=(32, 32))
    img_p, _ = rdr.render(scene, cam, sampler=s, opts=opts,
                          integrator="path")
    img_s, _ = rdr.render(scene, cam, sampler=s, opts=opts, integrator=integ)
    r = img_s.mean() / img_p.mean()
    assert abs(r - 1.0) < tol, (integ, r)


def test_furnace_randomwalk():
    """RandomWalk on the furnace plane: mean luminance == albedo exactly
    (one bounce to a uniform environment)."""
    scene, cam = scenes.make_furnace_plane(albedo=0.5, width=24, height=24)
    s = smp.make_sampler("independent", spp=128, full_resolution=(24, 24))
    img, _ = rdr.render(scene, cam, sampler=s,
                        opts=PathOptions(max_depth=2),
                        integrator="randomwalk")
    lum = img @ np.asarray([0.2126, 0.7152, 0.0722])
    assert abs(lum.mean() - 0.5) < 0.04, lum.mean()
