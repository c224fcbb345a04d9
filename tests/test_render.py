"""End-to-end radiometric tests (reference integrators_test.cpp pattern:
render analytic scenes, check scene averages, tolerance ~2.5%)."""
import numpy as np
import pytest

from pbrt_tpu import scenes
from pbrt_tpu import samplers as smp
from pbrt_tpu.integrators import render as rdr
from pbrt_tpu.integrators.path import PathOptions


def test_furnace_plane_single_bounce():
    """Diffuse plane under uniform env: pixel value == albedo * L_env.
    Exercises: camera, intersection, NEE+MIS vs env light, BSDF sampling."""
    scene, cam = scenes.make_furnace_plane(albedo=0.6, env_radiance=1.0,
                                           width=48, height=48)
    img, stats = rdr.render(scene, cam, spp=32,
                            sampler=smp.make_sampler("independent", spp=32),
                            opts=PathOptions(max_depth=3))
    # luminance of a constant 0.6-reflectance under equal-energy env in sRGB:
    # spectral albedo is flat 0.6, env flat 1 -> reflected spectrum flat 0.6
    # -> y = 0.6 (XYZ Y of constant spectrum w/ our normalization)
    mean = img.mean(axis=(0, 1))
    lum = 0.2126 * mean[0] + 0.7152 * mean[1] + 0.0722 * mean[2]
    assert abs(lum - 0.6) < 0.025, f"lum={lum}, rgb={mean}"


def test_white_furnace_sphere():
    """Albedo-1 sphere in uniform env: every pixel == env radiance
    (energy conservation through multiple bounces + RR)."""
    scene, cam = scenes.make_furnace_sphere(albedo=1.0, env_radiance=1.0,
                                            width=32, height=32, subdiv=2)
    img, _ = rdr.render(scene, cam, spp=64,
                        sampler=smp.make_sampler("independent", spp=64),
                        opts=PathOptions(max_depth=40))
    mean = img.mean(axis=(0, 1))
    lum = 0.2126 * mean[0] + 0.7152 * mean[1] + 0.0722 * mean[2]
    # small loss from finite depth + RR variance
    assert abs(lum - 1.0) < 0.03, f"lum={lum}, rgb={mean}"


def test_cornell_box_renders():
    """Cornell smoke test: renders, is finite, has expected structure
    (light bright, red wall reddish on left, green wall on right)."""
    scene, cam = scenes.make_cornell_box(width=64, height=64)
    img, stats = rdr.render(scene, cam, spp=16,
                            sampler=smp.make_sampler("zsobol", spp=16,
                                                     full_resolution=(64, 64)),
                            opts=PathOptions(max_depth=5))
    assert np.isfinite(img).all()
    assert img.max() > 0.5  # light source visible
    # left half should be redder than right half; right greener
    left = img[:, :10].mean(axis=(0, 1))
    right = img[:, -10:].mean(axis=(0, 1))
    assert left[0] / max(left[1], 1e-6) > right[0] / max(right[1], 1e-6)
    assert right[1] / max(right[0], 1e-6) > left[1] / max(left[0], 1e-6)
    # energy sane: mean luminance in a plausible range
    lum = (0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]).mean()
    assert 0.05 < lum < 2.0, lum


def test_sampler_convergence_order():
    """ZSobol at 16spp should have lower error than independent at 16spp on
    the furnace plane (QMC beats MC)."""
    scene, cam = scenes.make_furnace_plane(albedo=0.5, env_radiance=1.0,
                                           width=32, height=32)
    opts = PathOptions(max_depth=2)
    img_mc, _ = rdr.render(scene, cam, spp=16,
                           sampler=smp.make_sampler("independent", spp=16), opts=opts)
    img_qmc, _ = rdr.render(scene, cam, spp=16,
                            sampler=smp.make_sampler("zsobol", spp=16,
                                                     full_resolution=(32, 32)), opts=opts)
    lum = lambda im: 0.2126 * im[..., 0] + 0.7152 * im[..., 1] + 0.0722 * im[..., 2]
    err_mc = np.abs(lum(img_mc) - 0.5).mean()
    err_qmc = np.abs(lum(img_qmc) - 0.5).mean()
    assert err_qmc < err_mc * 1.1, (err_qmc, err_mc)
