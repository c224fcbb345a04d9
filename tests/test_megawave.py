"""Megakernel (ops/megawave.py) gates: lane-for-lane agreement with the
general fused wave (integrators/path.py::trace_paths), host-hash replicas,
and static eligibility routing.

Runs the Pallas kernel in interpret mode on CPU (same math as the TPU
compile; the on-device image gate lives in tools/tpu_checks.py)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbrt_tpu import scenes
from pbrt_tpu import samplers as smp
from pbrt_tpu import cameras as cam_mod
from pbrt_tpu.integrators import path as path_mod
from pbrt_tpu.utils import spectrum as spc
from pbrt_tpu.ops import megawave


def test_host_hash_matches_device():
    """The kernel bakes per-dimension hashes at compile time via a numpy
    replica of utils/rng.py hash_u32 — pin them against the device fn."""
    from pbrt_tpu.utils import rng as prng
    for words in [(7,), (6, 0), (17, 0, 0x9dbf6d7c), (40, 3, 0x4df5),
                  (0xFFFFFFFF, 0x12345678)]:
        host = megawave._hash_u32_host(*words)
        dev = int(np.asarray(prng.hash_u32(*[np.uint32(w) for w in words])))
        assert host == dev, (words, host, dev)


def _cornell_rays(W=16, H=16, spp=4, sample_index=0):
    scene, cam = scenes.make_cornell_box(width=W, height=H)
    sampler = smp.make_sampler("zsobol", spp=spp, full_resolution=(W, H))
    N = W * H
    pix = np.arange(N, dtype=np.int32)
    px = jnp.asarray(pix % W)
    py = jnp.asarray(pix // W)
    si = jnp.full((N,), sample_index, jnp.int32)
    u_lens = smp.sample_2d(sampler, px, py, si, 3)
    u_lam = smp.sample_1d(sampler, px, py, si, 5)
    swl = spc.sample_visible_wavelengths(u_lam)
    p_film = jnp.stack([px + 0.5, py + 0.5], -1).astype(jnp.float32)
    o, d, _t, _w = cam_mod.generate_ray_weighted(cam, p_film, u_lens,
                                                 jnp.zeros((N,)))
    return scene, sampler, px, py, si, o, d, swl


def test_cornell_is_eligible_and_matches_fused():
    """Cornell class: the megakernel must reproduce trace_paths lane-for-
    lane (same sampler dims, same MIS/RR) to float-assoc tolerance."""
    scene, sampler, px, py, si, o, d, swl = _cornell_rays(sample_index=1)
    assert scene.mega is not None
    assert scene.mega.n_tris == 32 and scene.mega.n_lights == 2
    opts = path_mod.PathOptions(max_depth=4, megakernel=False)
    L_ref = np.asarray(path_mod.trace_paths(
        scene, sampler, px, py, si, o, d, swl, opts))
    L_mega = np.asarray(megawave.trace(
        scene, sampler, px, py, si, o, d, swl.lam, max_depth=4,
        rr_start=1, interpret=True))
    rel = np.abs(L_ref - L_mega) / np.maximum(np.abs(L_ref), 1e-3)
    assert rel.max() < 1e-4, rel.max()


def test_megakernel_routing():
    """megakernel=True routes through the kernel inside trace_paths (the
    same entry render() uses); 'auto' stays on the fused wave off-TPU."""
    scene, sampler, px, py, si, o, d, swl = _cornell_rays()
    opts_f = path_mod.PathOptions(max_depth=3, megakernel=False)
    opts_m = path_mod.PathOptions(max_depth=3, megakernel=True)
    assert not path_mod._use_megawave(scene, sampler,
                                      path_mod.PathOptions(megakernel="auto"))
    assert path_mod._use_megawave(scene, sampler, opts_m)
    L_ref = np.asarray(path_mod.trace_paths(
        scene, sampler, px, py, si, o, d, swl, opts_f))
    L_m = np.asarray(path_mod.trace_paths(
        scene, sampler, px, py, si, o, d, swl, opts_m))
    rel = np.abs(L_ref - L_m) / np.maximum(np.abs(L_ref), 1e-3)
    assert rel.max() < 1e-4


def test_ineligible_scenes():
    """Scenes outside the megakernel's closed world must not carry meta."""
    scene_f, _ = scenes.make_furnace_plane(width=8, height=8)
    assert scene_f.mega is None  # infinite light
    scene_s, _ = scenes.make_material_showcase(width=8, height=6, subdiv=0)
    assert scene_s.mega is None  # conductors/dielectric/env/quadrics
    # non-zsobol sampler is ineligible even on a mega scene
    scene_c, _ = scenes.make_cornell_box(width=8, height=8)
    s_ind = smp.make_sampler("independent", spp=4)
    assert not megawave.eligible(scene_c, s_ind,
                                 path_mod.PathOptions(megakernel=True))


def test_full_pipeline_matches_render_wave():
    """v2 (in-kernel camera dims + gaussian filter + pinhole ray gen,
    megawave.trace_full) must reproduce the XLA front-end + v1 kernel
    combination lane-for-lane: same ZSobol draws, same Giles erf-inv,
    same camera math."""
    from pbrt_tpu import filters as flt

    W = H = 16
    spp = 4
    scene, cam = scenes.make_cornell_box(width=W, height=H)
    sampler = smp.make_sampler("zsobol", spp=spp, full_resolution=(W, H))
    filt = flt.make_filter("gaussian")
    N = W * H
    pix = jnp.arange(N, dtype=jnp.int32)
    si = jnp.full((N,), 2, jnp.int32)
    opts = path_mod.PathOptions(max_depth=4, megakernel=False)
    assert megawave.eligible_full(scene, sampler, cam, filt, opts)

    L_ref, swl_ref, fw_ref = path_mod.render_wave(
        scene, cam, sampler, filt, pix, si, opts)

    px = pix % W
    py = pix // W
    u_lam = smp.sample_1d(sampler, px, py, si, 5)
    swl = spc.sample_visible_wavelengths(u_lam)
    np.testing.assert_array_equal(np.asarray(swl.lam),
                                  np.asarray(swl_ref.lam))
    L2, fw2 = megawave.trace_full(scene, sampler, cam, filt, px, py, si,
                                  swl.lam, max_depth=4, rr_start=1,
                                  interpret=True)
    rel = np.abs(np.asarray(L_ref) - np.asarray(L2)) / \
        np.maximum(np.abs(np.asarray(L_ref)), 1e-3)
    assert rel.max() < 1e-4, rel.max()
    fw_rel = np.abs(np.asarray(fw_ref) - np.asarray(fw2)) / \
        np.maximum(np.abs(np.asarray(fw_ref)), 1e-3)
    assert fw_rel.max() < 1e-4, fw_rel.max()


def test_full_pipeline_eligibility():
    from pbrt_tpu import filters as flt
    scene, cam = scenes.make_cornell_box(width=8, height=8)
    sampler = smp.make_sampler("zsobol", spp=4, full_resolution=(8, 8))
    opts = path_mod.PathOptions(megakernel=True)
    assert megawave.eligible_full(scene, sampler, cam,
                                  flt.make_filter("gaussian"), opts)
    # non-gaussian filter, lens camera: ineligible
    assert not megawave.eligible_full(scene, sampler, cam,
                                      flt.make_filter("box"), opts)
    cam_dof = cam_mod.make_camera(
        "perspective", camera_from_world=cam_mod.tfm.look_at(
            (278, 273, -800), (278, 273, 0), (0, 1, 0)).inverse(),
        width=8, height=8, fov=38.5, lens_radius=0.1, focal_distance=500.0)
    assert not megawave.eligible_full(scene, sampler, cam_dof,
                                      flt.make_filter("gaussian"), opts)
