"""Multi-chip correctness: a pixel-sharded render over the 8-device CPU
mesh must EQUAL the single-device render (same sampler streams, same
wave decomposition — only the film reduction order differs, so fp
tolerance only). Proves parallel/mesh.py's shard_map path, not just
liveness (reference scale-out role: cpu/integrators.cpp:163
ParallelFor2D tiles; here DP over a jax.sharding.Mesh, SURVEY §2.9)."""
import numpy as np
import jax
import pytest

from pbrt_tpu import scenes
from pbrt_tpu import samplers as smp
from pbrt_tpu.integrators import render as rdr
from pbrt_tpu.integrators.path import PathOptions
from pbrt_tpu.parallel import mesh as pmesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_sharded_render_equals_single_device():
    W = H = 24
    spp = 2
    scene, cam = scenes.make_cornell_box(width=W, height=H)
    sampler = smp.make_sampler("independent", spp=spp)
    opts = PathOptions(max_depth=3)

    img1, _ = rdr.render(scene, cam, spp=spp, sampler=sampler, opts=opts,
                         waves_per_dispatch=1)

    mesh = pmesh.make_mesh(jax.devices()[:8])
    img8, info = pmesh.render_multichip(scene, cam, spp=spp,
                                        sampler=sampler, opts=opts,
                                        mesh=mesh)
    assert info["n_devices"] == 8
    np.testing.assert_allclose(np.asarray(img8), np.asarray(img1),
                               rtol=2e-4, atol=2e-5)
