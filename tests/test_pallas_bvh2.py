"""Two-level packet traversal vs the XLA state machine (ops/pallas_bvh)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu import scene_core as sc
from pbrt_tpu.ops import pallas_bvh as pbvh
from pbrt_tpu.ops import tlas as tlas_mod
from pbrt_tpu.utils import spectrum as spc
from pbrt_tpu.utils import transform as tfm


def _scene():
    b = sc.SceneBuilder()
    m = b.materials.add_diffuse((0.7, 0.3, 0.3))
    mg = b.materials.add_diffuse((0.5,) * 3)
    b.add_mesh([[-10, -1, -10], [10, -1, -10], [10, -1, 10], [-10, -1, 10]],
               [[0, 1, 2], [0, 2, 3]], mg)
    s_ = 0.5
    V = np.asarray([[-s_, -s_, -s_], [s_, -s_, -s_], [s_, s_, -s_],
                    [-s_, s_, -s_], [-s_, -s_, s_], [s_, -s_, s_],
                    [s_, s_, s_], [-s_, s_, s_]], np.float32)
    F = np.asarray([[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6],
                    [0, 4, 5], [0, 5, 1], [3, 2, 6], [3, 6, 7],
                    [0, 3, 7], [0, 7, 4], [1, 5, 6], [1, 6, 2]])
    proto = b.new_prototype()
    b.add_proto_mesh(proto, V, F, m)
    for gx in range(-2, 3):
        for gz in range(-2, 3):
            b.add_instance(proto, tfm.translate((gx * 2.0, 0, gz * 2.0))
                           @ tfm.rotate(15 * gx, (0, 1, 0)))
    b.add_uniform_infinite_light(spc.ConstantSpectrum(1.0))
    return b.build(force_bvh=False)


def test_two_level_packet_matches_state_machine():
    scene = _scene()
    rng = np.random.default_rng(0)
    n = 400
    o = jnp.asarray(rng.uniform(-6, 6, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((n,), 1e30)
    ref = tlas_mod.two_level_intersect(scene.tlas_nodes, scene.inst_rows,
                                       scene.tri_geo_tlas, scene.tlas_root,
                                       o, d, tmax)
    tris_dense = pbvh.pad_tris_for_bvh(np.asarray(scene.tri_geo_tlas))
    got = pbvh.two_level_reference(scene.tlas_nodes, scene.inst_rows,
                                   tris_dense, scene.tlas_root, o, d, tmax)
    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(got["hit"]))
    m = np.asarray(ref["hit"])
    np.testing.assert_array_equal(np.asarray(ref["prim"])[m],
                                  np.asarray(got["prim"])[m])
    np.testing.assert_array_equal(np.asarray(ref["inst"])[m],
                                  np.asarray(got["inst"])[m])
    np.testing.assert_allclose(np.asarray(ref["t"])[m],
                               np.asarray(got["t"])[m], rtol=2e-4)


def test_two_level_packet_any_hit():
    scene = _scene()
    rng = np.random.default_rng(1)
    n = 300
    o = jnp.asarray(rng.uniform(-6, 6, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((n,), 1e30)
    ref = tlas_mod.two_level_intersect(scene.tlas_nodes, scene.inst_rows,
                                       scene.tri_geo_tlas, scene.tlas_root,
                                       o, d, tmax, any_hit=True)
    tris_dense = pbvh.pad_tris_for_bvh(np.asarray(scene.tri_geo_tlas))
    got = pbvh.two_level_reference(scene.tlas_nodes, scene.inst_rows,
                                   tris_dense, scene.tlas_root, o, d, tmax,
                                   any_hit=True)
    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(got["hit"]))
