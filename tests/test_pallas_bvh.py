"""Packet BVH traversal vs brute force (ops/pallas_bvh.py).

The traversal logic is tested through its pure-jnp twin on CPU (same code
path via callbacks); the compiled Pallas kernel runs on real TPU in
bench/golden runs."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.ops import bvh as bvh_mod
from pbrt_tpu.ops import pallas_bvh as pbvh


def _scene(T=300, seed=0):
    rng = np.random.default_rng(seed)
    p0 = rng.uniform(-3, 3, (T, 3)).astype(np.float32)
    p1 = (p0 + rng.uniform(-0.5, 0.5, (T, 3))).astype(np.float32)
    p2 = (p0 + rng.uniform(-0.5, 0.5, (T, 3))).astype(np.float32)
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    bvh = bvh_mod.build_bvh(lo, hi)
    ordered = bvh_mod.pack_tri_geo(p0, p1, p2,
                                   order=np.asarray(bvh.prim_indices))
    tris16 = pbvh.pad_tris_for_bvh(np.asarray(ordered))
    return (p0, p1, p2), bvh.nodes, tris16


def _rays(n=500, seed=1):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-4, 4, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d)


def test_packet_traversal_matches_brute_force():
    (p0, p1, p2), nodes, tris16 = _scene()
    o, d = _rays()
    tmax = jnp.full((o.shape[0],), 1e30)
    ref = bvh_mod.brute_force_intersect_triangles(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2), o, d, tmax)
    got = pbvh.traverse_reference(nodes, tris16, o, d, tmax)
    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(got["hit"]))
    m = np.asarray(ref["hit"])
    np.testing.assert_array_equal(np.asarray(ref["prim"])[m],
                                  np.asarray(got["prim"])[m])
    np.testing.assert_allclose(np.asarray(ref["t"])[m],
                               np.asarray(got["t"])[m], rtol=2e-5)


def test_packet_any_hit():
    (p0, p1, p2), nodes, tris16 = _scene(seed=3)
    o, d = _rays(seed=4)
    tmax = jnp.full((o.shape[0],), 1e30)
    ref = bvh_mod.brute_force_intersect_triangles(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2), o, d, tmax)
    got = pbvh.traverse_reference(nodes, tris16, o, d, tmax, any_hit=True)
    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(got["hit"]))


def test_packet_tmax():
    (p0, p1, p2), nodes, tris16 = _scene(seed=5)
    o, d = _rays(seed=6)
    got = pbvh.traverse_reference(nodes, tris16, o, d,
                                  jnp.full((o.shape[0],), 2.0))
    t = np.asarray(got["t"])[np.asarray(got["hit"])]
    assert (t < 2.0).all()
