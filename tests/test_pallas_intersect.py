"""Pallas brute-force intersect kernel math vs the XLA reference.

The kernel body is a pure function (`_tri_block_math`) tested here directly
on CPU — Pallas interpret mode is deliberately NOT used: with the 8-virtual-
device CPU setup it lowers kernels to host callbacks that produce
nondeterministic results. The compiled kernel plumbing is exercised on real
TPU by bench.py and the golden-image gate (tools/golden.py).
"""
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.ops import bvh as bvh_mod
from pbrt_tpu.ops import pallas_intersect as pli


def _setup(T=9, N=700, seed=3):
    rng = np.random.default_rng(seed)
    p0 = rng.uniform(-2, 2, (T, 3)).astype(np.float32)
    p1 = (p0 + rng.uniform(-1, 1, (T, 3))).astype(np.float32)
    p2 = (p0 + rng.uniform(-1, 1, (T, 3))).astype(np.float32)
    tri_geo = bvh_mod.pack_tri_geo(p0, p1, p2)
    tri_pad = pli.pad_triangles(np.asarray(tri_geo))
    o = jnp.asarray(rng.uniform(-3, 3, (N, 3)), jnp.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((N,), 1e30, jnp.float32)
    ref = bvh_mod.brute_force_intersect_triangles(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2), o, d, tmax)
    return tri_pad, o, d, tmax, ref, T


def _run_math(tri_pad, o, d, tmax, n_real, any_hit=False):
    """Drive the kernel body as a plain JAX function (no Pallas plumbing)."""
    t, kf, b1, b2 = pli._tri_block_math(
        tri_pad, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
        jnp.asarray(tmax, jnp.float32), int(tri_pad.shape[0]) // 16,
        n_real, any_hit)
    prim = kf.astype(jnp.int32)
    hit = prim >= 0
    return dict(hit=hit, t=jnp.where(hit, t, jnp.inf), prim=prim,
                b0=1.0 - b1 - b2, b1=b1, b2=b2)


def test_closest_hit_matches_xla():
    tri_pad, o, d, tmax, ref, T = _setup()
    new = _run_math(tri_pad, o, d, tmax, T)
    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(new["hit"]))
    both = np.asarray(ref["hit"])
    np.testing.assert_array_equal(np.asarray(ref["prim"])[both],
                                  np.asarray(new["prim"])[both])
    np.testing.assert_allclose(np.asarray(ref["t"])[both],
                               np.asarray(new["t"])[both], rtol=1e-5)
    for k in ("b0", "b1", "b2"):
        np.testing.assert_allclose(np.asarray(ref[k])[both],
                                   np.asarray(new[k])[both], atol=1e-5)


def test_any_hit_matches_xla():
    tri_pad, o, d, tmax, ref, T = _setup(seed=11)
    new = _run_math(tri_pad, o, d, tmax, T, any_hit=True)
    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(new["hit"]))


def test_tmax_respected():
    tri_pad, o, d, _, ref, T = _setup(seed=5)
    tshort = jnp.full((o.shape[0],), 0.5, jnp.float32)
    new = _run_math(tri_pad, o, d, tshort, T)
    hits = np.asarray(new["hit"])
    assert np.all(np.asarray(new["t"])[hits] < 0.5)


def test_dense_grid_of_rays_against_quad():
    """Axis-aligned quad, grid of rays: analytic hit pattern."""
    v = np.asarray([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                   np.float32)
    p0 = np.stack([v[0], v[0]])
    p1 = np.stack([v[1], v[2]])
    p2 = np.stack([v[2], v[3]])
    tri_pad = pli.pad_triangles(
        np.asarray(bvh_mod.pack_tri_geo(p0, p1, p2)))
    xs = np.linspace(-1.5, 1.5, 31)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    o = jnp.asarray(np.stack([X.ravel(), Y.ravel(),
                              np.full(X.size, 3.0)], -1), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (o.shape[0], 1))
    tmax = jnp.full((o.shape[0],), 1e30, jnp.float32)
    r = _run_math(tri_pad, o, d, tmax, 2)
    inside = (np.abs(X.ravel()) < 0.999) & (np.abs(Y.ravel()) < 0.999)
    hits = np.asarray(r["hit"])
    assert np.all(hits[inside])
    outside = (np.abs(X.ravel()) > 1.001) | (np.abs(Y.ravel()) > 1.001)
    assert not np.any(hits[outside])
    np.testing.assert_allclose(np.asarray(r["t"])[inside], 3.0, rtol=1e-5)
