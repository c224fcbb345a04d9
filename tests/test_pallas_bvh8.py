"""8-wide packet BVH (ops/pallas_bvh8.py) vs brute force.

The Pallas kernel itself is exercised here through interpret mode (same
kernel code, CPU); compiled runs happen on real TPU in bench/golden runs.
"""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.ops import bvh as bvh_mod
from pbrt_tpu.ops import pallas_bvh8 as b8


def _scene(T=600, seed=0):
    rng = np.random.default_rng(seed)
    p0 = rng.uniform(-3, 3, (T, 3)).astype(np.float32)
    p1 = (p0 + rng.uniform(-0.5, 0.5, (T, 3))).astype(np.float32)
    p2 = (p0 + rng.uniform(-0.5, 0.5, (T, 3))).astype(np.float32)
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    tri_geo = np.concatenate(
        [p0, p1, p2, np.arange(T, dtype=np.float32)[:, None]], axis=1)
    return (p0, p1, p2), b8.build_bvh8(lo, hi, tri_geo)


def _rays(n=512, seed=1):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-4, 4, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d)


def test_collapse_covers_all_primitives():
    """Every original primitive appears in exactly one leaf range, read
    back through the QUANTIZED node encoding (w0 cnt byte + w2 first)."""
    _, bv8 = _scene(T=777)
    nq = np.asarray(bv8.nodes_q).view(np.uint32).reshape(
        bv8.n_nodes, b8.WIDTH, 3)
    covered = np.zeros(bv8.n_tris, bool)
    for node in nq:
        for c in range(b8.WIDTH):
            cnt = int(node[c, 0] >> 24)
            first = int(node[c, 2].view(np.int32) if hasattr(node[c, 2],
                        'view') else node[c, 2])
            if 0 < cnt < b8.CNT_EMPTY:
                assert not covered[first:first + cnt].any(), "overlap"
                covered[first:first + cnt] = True
    assert covered.all()
    # permutation validity
    assert sorted(np.asarray(bv8.prim_indices)) == list(range(bv8.n_tris))


def test_quantized_boxes_are_conservative():
    """Dequantized child boxes must CONTAIN the exact collapse boxes
    (round-out invariant the slab test relies on)."""
    rng = np.random.default_rng(11)
    T = 500
    p0 = rng.uniform(-3, 3, (T, 3)).astype(np.float32)
    p1 = (p0 + rng.uniform(-0.5, 0.5, (T, 3))).astype(np.float32)
    p2 = (p0 + rng.uniform(-0.5, 0.5, (T, 3))).astype(np.float32)
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    tri_geo = np.concatenate(
        [p0, p1, p2, np.arange(T, dtype=np.float32)[:, None]], axis=1)
    bb = bvh_mod.build_bvh(lo, hi, max_leaf=4)
    nd, _dep = b8.collapse_to_bvh8(np.asarray(bb.nodes), 8)
    nf, nq = b8.quantize_nodes(nd)
    n = nd.shape[0]
    frames = nf[8:].reshape(n, b8.NF_F)
    q = nq.view(np.uint32).reshape(n, b8.WIDTH, 3)
    ch = nd[:, :b8.WIDTH * 8].reshape(n, b8.WIDTH, 8)
    for i in range(n):
        o = frames[i, 0:3]
        s = frames[i, 3:6]
        for c in range(b8.WIDTH):
            cnt = int(q[i, c, 0] >> 24)
            if cnt == b8.CNT_EMPTY:
                continue
            qlo = np.array([q[i, c, 0] & 255, (q[i, c, 0] >> 8) & 255,
                            (q[i, c, 0] >> 16) & 255], np.float32)
            qhi = np.array([q[i, c, 1] & 255, (q[i, c, 1] >> 8) & 255,
                            (q[i, c, 1] >> 16) & 255], np.float32)
            dlo = (o + qlo * s).astype(np.float32)
            dhi = (o + qhi * s).astype(np.float32)
            assert (dlo <= ch[i, c, 0:3] + 1e-30).all(), (i, c)
            assert (dhi >= ch[i, c, 3:6] - 1e-30).all(), (i, c)


def test_bvh8_matches_brute_force():
    (p0, p1, p2), bv8 = _scene()
    o, d = _rays()
    tmax = jnp.full((o.shape[0],), 1e30)
    ref = bvh_mod.brute_force_intersect_triangles(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2), o, d, tmax)
    got = b8.bvh8_intersect(bv8, o, d, tmax, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(got["hit"]))
    m = np.asarray(ref["hit"])
    np.testing.assert_array_equal(np.asarray(ref["prim"])[m],
                                  np.asarray(got["prim"])[m])
    np.testing.assert_allclose(np.asarray(ref["t"])[m],
                               np.asarray(got["t"])[m], rtol=3e-5)


def test_bvh8_any_hit_and_tmax():
    (p0, p1, p2), bv8 = _scene(seed=3)
    o, d = _rays(seed=4)
    tmax = jnp.full((o.shape[0],), 1e30)
    ref = bvh_mod.brute_force_intersect_triangles(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2), o, d, tmax)
    got = b8.bvh8_intersect(bv8, o, d, tmax, any_hit=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(got["hit"]))
    # bounded rays never report hits past t_max
    got2 = b8.bvh8_intersect(bv8, o, d, jnp.full((o.shape[0],), 2.0),
                             interpret=True)
    t = np.asarray(got2["t"])[np.asarray(got2["hit"])]
    assert (t < 2.0).all()


def test_chunked_matches_brute_force():
    """Multi-chunk scan (tiny budget forces ~8+ chunks) == brute force."""
    T = 900
    rng = np.random.default_rng(7)
    p0 = rng.uniform(-3, 3, (T, 3)).astype(np.float32)
    p1 = (p0 + rng.uniform(-0.5, 0.5, (T, 3))).astype(np.float32)
    p2 = (p0 + rng.uniform(-0.5, 0.5, (T, 3))).astype(np.float32)
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    tri_geo = np.concatenate(
        [p0, p1, p2, np.arange(T, dtype=np.float32)[:, None]], axis=1)
    c = b8.build_bvh8_chunked(lo, hi, tri_geo, budget=8 * 1024)
    assert c.n_chunks >= 4, f"expected multiple chunks, got {c.n_chunks}"
    o, d = _rays(seed=8)
    tmax = jnp.full((o.shape[0],), 1e30)
    ref = bvh_mod.brute_force_intersect_triangles(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2), o, d, tmax)
    got = b8.chunked_intersect(c, o, d, tmax, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(got["hit"]))
    m = np.asarray(ref["hit"])
    np.testing.assert_array_equal(np.asarray(ref["prim"])[m],
                                  np.asarray(got["prim"])[m])
    np.testing.assert_allclose(np.asarray(ref["t"])[m],
                               np.asarray(got["t"])[m], rtol=3e-5)
    # any-hit agreement on the hit mask
    got_a = b8.chunked_intersect(c, o, d, tmax, any_hit=True,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(got_a["hit"]))


def test_native_collapse_matches_python():
    """The C++ collapse (native/bvh8_collapse.cpp) must emit byte-identical
    node pages + depth to the pure-Python twin, for whole trees and for
    chunk subtrees (root/prim_base offsets)."""
    import pytest
    from pbrt_tpu import native

    rng = np.random.default_rng(7)
    T = 4000
    p0 = rng.uniform(-3, 3, (T, 3)).astype(np.float32)
    p1 = (p0 + rng.uniform(-0.5, 0.5, (T, 3))).astype(np.float32)
    p2 = (p0 + rng.uniform(-0.5, 0.5, (T, 3))).astype(np.float32)
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    b = bvh_mod.build_bvh(lo, hi, max_leaf=4)
    nb = np.asarray(b.nodes)
    res = native.collapse_bvh8_native(nb, 8)
    if res is None:
        pytest.skip("native library unavailable")
    nd_nat, dep_nat = res
    nd_py, dep_py = b8._collapse_to_bvh8_py(nb, 8)
    assert dep_nat == dep_py
    assert np.array_equal(nd_nat, nd_py)

    # subtree ranges + per-chunk collapse
    start, count = native.subtree_ranges_native(nb)
    assert count[0] == T and start[0] == 0
    roots, p_start, p_count, _, _ = b8.partition_chunk_roots(nb, 24 * 1024)
    assert np.array_equal(start, p_start) or (start[roots] == p_start[roots]).all()
    for s in roots[:4]:
        a = native.collapse_bvh8_native(nb, 8, root=int(s),
                                        prim_base=int(start[s]))
        q = b8._collapse_to_bvh8_py(nb, 8, root=int(s),
                                    prim_base=int(start[s]))
        assert a[1] == q[1] and np.array_equal(a[0], q[0])
