"""Pallas TPU kernels for ray-triangle intersection.

The XLA brute-force path materializes (N, T, 3) intermediates in HBM (each
61MB for a 160k-ray wave against 32 triangles — profiled as the dominant
cost after the gather fixes). These kernels keep the whole test in
VMEM/registers: rays stream through in (R/128, 128) blocks, the triangle
pool stays resident in VMEM across grid steps, and only the final hit
records (t, prim, barycentrics) are written back.

Semantics mirror ops/intersect.py ray_triangle (watertight Woop-style test;
reference shapes.cpp Triangle::Intersect) and the brute-force closest-hit
reduction in ops/bvh.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 8           # rays per block = BLOCK_ROWS * LANES = 2048
BLOCK = BLOCK_ROWS * LANES
UNROLL = 4               # triangles tested per loop iteration (pool padded)


def _pick3(x, y, z, k):
    """Component pick by index k in {0,1,2} — elementwise select."""
    return jnp.where(k == 0, x, jnp.where(k == 1, y, z))


def _tri_block_math(tri, o_x, o_y, o_z, d_x, d_y, d_z, t_max,
                    n_tris, n_real, any_hit):
    """Pure-function kernel body: BLOCK rays vs n_tris triangles.

    tri: (T*16,) flat triangle rows [p0(3), p1(3), p2(3), pad...] — an SMEM
    ref inside the Pallas kernel, a plain jnp array in unit tests (the math
    is identical either way, which is how the kernel is tested on CPU
    without relying on Pallas interpret mode).
    n_real: count of real (non-padding) triangles — padding rows are masked
    by index, NOT by degeneracy: all-zero vertices only give det == 0 under
    exact cancellation, and XLA's FMA contraction makes x1*y2 - y1*x2
    epsilon-nonzero, which turned padding rows into spurious hits.
    Returns (t, k(f32 pool index, -1 = miss), b1, b2), each ray-shaped.
    """
    def body(kq, carry):
        # UNROLL independent tests then a tournament merge: a serial
        # test->select chain is latency-bound on the VPU; independent
        # chains expose ILP
        t_best, k_best, b1_best, b2_best, alive = carry
        results = [tri_test(kq * UNROLL + u, t_best) for u in range(UNROLL)]
        while len(results) > 1:
            merged = []
            for a, b in zip(results[::2], results[1::2]):
                ta, ka, b1a, b2a, va = a
                tb, kb, b1b, b2b, vb = b
                bwins = vb & ((tb < ta) | ~va)
                merged.append((jnp.where(bwins, tb, ta),
                               jnp.where(bwins, kb, ka),
                               jnp.where(bwins, b1b, b1a),
                               jnp.where(bwins, b2b, b2a),
                               va | vb))
            results = merged
        t, k, b1, b2, valid = results[0]
        better = valid & (t < t_best) & (alive > 0.0)
        t_best = jnp.where(better, t, t_best)
        k_best = jnp.where(better, k, k_best)
        b1_best = jnp.where(better, b1, b1_best)
        b2_best = jnp.where(better, b2, b2_best)
        if any_hit:
            alive = jnp.where(k_best < 0, alive, 0.0)
        return t_best, k_best, b1_best, b2_best, alive

    def tri_test(k, t_bound):
        base = k * 16
        # SMEM scalar reads (~few cycles each); rows pack [p0, e1, e2]
        # (edges precomputed at pack time). Moeller-Trumbore with a small
        # relative barycentric tolerance: the watertight shear test costs
        # ~45 vector ops/test (the kernel ran exactly vector-op-bound);
        # MT with scalar edges is ~30.
        p0x, p0y, p0z = tri[base], tri[base + 1], tri[base + 2]
        e1x, e1y, e1z = tri[base + 3], tri[base + 4], tri[base + 5]
        e2x, e2y, e2z = tri[base + 6], tri[base + 7], tri[base + 8]
        pvx = d_y * e2z - d_z * e2y
        pvy = d_z * e2x - d_x * e2z
        pvz = d_x * e2y - d_y * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        sgn = jnp.where(det < 0.0, -1.0, 1.0)
        det_a = det * sgn
        tx = o_x - p0x
        ty = o_y - p0y
        tz = o_z - p0z
        u_n = (tx * pvx + ty * pvy + tz * pvz) * sgn
        qvx = ty * e1z - tz * e1y
        qvy = tz * e1x - tx * e1z
        qvz = tx * e1y - ty * e1x
        v_n = (d_x * qvx + d_y * qvy + d_z * qvz) * sgn
        t_n = (e2x * qvx + e2y * qvy + e2z * qvz) * sgn
        # relative tolerance keeps shared edges from cracking under FMA
        # contraction (see git history: exact-zero edge functions are not
        # reproducible across operand orders)
        tol = jnp.float32(1e-6) * det_a
        valid = (det_a > 1e-12) & (u_n >= -tol) & (v_n >= -tol) & \
                (u_n + v_n <= det_a + tol)
        inv_det = 1.0 / jnp.where(det_a == 0.0, 1.0, det_a)
        t = t_n * inv_det
        valid = valid & (t > 1e-6) & (t < t_bound) & (k < n_real)
        return (t, jnp.full_like(t, jnp.float32(k)), u_n * inv_det,
                v_n * inv_det, valid)

    shape = o_x.shape
    init = (t_max,
            jnp.full(shape, -1.0, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.ones(shape, jnp.float32))   # alive as f32 (no i1 carries)
    t_best, k_best, b1_best, b2_best, _ = jax.lax.fori_loop(
        0, n_tris // UNROLL, body, init)
    return t_best, k_best, b1_best, b2_best


def _tri_kernel(tri_ref, ox, oy, oz, dx, dy, dz, tmax_ref,
                t_out, k_out, b1_out, b2_out, *, n_tris, n_real, any_hit):
    """Pallas wrapper: load refs, run the block math, store results."""
    t, k, b1, b2 = _tri_block_math(
        tri_ref, ox[...], oy[...], oz[...], dx[...], dy[...], dz[...],
        tmax_ref[...], n_tris, n_real, any_hit)
    t_out[...] = t
    k_out[...] = k
    b1_out[...] = b1
    b2_out[...] = b2


@functools.partial(jax.jit,
                   static_argnames=("n_tris", "n_real", "any_hit",
                                    "interpret"))
def _run(tri_flat, ox, oy, oz, dx, dy, dz, tmax, n_tris, n_real, any_hit,
         interpret=False):
    nb = ox.shape[0] // BLOCK_ROWS
    # index maps get the scalar-prefetch ref as an extra arg
    ray_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i, tri: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((BLOCK_ROWS, LANES), lambda i, tri: (i, 0),
                              memory_space=pltpu.VMEM)] * 4
    out_shape = [jax.ShapeDtypeStruct(ox.shape, jnp.float32)] * 4
    kern = functools.partial(_tri_kernel, n_tris=n_tris, n_real=n_real,
                             any_hit=any_hit)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,      # tri_flat -> SMEM
        grid=(nb,),
        in_specs=[ray_spec] * 7,
        out_specs=out_specs,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(tri_flat, ox, oy, oz, dx, dy, dz, tmax)


def pad_triangles(tri_geo):
    """(T, 10) packed triangle rows -> (T, 16) f32 flat: [p0, e1, e2, pad]
    with EDGES precomputed (saves the two per-test vertex subtractions).

    Accepts device or host arrays. The pool index IS the brute-force prim
    id (original order); padding rows are masked by index in the kernel."""
    t = np.asarray(tri_geo, np.float32)
    T = -(-t.shape[0] // UNROLL) * UNROLL
    out = np.zeros((T, 16), np.float32)
    out[:t.shape[0], 0:3] = t[:, 0:3]
    out[:t.shape[0], 3:6] = t[:, 3:6] - t[:, 0:3]
    out[:t.shape[0], 6:9] = t[:, 6:9] - t[:, 0:3]
    return jnp.asarray(out.reshape(-1))  # flat for SMEM scalar prefetch


def brute_force_intersect(tri_pad, o, d, t_max, n_real=None, any_hit=False,
                          interpret=None):
    """Closest-hit (or any-hit) of rays vs ALL triangles, Pallas kernel.

    tri_pad: (T*16,) flat from pad_triangles; o, d: (N, 3); t_max: (N,);
    n_real: real triangle count (defaults to the padded count — only safe
    if the caller knows no padding rows exist).
    Returns dict(hit, t, prim, b0, b1, b2) matching
    ops/bvh.brute_force_intersect_triangles (prim in pool order).
    """
    N = o.shape[0]
    n_pad = -(-N // BLOCK) * BLOCK
    rows = n_pad // LANES

    def prep(v, fill):
        v = jnp.concatenate([v, jnp.full((n_pad - N,), fill, v.dtype)]) \
            if n_pad != N else v
        return v.reshape(rows, LANES)

    ox, oy, oz = (prep(o[:, i], 0.0) for i in range(3))
    dx, dy, dz = (prep(d[:, i], 1.0) for i in range(3))
    tm = prep(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,)), -1.0)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_pool = int(tri_pad.shape[0]) // 16
    if n_real is None:
        n_real = n_pool
    t, kf, b1, b2 = _run(tri_pad, ox, oy, oz, dx, dy, dz, tm,
                         n_pool, int(n_real), bool(any_hit),
                         interpret=bool(interpret))
    t = t.reshape(-1)[:N]
    kf = kf.reshape(-1)[:N]
    b1 = b1.reshape(-1)[:N]
    b2 = b2.reshape(-1)[:N]
    prim = kf.astype(jnp.int32)
    hit = prim >= 0
    return dict(hit=hit, t=jnp.where(hit, t, jnp.inf), prim=prim,
                b0=1.0 - b1 - b2, b1=b1, b2=b2)
