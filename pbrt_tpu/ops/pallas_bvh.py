"""Pallas TPU packet BVH traversal.

The XLA while-loop traversal (ops/bvh.py) gives every ray its own stack:
each iteration costs per-lane gathers of node+triangle rows plus (N, 40)
stack scatter updates, and the loop runs until the WORST lane exhausts —
measured at ~0.04 Mray/s on a 1.3k-triangle scene. This kernel flips the
layout: a BLOCK of rays (8 x 128) shares ONE scalar stack in SMEM, so a
node visit is a handful of scalar loads broadcast against vector ray data
— no per-lane gathers at all (the same trick that makes the brute-force
kernel run at ~80 Mray/s). The block traverses the union of its rays'
subtrees, so upstream ray SORTING by direction octant + origin Morton code
(scene_core.intersect) keeps blocks coherent.

Node rows are ops/bvh.py's packed (Nn, 8) layout (value-encoded ints);
triangles are (T, 16)-padded rows with the original id in column 9.
Both live in VMEM (limit ~200k triangles; larger scenes fall back to the
XLA traversal).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from .tlas import INST_COLS as INST_STRIDE


LANES = 128
BLOCK_ROWS = 8
BLOCK = BLOCK_ROWS * LANES
STACK = 64
MAX_LEAF = 4  # ops/bvh.MAX_LEAF_PRIMS
RETURN_TOKEN = -1  # two-level stack token (ops/tlas.py convention)


def _traverse_block(read_node, read_tri, stack_set, stack_get,
                    o_x, o_y, o_z, d_x, d_y, d_z, t_max, any_hit):
    """Packet traversal body, expressed over callbacks so the SAME code
    runs as a Pallas kernel (refs) and as a pure jnp function (arrays) for
    CPU testing.

    read_node(i) -> 8 scalars; read_tri(i) -> 10 scalars;
    stack_set(stack_state, sp, val) -> stack_state;
    stack_get(stack_state, sp) -> scalar.
    """
    inv_dx = 1.0 / jnp.where(d_x == 0.0, 1e-20, d_x)
    inv_dy = 1.0 / jnp.where(d_y == 0.0, 1e-20, d_y)
    inv_dz = 1.0 / jnp.where(d_z == 0.0, 1e-20, d_z)

    # block-majority direction signs for near/far ordering (correctness
    # does not depend on the choice; only traversal order does)
    sgn_x = jnp.sum(d_x) < 0
    sgn_y = jnp.sum(d_y) < 0
    sgn_z = jnp.sum(d_z) < 0

    shape = o_x.shape
    t_best0 = t_max
    prim0 = jnp.full(shape, -1.0, jnp.float32)
    b10 = jnp.zeros(shape, jnp.float32)
    b20 = jnp.zeros(shape, jnp.float32)

    def tri_test(k, t_bound):
        (p0x, p0y, p0z, p1x, p1y, p1z, p2x, p2y, p2z, tid) = read_tri(k)
        # Moeller-Trumbore with per-triangle scalar edges (cheaper than the
        # watertight shear here because all triangle data is scalar)
        e1x, e1y, e1z = p1x - p0x, p1y - p0y, p1z - p0z
        e2x, e2y, e2z = p2x - p0x, p2y - p0y, p2z - p0z
        # pvec = d x e2 (vector x scalar-edge)
        pvx = d_y * e2z - d_z * e2y
        pvy = d_z * e2x - d_x * e2z
        pvz = d_x * e2y - d_y * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        s = jnp.where(det < 0.0, -1.0, 1.0)
        det_a = det * s
        tx, ty, tz = o_x - p0x, o_y - p0y, o_z - p0z
        u_n = (tx * pvx + ty * pvy + tz * pvz) * s
        qvx = ty * e1z - tz * e1y
        qvy = tz * e1x - tx * e1z
        qvz = tx * e1y - ty * e1x
        v_n = (d_x * qvx + d_y * qvy + d_z * qvz) * s
        t_n = (e2x * qvx + e2y * qvy + e2z * qvz) * s
        valid = (det_a > 1e-12) & (u_n >= 0.0) & (v_n >= 0.0) & \
            (u_n + v_n <= det_a)
        inv_det = 1.0 / jnp.where(det_a == 0.0, 1.0, det_a)
        t = t_n * inv_det
        valid = valid & (t > 1e-5) & (t < t_bound)
        return t, u_n * inv_det, v_n * inv_det, valid, tid

    def body(carry):
        sp, cur, stack_state, t_best, prim, b1, b2 = carry
        (lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, roff_f, meta_f) = \
            read_node(cur)
        roff = jnp.round(roff_f).astype(jnp.int32)
        meta = jnp.round(meta_f).astype(jnp.int32)
        nprim = meta >> 2
        axis = meta & 3
        is_leaf = nprim > 0
        # slab test (vector) bounded by per-lane t_best
        tx0 = (lo_x - o_x) * inv_dx
        tx1 = (hi_x - o_x) * inv_dx
        ty0 = (lo_y - o_y) * inv_dy
        ty1 = (hi_y - o_y) * inv_dy
        tz0 = (lo_z - o_z) * inv_dz
        tz1 = (hi_z - o_z) * inv_dz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                       jnp.minimum(ty0, ty1)),
                           jnp.maximum(jnp.minimum(tz0, tz1), 0.0))
        tmax_b = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                         jnp.maximum(ty0, ty1)),
                             jnp.minimum(jnp.maximum(tz0, tz1), t_best))
        live = prim < 0.0 if any_hit else jnp.ones(shape, bool)
        box_hit = (tmin <= tmax_b * 1.0000004) & live
        any_box = jnp.any(box_hit)

        # --- leaf: rolled triangle loop (scalar triangle data; fori_loop
        # keeps Mosaic code size down — compile time, not speed, is the
        # constraint here) ---
        def leaf_body(k, args):
            t_best, prim, b1, b2 = args
            t, bu, bv, valid, tid = tri_test(roff + k, t_best)
            ok = valid & box_hit & (k < nprim)
            better = ok & (t < t_best)
            t_best = jnp.where(better, t, t_best)
            prim = jnp.where(better, tid, prim)
            b1 = jnp.where(better, bu, b1)
            b2 = jnp.where(better, bv, b2)
            return t_best, prim, b1, b2

        def do_leaf(args):
            return jax.lax.fori_loop(0, jnp.minimum(nprim, MAX_LEAF),
                                     leaf_body, args)

        leaf_now = any_box & is_leaf
        t_best, prim, b1, b2 = jax.lax.cond(
            leaf_now, do_leaf, lambda a: a, (t_best, prim, b1, b2))

        # --- control: descend / push / pop (all scalar) ---
        neg = jnp.where(axis == 0, sgn_x, jnp.where(axis == 1, sgn_y,
                                                    sgn_z))
        near = jnp.where(neg, roff, cur + 1)
        far = jnp.where(neg, cur + 1, roff)
        descend = any_box & ~is_leaf
        stack_state = stack_set(stack_state, sp, far, descend)
        sp = jnp.where(descend, sp + 1, sp)
        # early out for any-hit blocks whose lanes all found occlusion
        done_early = any_hit and jnp.all(prim >= 0.0)
        do_pop = ~descend
        sp_pop = jnp.maximum(sp - 1, 0)
        popped = stack_get(stack_state, sp_pop)
        cur = jnp.where(descend, near,
                        jnp.where(sp > 0, popped, -1))
        cur = jnp.where(done_early, -1, cur) if any_hit else cur
        sp = jnp.where(do_pop, sp_pop, sp)
        return sp, cur, stack_state, t_best, prim, b1, b2

    def cond(carry):
        return carry[1] >= 0

    sp0 = jnp.int32(0)
    cur0 = jnp.int32(0)
    return cond, body, (sp0, cur0), (t_best0, prim0, b10, b20)


def _bvh_kernel(nodes_ref, tris_ref, ox, oy, oz, dx, dy, dz, tmax_ref,
                t_out, k_out, b1_out, b2_out, stack_ref, *, n_nodes,
                n_tris, any_hit):
    def read_node(i):
        # nodes live FLAT in SMEM (scalar prefetch): 2-D VMEM storage would
        # pad the 8-float rows to 128 lanes (16x waste - the source of the
        # 21.6MB scoped-vmem OOM); SMEM scalar loads are also ~20x cheaper
        base = jnp.clip(i, 0, n_nodes - 1) * 8
        return tuple(nodes_ref[base + k] for k in range(8))

    def read_tri(i):
        # tris are packed DENSE: 8 triangles (16 floats each) per 128-lane
        # row — a (T, 16) VMEM array would be lane-padded to (T, 128), 8x
        # the memory. One (1, 128) row load + an 8-way static-offset
        # switch extracts the triangle's 10 scalars.
        i = jnp.clip(i, 0, n_tris - 1)
        row = tris_ref[pl.ds(i >> 3, 1), :]      # (1, 128)
        o8 = i & 7

        def mk(off):
            return lambda: tuple(row[0, off * 16 + k] for k in range(10))

        return jax.lax.switch(o8, [mk(off) for off in range(8)])

    def stack_set(state, sp, val, do):
        @pl.when(do)
        def _():
            stack_ref[jnp.clip(sp, 0, STACK - 1)] = val
        return state

    def stack_get(state, sp):
        return stack_ref[jnp.clip(sp, 0, STACK - 1)]

    cond, body, scal0, vec0 = _traverse_block(
        read_node, read_tri, stack_set, stack_get,
        ox[...], oy[...], oz[...], dx[...], dy[...], dz[...],
        tmax_ref[...], any_hit)
    carry = (scal0[0], scal0[1], jnp.int32(0)) + vec0
    carry = jax.lax.while_loop(lambda c: c[1] >= 0, body_adapter(body),
                               carry)
    _, _, _, t, k, b1, b2 = carry
    t_out[...] = t
    k_out[...] = k
    b1_out[...] = b1
    b2_out[...] = b2


def body_adapter(body):
    def run(c):
        sp, cur, st, t, p, b1, b2 = c
        sp, cur, st, t, p, b1, b2 = body((sp, cur, st, t, p, b1, b2))
        return sp, cur, st, t, p, b1, b2
    return run


@functools.partial(jax.jit,
                   static_argnames=("n_nodes", "n_tris", "any_hit"))
def _run(nodes_flat, tris, ox, oy, oz, dx, dy, dz, tmax, n_nodes, n_tris,
         any_hit):
    nb = ox.shape[0] // BLOCK_ROWS
    ray_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i, nf: (i, 0))
    out_specs = [pl.BlockSpec((BLOCK_ROWS, LANES),
                              lambda i, nf: (i, 0))] * 4
    out_shape = [jax.ShapeDtypeStruct(ox.shape, jnp.float32)] * 4
    kern = functools.partial(_bvh_kernel, n_nodes=n_nodes,
                             n_tris=n_tris, any_hit=any_hit)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # nodes_flat -> SMEM
        grid=(nb,),
        in_specs=[pl.BlockSpec(tris.shape, lambda i, nf: (0, 0),
                               memory_space=pltpu.VMEM)] + [ray_spec] * 7,
        out_specs=out_specs,
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(nodes_flat, tris, ox, oy, oz, dx, dy, dz, tmax)


def pad_tris_for_bvh(tri_geo_bvh):
    """(T, 10) BVH-ordered triangle rows -> (ceil(T/8), 128) f32 DENSE
    pack (8 triangles x 16 floats per 128-lane row)."""
    t = np.asarray(tri_geo_bvh, np.float32)
    T8 = -(-t.shape[0] // 8) * 8
    out = np.zeros((T8, 16), np.float32)
    out[:t.shape[0], :10] = t
    return jnp.asarray(out.reshape(T8 // 8, 128))


# max rays per pallas_call: mixing full-array VMEM operands (nodes/tris)
# with blocked ray operands makes Mosaic stage ALL operands in VMEM, so
# each call must fit; an outer lax.map covers larger waves.
CHUNK = 16384


def bvh_intersect(nodes, tris16, o, d, t_max, any_hit=False):
    """Packet-BVH closest/any hit. nodes: (Nn, 8); tris16: (T, 16) from
    pad_tris_for_bvh; o, d: (N, 3); t_max: (N,).
    Returns dict(hit, t, prim (ORIGINAL id), b0, b1, b2)."""
    N = o.shape[0]
    n_pad = -(-N // CHUNK) * CHUNK
    rows_all = n_pad // LANES

    def prep(v, fill):
        v = jnp.concatenate([v, jnp.full((n_pad - N,), fill, v.dtype)]) \
            if n_pad != N else v
        return v.reshape(n_pad // CHUNK, CHUNK // LANES, LANES)

    ox, oy, oz = (prep(o[:, i], 1e9) for i in range(3))
    dx, dy, dz = (prep(d[:, i], 1.0) for i in range(3))
    tm = prep(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,)), -1.0)

    nodes_flat = nodes.reshape(-1)
    n_nodes = nodes.shape[0]
    n_tris = tris16.shape[0] * 8

    def one(chunk):
        cox, coy, coz, cdx, cdy, cdz, ctm = chunk
        return _run(nodes_flat, tris16, cox, coy, coz, cdx, cdy, cdz, ctm,
                    n_nodes, n_tris, bool(any_hit))

    t, kf, b1, b2 = jax.lax.map(one, (ox, oy, oz, dx, dy, dz, tm))
    t = t.reshape(-1)[:N]
    kf = kf.reshape(-1)[:N]
    b1 = b1.reshape(-1)[:N]
    b2 = b2.reshape(-1)[:N]
    prim = jnp.round(kf).astype(jnp.int32)
    hit = prim >= 0
    return dict(hit=hit, t=jnp.where(hit, t, jnp.inf), prim=prim,
                b0=1.0 - b1 - b2, b1=b1, b2=b2)


# ---------------------------------------------------------------------------
# Pure-jnp reference of the SAME traversal for CPU tests (arrays instead of
# refs; the Pallas kernel is exercised on real TPU by bench/golden runs).

def traverse_reference(nodes, tris16, o, d, t_max, any_hit=False):
    nodes = jnp.asarray(nodes)
    # dense (R, 128) pack -> (R*8, 16) rows for plain indexing
    tris = jnp.asarray(tris16).reshape(-1, 16)

    def read_node(i):
        row = nodes[jnp.clip(i, 0, nodes.shape[0] - 1)]
        return tuple(row[k] for k in range(8))

    def read_tri(i):
        row = tris[jnp.clip(i, 0, tris.shape[0] - 1)]
        return tuple(row[k] for k in range(10))

    def stack_set(state, sp, val, do):
        return jax.lax.cond(
            do, lambda s: s.at[jnp.clip(sp, 0, STACK - 1)].set(val),
            lambda s: s, state)

    def stack_get(state, sp):
        return state[jnp.clip(sp, 0, STACK - 1)]

    N = o.shape[0]
    cond, body, scal0, vec0 = _traverse_block(
        read_node, read_tri, stack_set, stack_get,
        o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,)), any_hit)
    stack0 = jnp.zeros((STACK,), jnp.int32)
    carry = (scal0[0], scal0[1], stack0) + vec0
    carry = jax.lax.while_loop(lambda c: c[1] >= 0, body_adapter(body),
                               carry)
    _, _, _, t, kf, b1, b2 = carry
    prim = jnp.round(kf).astype(jnp.int32)
    hit = prim >= 0
    return dict(hit=hit, t=jnp.where(hit, t, jnp.inf), prim=prim,
                b0=1.0 - b1 - b2, b1=b1, b2=b2)


# ---------------------------------------------------------------------------
# Two-level (instanced) packet traversal: the TLAS/BLAS state machine of
# ops/tlas.py expressed in the same block-shared-stack form. An instance
# ENTER transforms the WHOLE block's rays by the (scalar-broadcast) w2o —
# per-lane transforms only arise for animated instances, which fall back
# to the XLA path.

def _traverse_two_level(read_node, read_inst, read_tri, stack_set,
                        stack_get, o_x, o_y, o_z, d_x, d_y, d_z, t_max,
                        tlas_root, any_hit):
    shape = o_x.shape
    sgn_x = jnp.sum(d_x) < 0
    sgn_y = jnp.sum(d_y) < 0
    sgn_z = jnp.sum(d_z) < 0

    t_best0 = t_max
    prim0 = jnp.full(shape, -1.0, jnp.float32)
    b10 = jnp.zeros(shape, jnp.float32)
    b20 = jnp.zeros(shape, jnp.float32)
    inst0 = jnp.full(shape, -1.0, jnp.float32)

    def tri_test(k, t_bound, co_x, co_y, co_z, cd_x, cd_y, cd_z):
        (p0x, p0y, p0z, p1x, p1y, p1z, p2x, p2y, p2z, tid) = read_tri(k)
        e1x, e1y, e1z = p1x - p0x, p1y - p0y, p1z - p0z
        e2x, e2y, e2z = p2x - p0x, p2y - p0y, p2z - p0z
        pvx = cd_y * e2z - cd_z * e2y
        pvy = cd_z * e2x - cd_x * e2z
        pvz = cd_x * e2y - cd_y * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        s = jnp.where(det < 0.0, -1.0, 1.0)
        det_a = det * s
        tx, ty, tz = co_x - p0x, co_y - p0y, co_z - p0z
        u_n = (tx * pvx + ty * pvy + tz * pvz) * s
        qvx = ty * e1z - tz * e1y
        qvy = tz * e1x - tx * e1z
        qvz = tx * e1y - ty * e1x
        v_n = (cd_x * qvx + cd_y * qvy + cd_z * qvz) * s
        t_n = (e2x * qvx + e2y * qvy + e2z * qvz) * s
        valid = (det_a > 1e-12) & (u_n >= 0.0) & (v_n >= 0.0) & \
            (u_n + v_n <= det_a)
        inv_det = 1.0 / jnp.where(det_a == 0.0, 1.0, det_a)
        t = t_n * inv_det
        valid = valid & (t > 1e-5) & (t < t_bound)
        return t, u_n * inv_det, v_n * inv_det, valid, tid

    def body(carry):
        (sp, cur, cur_inst, st, cox, coy, coz, cdx, cdy, cdz,
         t_best, prim, b1, b2, ibest) = carry
        inv_dx = 1.0 / jnp.where(cdx == 0.0, 1e-20, cdx)
        inv_dy = 1.0 / jnp.where(cdy == 0.0, 1e-20, cdy)
        inv_dz = 1.0 / jnp.where(cdz == 0.0, 1e-20, cdz)
        (lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, roff_f, meta_f) = \
            read_node(cur)
        roff = jnp.round(roff_f).astype(jnp.int32)
        meta = jnp.round(meta_f).astype(jnp.int32)
        nprim = meta >> 2
        axis = meta & 3
        is_leaf = nprim > 0
        in_tlas = cur >= tlas_root
        tx0 = (lo_x - cox) * inv_dx
        tx1 = (hi_x - cox) * inv_dx
        ty0 = (lo_y - coy) * inv_dy
        ty1 = (hi_y - coy) * inv_dy
        tz0 = (lo_z - coz) * inv_dz
        tz1 = (hi_z - coz) * inv_dz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                       jnp.minimum(ty0, ty1)),
                           jnp.maximum(jnp.minimum(tz0, tz1), 0.0))
        tmax_b = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                         jnp.maximum(ty0, ty1)),
                             jnp.minimum(jnp.maximum(tz0, tz1), t_best))
        live = prim < 0.0 if any_hit else jnp.ones(shape, bool)
        box_hit = (tmin <= tmax_b * 1.0000004) & live
        any_box = jnp.any(box_hit)

        # BLAS leaf: triangle tests in current space
        def leaf_body(k, args):
            t_best, prim, b1, b2, ibest = args
            t, bu, bv, valid, tid = tri_test(roff + k, t_best,
                                             cox, coy, coz, cdx, cdy, cdz)
            ok = valid & box_hit & (k < nprim)
            better = ok & (t < t_best)
            t_best = jnp.where(better, t, t_best)
            prim = jnp.where(better, tid, prim)
            b1 = jnp.where(better, bu, b1)
            b2 = jnp.where(better, bv, b2)
            ibest = jnp.where(better, cur_inst.astype(jnp.float32), ibest)
            return t_best, prim, b1, b2, ibest

        leaf_tri = any_box & is_leaf & ~in_tlas
        t_best, prim, b1, b2, ibest = jax.lax.cond(
            leaf_tri,
            lambda a: jax.lax.fori_loop(0, jnp.minimum(nprim, MAX_LEAF),
                                        leaf_body, a),
            lambda a: a, (t_best, prim, b1, b2, ibest))

        # TLAS leaf: push ENTER tokens
        def push_inst(k, args):
            sp, st = args
            st = stack_set(st, sp, -2 - (roff + k), True)
            return sp + 1, st

        leaf_inst = any_box & is_leaf & in_tlas

        def do_push_inst(args):
            return jax.lax.fori_loop(0, jnp.minimum(nprim, MAX_LEAF),
                                     push_inst, args)

        sp, st = jax.lax.cond(leaf_inst, do_push_inst, lambda a: a,
                              (sp, st))

        # interior: descend near, push far
        neg = jnp.where(axis == 0, sgn_x, jnp.where(axis == 1, sgn_y,
                                                    sgn_z))
        near = jnp.where(neg, roff, cur + 1)
        far = jnp.where(neg, cur + 1, roff)
        descend = any_box & ~is_leaf
        st = stack_set(st, sp, far, descend)
        sp = jnp.where(descend, sp + 1, sp)

        # pop with ENTER/RETURN handling
        do_pop = ~descend
        sp_pop = jnp.maximum(sp - 1, 0)
        tok = stack_get(st, sp_pop)
        popped_valid = do_pop & (sp > 0)
        sp = jnp.where(do_pop, sp_pop, sp)
        # RETURN: restore world rays, pop again
        is_ret = popped_valid & (tok == RETURN_TOKEN)
        cox = jnp.where(is_ret, o_x, cox)
        coy = jnp.where(is_ret, o_y, coy)
        coz = jnp.where(is_ret, o_z, coz)
        cdx = jnp.where(is_ret, d_x, cdx)
        cdy = jnp.where(is_ret, d_y, cdy)
        cdz = jnp.where(is_ret, d_z, cdz)
        cur_inst = jnp.where(is_ret, -1, cur_inst)
        sp_pop2 = jnp.maximum(sp - 1, 0)
        tok2 = stack_get(st, sp_pop2)
        pop2_valid = is_ret & (sp > 0)
        tok = jnp.where(pop2_valid, tok2, tok)
        sp = jnp.where(is_ret, sp_pop2, sp)
        valid_tok = jnp.where(is_ret, pop2_valid, popped_valid)
        # ENTER: broadcast-transform the block into the instance space
        is_enter = valid_tok & (tok <= -2)
        ii = -2 - tok
        (a00, a01, a02, a03, a10, a11, a12, a13, a20, a21, a22, a23,
         proto_root, inst_id) = read_inst(jnp.maximum(ii, 0))
        ox2 = a00 * o_x + a01 * o_y + a02 * o_z + a03
        oy2 = a10 * o_x + a11 * o_y + a12 * o_z + a13
        oz2 = a20 * o_x + a21 * o_y + a22 * o_z + a23
        dx2 = a00 * d_x + a01 * d_y + a02 * d_z
        dy2 = a10 * d_x + a11 * d_y + a12 * d_z
        dz2 = a20 * d_x + a21 * d_y + a22 * d_z
        cox = jnp.where(is_enter, ox2, cox)
        coy = jnp.where(is_enter, oy2, coy)
        coz = jnp.where(is_enter, oz2, coz)
        cdx = jnp.where(is_enter, dx2, cdx)
        cdy = jnp.where(is_enter, dy2, cdy)
        cdz = jnp.where(is_enter, dz2, cdz)
        cur_inst = jnp.where(is_enter,
                             jnp.round(inst_id).astype(jnp.int32),
                             cur_inst)
        st = stack_set(st, sp, RETURN_TOKEN, is_enter)
        sp = jnp.where(is_enter, sp + 1, sp)
        # next node
        is_node = valid_tok & (tok >= 0)
        cur = jnp.where(descend, near,
              jnp.where(is_enter, jnp.round(proto_root).astype(jnp.int32),
              jnp.where(is_node, tok, -1)))
        if any_hit:
            cur = jnp.where(jnp.all(prim >= 0.0), -1, cur)
        return (sp, cur, cur_inst, st, cox, coy, coz, cdx, cdy, cdz,
                t_best, prim, b1, b2, ibest)

    init_scal = (jnp.int32(0), jnp.int32(tlas_root), jnp.int32(-1))
    init_vec = (o_x, o_y, o_z, d_x, d_y, d_z,
                t_best0, prim0, b10, b20, inst0)
    return body, init_scal, init_vec


def _bvh2_kernel(nodes_ref, insts_ref, tris_ref, ox, oy, oz, dx, dy, dz,
                 tmax_ref, t_out, k_out, b1_out, b2_out, i_out, stack_ref,
                 *, n_nodes, n_insts, n_tris, tlas_root, any_hit):
    def read_node(i):
        base = jnp.clip(i, 0, n_nodes - 1) * 8
        return tuple(nodes_ref[base + k] for k in range(8))

    def read_inst(i):
        base = jnp.clip(i, 0, n_insts - 1) * INST_STRIDE
        vals = tuple(insts_ref[base + k] for k in range(12))  # w2o
        return vals + (insts_ref[base + 24], insts_ref[base + 25])

    def read_tri(i):
        i = jnp.clip(i, 0, n_tris - 1)
        row = tris_ref[pl.ds(i >> 3, 1), :]
        o8 = i & 7

        def mk(off):
            return lambda: tuple(row[0, off * 16 + k] for k in range(10))

        return jax.lax.switch(o8, [mk(off) for off in range(8)])

    def stack_set(state, sp, val, do):
        @pl.when(do)
        def _():
            stack_ref[jnp.clip(sp, 0, STACK - 1)] = val
        return state

    def stack_get(state, sp):
        return stack_ref[jnp.clip(sp, 0, STACK - 1)]

    body, scal0, vec0 = _traverse_two_level(
        read_node, read_inst, read_tri, stack_set, stack_get,
        ox[...], oy[...], oz[...], dx[...], dy[...], dz[...],
        tmax_ref[...], tlas_root, any_hit)
    carry = (scal0[0], scal0[1], scal0[2], jnp.int32(0)) + vec0
    carry = jax.lax.while_loop(lambda c: c[1] >= 0, _adapter2(body), carry)
    t, prim, b1, b2, ibest = carry[10], carry[11], carry[12], carry[13], \
        carry[14]
    t_out[...] = t
    k_out[...] = prim
    b1_out[...] = b1
    b2_out[...] = b2
    i_out[...] = ibest


def _adapter2(body):
    def run(c):
        return body(c)
    return run


@functools.partial(jax.jit, static_argnames=("n_nodes", "n_insts",
                                             "n_tris", "tlas_root",
                                             "any_hit"))
def _run2(nodes_flat, insts_flat, tris, ox, oy, oz, dx, dy, dz, tmax,
          n_nodes, n_insts, n_tris, tlas_root, any_hit):
    nb = ox.shape[0] // BLOCK_ROWS
    ray_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i, nf, inf: (i, 0))
    out_specs = [pl.BlockSpec((BLOCK_ROWS, LANES),
                              lambda i, nf, inf: (i, 0))] * 5
    out_shape = [jax.ShapeDtypeStruct(ox.shape, jnp.float32)] * 5
    kern = functools.partial(_bvh2_kernel, n_nodes=n_nodes,
                             n_insts=n_insts, n_tris=n_tris,
                             tlas_root=tlas_root, any_hit=any_hit)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # nodes + instances -> SMEM
        grid=(nb,),
        in_specs=[pl.BlockSpec(tris.shape, lambda i, nf, inf: (0, 0),
                               memory_space=pltpu.VMEM)] + [ray_spec] * 7,
        out_specs=out_specs,
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(nodes_flat, insts_flat, tris, ox, oy, oz, dx, dy, dz, tmax)


def two_level_intersect_pallas(nodes_all, inst_rows, tris16_dense,
                               tlas_root, o, d, t_max, any_hit=False):
    """Packet two-level traversal. Mirrors ops/tlas.two_level_intersect's
    returns (hit, t, prim, b0, b1, b2, inst). Static instances only."""
    N = o.shape[0]
    n_pad = -(-N // CHUNK) * CHUNK

    def prep(v, fill):
        v = jnp.concatenate([v, jnp.full((n_pad - N,), fill, v.dtype)]) \
            if n_pad != N else v
        return v.reshape(n_pad // CHUNK, CHUNK // LANES, LANES)

    ox, oy, oz = (prep(o[:, i], 1e9) for i in range(3))
    dx, dy, dz = (prep(d[:, i], 1.0) for i in range(3))
    tm = prep(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,)), -1.0)
    nodes_flat = jnp.asarray(nodes_all).reshape(-1)
    insts_flat = jnp.asarray(inst_rows).reshape(-1)
    n_nodes = nodes_all.shape[0]
    n_insts = inst_rows.shape[0]
    n_tris = tris16_dense.shape[0] * 8

    def one(chunk):
        cox, coy, coz, cdx, cdy, cdz, ctm = chunk
        return _run2(nodes_flat, insts_flat, tris16_dense, cox, coy, coz,
                     cdx, cdy, cdz, ctm, n_nodes, n_insts, n_tris,
                     int(tlas_root), bool(any_hit))

    t, kf, b1, b2, inf = jax.lax.map(one, (ox, oy, oz, dx, dy, dz, tm))
    t = t.reshape(-1)[:N]
    kf = kf.reshape(-1)[:N]
    b1 = b1.reshape(-1)[:N]
    b2 = b2.reshape(-1)[:N]
    inf = inf.reshape(-1)[:N]
    prim = jnp.round(kf).astype(jnp.int32)
    hit = prim >= 0
    return dict(hit=hit, t=jnp.where(hit, t, jnp.inf), prim=prim,
                b0=1.0 - b1 - b2, b1=b1, b2=b2,
                inst=jnp.round(inf).astype(jnp.int32))


def two_level_reference(nodes_all, inst_rows, tris16_dense, tlas_root,
                        o, d, t_max, any_hit=False):
    """Pure-jnp twin of the packet two-level traversal for CPU tests."""
    nodes = jnp.asarray(nodes_all).reshape(-1)
    insts = jnp.asarray(inst_rows).reshape(-1)
    tris = jnp.asarray(tris16_dense).reshape(-1, 16)

    def read_node(i):
        base = jnp.clip(i, 0, nodes.shape[0] // 8 - 1) * 8
        return tuple(nodes[base + k] for k in range(8))

    def read_inst(i):
        base = jnp.clip(i, 0, insts.shape[0] // INST_STRIDE - 1) \
            * INST_STRIDE
        vals = tuple(insts[base + k] for k in range(12))
        return vals + (insts[base + 24], insts[base + 25])

    def read_tri(i):
        row = tris[jnp.clip(i, 0, tris.shape[0] - 1)]
        return tuple(row[k] for k in range(10))

    def stack_set(state, sp, val, do):
        return jax.lax.cond(
            do, lambda s: s.at[jnp.clip(sp, 0, STACK - 1)].set(val),
            lambda s: s, state)

    def stack_get(state, sp):
        return state[jnp.clip(sp, 0, STACK - 1)]

    N = o.shape[0]
    body, scal0, vec0 = _traverse_two_level(
        read_node, read_inst, read_tri, stack_set, stack_get,
        o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,)), tlas_root,
        any_hit)
    carry = (scal0[0], scal0[1], scal0[2],
             jnp.zeros((STACK,), jnp.int32)) + vec0
    carry = jax.lax.while_loop(lambda c: c[1] >= 0, _adapter2(body), carry)
    t, prim, b1, b2, inf = carry[10], carry[11], carry[12], carry[13], \
        carry[14]
    prim = jnp.round(prim).astype(jnp.int32)
    hit = prim >= 0
    return dict(hit=hit, t=jnp.where(hit, t, jnp.inf), prim=prim,
                b0=1.0 - b1 - b2, b1=b1, b2=b2,
                inst=jnp.round(inf).astype(jnp.int32))
