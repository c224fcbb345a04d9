"""Pallas TPU 8-wide packet BVH traversal (round-3 rewrite).

Round 2's packet kernel (ops/pallas_bvh.py) visited ONE binary node per
`while_loop` iteration and measured ~590 cycles/visit: the cost was not the
vector->scalar `any()` reduction itself (microbenched at ~15 cycles when
pipelined) but the `lax.cond` leaf branches over vector carries, the
lane-extract triangle reads from VMEM rows, and the one-node-at-a-time
serialization. This kernel restructures the traversal around what the VPU
and the scalar unit actually do well:

- **8-wide BVH** (binary SAH tree collapsed on host): one visit tests 8
  child slabs back-to-back — 8 *independent* `any()` reductions pipeline
  where a serial visit chain cannot.
- **No lax.cond**: leaves are processed inline under `pl.when` with the
  hit state carried through a `fori_loop` (functional carries; refs written
  once per leaf), interior children are pushed with predicated SMEM writes.
- **All scene data scalar-side**: nodes AND triangles live flat in the
  scalar-prefetch space; every broadcast against the (8, 128) ray block is
  a scalar load, never a vector lane extract.
- **Front-to-back**: children are pre-sorted along the node's dominant
  axis at build time; the kernel pushes them in reverse majority-sign
  order so the near child pops first and tightens per-lane t_best.

Reference semantics: cpu/aggregates.cpp:529-579 (closest/any hit over a
flattened BVH with ordered descent); the wide-node layout plays the role
of the OptiX device BVH (gpu/optix/aggregate.cpp:343).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 8    # Mosaic requires block dims divisible by (8, 128); a
                  # 4-row sweep result in round 4 turned out to be a jit
                  # cache artifact (module constants don't re-key jit)
BLOCK = BLOCK_ROWS * LANES
WIDTH = 8                 # children per node
NODE_F = WIDTH * 8 + 8    # 8 floats per child + [axis, depth-pad x7]
STACK = 96
EMPTY = -1.0              # count slot for empty child
BIG = np.float32(3e38)


# Quantized node layout (round 4; CWBVH-style u8 child boxes): each node
# stores a f32 frame [origin3, scale3, axis, pad] in `nodes_f` (stride
# NF_F, after an 8-float header holding the root union box) and 8 children
# x 3 i32 words in `nodes_q`:
#   w0 = qlo.x | qlo.y<<8 | qlo.z<<16 | cnt<<24   (cnt: 0 interior,
#        1..MAX leaf prim count, 255 EMPTY slot)
#   w1 = qhi.x | qhi.y<<8 | qhi.z<<16
#   w2 = first (tri start for leaves / child node index for interiors)
# Dequantized child boxes are CONSERVATIVE (floor/ceil + f32 round-out),
# so the slab test only ever over-includes; the triangle test decides.
# This shrinks a node from 288 B to 128 B, which together with 9-float
# triangles fits ~25k triangles in one SMEM page (was ~13k).
NF_F = 8                  # f32 frame floats per node
NQ_I = WIDTH * 3          # i32 words per node
CNT_EMPTY = 255


@struct.dataclass
class BVH8:
    nodes_f: jnp.ndarray       # (8 + n_nodes * NF_F,) f32: root box + frames
    nodes_q: jnp.ndarray       # (n_nodes * NQ_I,) i32 quantized children
    tris: jnp.ndarray          # (T * 9,) f32 flat [p0, e1, e2]
    prim_indices: jnp.ndarray  # (T,) int32 permutation into original prims
    n_nodes: int = struct.field(pytree_node=False)
    n_tris: int = struct.field(pytree_node=False)
    depth: int = struct.field(pytree_node=False)


def quantize_nodes(node_data: np.ndarray):
    """(n, NODE_F) f32 collapse output -> (nodes_f, nodes_q) quantized
    pair (see layout comment above). Boxes are rounded OUT so the
    dequantized f32 box always contains the exact child box."""
    nd = np.asarray(node_data, np.float64)
    n = nd.shape[0]
    ch = nd[:, :WIDTH * 8].reshape(n, WIDTH, 8)
    lo = ch[:, :, 0:3]
    hi = ch[:, :, 3:6]
    first = np.round(ch[:, :, 6]).astype(np.int64)
    cnt = np.round(ch[:, :, 7]).astype(np.int64)
    empty = cnt < 0
    valid = ~empty
    vlo = np.where(valid[:, :, None], lo, np.inf)
    vhi = np.where(valid[:, :, None], hi, -np.inf)
    origin = vlo.min(axis=1)                       # (n, 3)
    extent = vhi.max(axis=1) - origin
    scale = np.maximum(extent, 1e-20) / 254.0      # headroom for round-out
    rel_lo = (lo - origin[:, None, :]) / scale[:, None, :]
    rel_hi = (hi - origin[:, None, :]) / scale[:, None, :]
    qlo = np.clip(np.floor(rel_lo), 0, 255).astype(np.int64)
    qhi = np.clip(np.ceil(rel_hi), 0, 255).astype(np.int64)
    # f32 round-out: the kernel computes origin + q * scale in f32
    o32 = origin.astype(np.float32)[:, None, :]
    s32 = scale.astype(np.float32)[:, None, :]
    for _ in range(2):
        deq_lo = (o32 + qlo.astype(np.float32) * s32).astype(np.float32)
        qlo = np.where(valid[:, :, None] & (deq_lo > lo), qlo - 1, qlo)
        deq_hi = (o32 + qhi.astype(np.float32) * s32).astype(np.float32)
        qhi = np.where(valid[:, :, None] & (deq_hi < hi), qhi + 1, qhi)
    qlo = np.clip(qlo, 0, 255)
    qhi = np.clip(qhi, 0, 255)
    # empty slots: inverted box + the EMPTY count sentinel
    qlo = np.where(empty[:, :, None], 255, qlo)
    qhi = np.where(empty[:, :, None], 0, qhi)
    cnt = np.where(empty, CNT_EMPTY, cnt)
    w0 = (qlo[:, :, 0] | (qlo[:, :, 1] << 8) | (qlo[:, :, 2] << 16)
          | (cnt << 24))
    w1 = qhi[:, :, 0] | (qhi[:, :, 1] << 8) | (qhi[:, :, 2] << 16)
    nodes_q = np.stack([w0, w1, first], axis=2).astype(np.int64)
    nodes_q = nodes_q.reshape(-1).astype(np.uint32).view(np.int32)
    nodes_f = np.zeros(8 + n * NF_F, np.float32)
    nodes_f[0:3] = nd[0, WIDTH * 8 + 1:WIDTH * 8 + 4]   # root union lo
    nodes_f[3:6] = nd[0, WIDTH * 8 + 4:WIDTH * 8 + 7]   # root union hi
    frames = np.zeros((n, NF_F), np.float32)
    frames[:, 0:3] = origin.astype(np.float32)
    frames[:, 3:6] = scale.astype(np.float32)
    frames[:, 6] = nd[:, WIDTH * 8].astype(np.float32)  # axis
    nodes_f[8:] = frames.reshape(-1)
    return nodes_f, nodes_q


def collapse_to_bvh8(nodes_bin: np.ndarray, max_leaf: int = 8,
                     root: int = 0, prim_base: int = 0):
    """Collapse a flattened binary SAH BVH (ops/bvh.py layout) into 8-wide
    nodes, starting at binary node `root`. Leaf first fields are emitted
    relative to `prim_base` (pass the subtree's DFS prim start to get
    chunk-local indices). Returns (node_data (n, NODE_F) f32, depth).

    Dispatches to the native C++ collapse (native/bvh8_collapse.cpp —
    identical algorithm and output layout; the Python path's per-node
    recursion dominates million-triangle host builds) with this pure-Python
    implementation as the fallback."""
    from .. import native as _native
    res = _native.collapse_bvh8_native(nodes_bin, max_leaf=max_leaf,
                                       root=root, prim_base=prim_base)
    if res is not None:
        node_data, depth = res
        assert depth * (WIDTH - 1) + 1 <= STACK, \
            f"BVH8 depth {depth} overflows the {STACK}-entry traversal stack"
        return node_data, depth
    return _collapse_to_bvh8_py(nodes_bin, max_leaf, root, prim_base)


def _collapse_to_bvh8_py(nodes_bin: np.ndarray, max_leaf: int = 8,
                         root: int = 0, prim_base: int = 0):
    """Pure-Python reference twin of the native collapse.

    Binary subtrees hold CONTIGUOUS primitive ranges in the depth-first
    order, so any subtree with <= max_leaf prims becomes one leaf slot
    spanning [start, start+count)."""
    nb = np.asarray(nodes_bin, np.float64)
    m = nb.shape[0]
    lo = nb[:, 0:3]
    hi = nb[:, 3:6]
    roff = np.round(nb[:, 6]).astype(np.int64)
    meta = np.round(nb[:, 7]).astype(np.int64)
    nprim = meta >> 2
    is_leaf = nprim > 0

    # subtree prim ranges (iterative reverse pass: children follow parents
    # in depth-first order, so a reverse sweep sees children first)
    start = np.zeros(m, np.int64)
    count = np.zeros(m, np.int64)
    for i in range(m - 1, -1, -1):
        if is_leaf[i]:
            start[i] = roff[i]
            count[i] = nprim[i]
        else:
            l, r = i + 1, roff[i]
            start[i] = min(start[l], start[r])
            count[i] = count[l] + count[r]

    area = np.maximum(hi - lo, 0.0)
    area = area[:, 0] * area[:, 1] + area[:, 1] * area[:, 2] + \
        area[:, 2] * area[:, 0]

    out = []            # list of per-node np arrays (NODE_F,)
    max_depth = [0]

    def emit(bin_idx, depth):
        max_depth[0] = max(max_depth[0], depth)
        slots = [bin_idx]
        # expand highest-area expandable slot until 8 slots
        while len(slots) < WIDTH:
            best, best_a = -1, -1.0
            for si, b in enumerate(slots):
                if not is_leaf[b] and count[b] > max_leaf and \
                        area[b] > best_a:
                    best, best_a = si, area[b]
            if best < 0:
                # nothing oversized; expand any interior to flatten more
                for si, b in enumerate(slots):
                    if not is_leaf[b] and len(slots) < WIDTH and \
                            area[b] > best_a:
                        best, best_a = si, area[b]
                if best < 0:
                    break
            b = slots.pop(best)
            slots.insert(best, roff[b])
            slots.insert(best, b + 1)
        # sort children along the dominant axis of their union box
        ulo = np.min([lo[s] for s in slots], axis=0)
        uhi = np.max([hi[s] for s in slots], axis=0)
        axis = int(np.argmax(uhi - ulo))
        slots.sort(key=lambda s: lo[s][axis] + hi[s][axis])

        my_idx = len(out)
        row = np.zeros(NODE_F, np.float32)
        row[WIDTH * 8] = float(axis)
        if my_idx == 0:
            # root: union box in the pad floats — the kernel's cheap
            # whole-block pre-test (dead blocks skip the full traversal)
            row[WIDTH * 8 + 1:WIDTH * 8 + 4] = ulo
            row[WIDTH * 8 + 4:WIDTH * 8 + 7] = uhi
        out.append(row)  # placeholder; fill below (children may recurse)
        for c in range(WIDTH):
            o8 = c * 8
            if c < len(slots):
                s = slots[c]
                row[o8:o8 + 3] = lo[s]
                row[o8 + 3:o8 + 6] = hi[s]
                if is_leaf[s] or count[s] <= max_leaf:
                    row[o8 + 6] = float(start[s] - prim_base)
                    row[o8 + 7] = float(count[s])
                else:
                    row[o8 + 6] = float(emit(s, depth + 1))
                    row[o8 + 7] = 0.0
            else:
                row[o8:o8 + 3] = BIG
                row[o8 + 3:o8 + 6] = -BIG
                row[o8 + 6] = 0.0
                row[o8 + 7] = EMPTY
        out[my_idx] = row
        return my_idx

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(200000, old))
    try:
        emit(root, 1)
    finally:
        sys.setrecursionlimit(old)
    depth = max_depth[0]
    assert depth * (WIDTH - 1) + 1 <= STACK, \
        f"BVH8 depth {depth} overflows the {STACK}-entry traversal stack"
    return np.stack(out), depth


def pack_tris_flat(tri_geo_ordered) -> np.ndarray:
    """(T, 10) [p0, p1, p2, orig_id] -> flat (T*9,) [p0, e1, e2] with
    precomputed Moeller-Trumbore edges. The original id is NOT stored:
    the kernel returns the BVH-sorted slot index and callers remap
    through prim_indices (one XLA gather), saving 4 B/tri of SMEM."""
    t = np.asarray(tri_geo_ordered, np.float32)
    out = np.empty((t.shape[0], 9), np.float32)
    out[:, 0:3] = t[:, 0:3]
    out[:, 3:6] = t[:, 3:6] - t[:, 0:3]
    out[:, 6:9] = t[:, 6:9] - t[:, 0:3]
    return out.reshape(-1)


def pack_tris_flat10(tri_geo_ordered) -> np.ndarray:
    """Legacy 10-float packing [p0, e1, e2, orig_id] (forest twin only)."""
    t = np.asarray(tri_geo_ordered, np.float32)
    out = np.empty_like(t)
    out[:, 0:3] = t[:, 0:3]
    out[:, 3:6] = t[:, 3:6] - t[:, 0:3]
    out[:, 6:9] = t[:, 6:9] - t[:, 0:3]
    out[:, 9] = t[:, 9]
    return out.reshape(-1)


def build_bvh8(prim_lo, prim_hi, tri_geo, max_leaf: int = 8,
               binary_bvh=None) -> BVH8:
    """Host build: binary SAH (ops/bvh.py, native C++ when available) ->
    8-wide collapse. tri_geo: (T, 10) UNordered [p0, p1, p2, id] rows.
    binary_bvh: optional prebuilt ops/bvh.BVH to collapse (skips the
    binary SAH rebuild when the caller already has one)."""
    from . import bvh as bvh_mod
    b = binary_bvh if binary_bvh is not None \
        else bvh_mod.build_bvh(prim_lo, prim_hi, max_leaf=4)
    order = np.asarray(b.prim_indices)
    node_data, depth = collapse_to_bvh8(np.asarray(b.nodes), max_leaf)
    nodes_f, nodes_q = quantize_nodes(node_data)
    tg = np.asarray(tri_geo)[order]
    return BVH8(nodes_f=jnp.asarray(nodes_f), nodes_q=jnp.asarray(nodes_q),
                tris=jnp.asarray(pack_tris_flat(tg)),
                prim_indices=jnp.asarray(order.astype(np.int32)),
                n_nodes=node_data.shape[0], n_tris=tg.shape[0],
                depth=depth)


def smem_bytes(n_tris: int, n_nodes: int) -> int:
    """SMEM footprint of the all-SMEM kernel (quantized nodes + 9-float
    tris scalar prefetch). The chip's scalar-prefetch budget is ~1 MB
    total (measured: 1008 KB ok, 1024 KB rejected)."""
    return (8 + n_nodes * NF_F + n_tris * 9) * 4 + n_nodes * NQ_I * 4


SMEM_BUDGET = 960 * 1024


# ---------------------------------------------------------------------------
# Chunked multi-launch (arbitrary triangle counts, the PRODUCTION big-mesh
# path): the binary SAH tree is partitioned into subtree chunks that each
# fit the SMEM scalar-prefetch budget; each chunk is an independent BVH8.
# A `lax.scan` over the stacked chunk pages re-launches the all-SMEM
# kernel once per chunk, carrying (t, prim, b1, b2) so chunk k+1's slab
# tests are pruned by the best hit from chunks 0..k. The Pallas prologue
# DMAs each chunk's nodes+tris HBM->SMEM ONCE per launch (amortised over
# every ray block), which sidesteps the conditional-DMA Mosaic hang that
# killed the in-kernel paging design (see _forest_kernel below, kept as a
# reference twin). Plays the role of OptiX's device-memory GAS at
# arbitrary scale (gpu/optix/aggregate.cpp:343); traversal semantics
# match cpu/aggregates.cpp:529-579.


@struct.dataclass
class BVH8Chunked:
    nodes_f: jnp.ndarray       # (K, NFL) f32 per-chunk frame pages
    nodes_q: jnp.ndarray       # (K, NQL) i32 per-chunk quantized children
    tris: jnp.ndarray          # (K, TL) f32 per-chunk flat tri pages
    page_start: jnp.ndarray    # (K,) i32: chunk's tri start in sorted order
    prim_indices: jnp.ndarray  # (T,) int32 permutation into original prims
    n_chunks: int = struct.field(pytree_node=False)
    n_tris: int = struct.field(pytree_node=False)
    depth: int = struct.field(pytree_node=False)


def partition_chunk_roots(nodes_bin: np.ndarray, budget: int):
    """Greedy DFS partition of a flattened binary SAH BVH into subtree
    chunk roots whose estimated BVH8 page (collapsed nodes ~9.3 B/tri +
    tris 40 B/tri, 1.3x margin) fits `budget` bytes. Returns
    (chunk_roots, start, count, is_leaf, roff)."""
    nb = np.asarray(nodes_bin, np.float64)
    m = nb.shape[0]
    roff = np.round(nb[:, 6]).astype(np.int64)
    meta_b = np.round(nb[:, 7]).astype(np.int64)
    nprim = meta_b >> 2
    is_leaf = nprim > 0
    from .. import native as _native
    ranges = _native.subtree_ranges_native(nodes_bin)
    if ranges is not None:
        start, count = ranges
    else:
        start = np.zeros(m, np.int64)
        count = np.zeros(m, np.int64)
        for i in range(m - 1, -1, -1):
            if is_leaf[i]:
                start[i] = roff[i]
                count[i] = nprim[i]
            else:
                l, r = i + 1, roff[i]
                start[i] = min(start[l], start[r])
                count[i] = count[l] + count[r]

    def est(c):
        return int(c * 50 * 1.3)

    chunk_roots = []
    stack = [0]
    while stack:
        s = stack.pop()
        if est(count[s]) <= budget or is_leaf[s]:
            chunk_roots.append(s)
        else:
            stack.append(roff[s])
            stack.append(s + 1)
    return chunk_roots, start, count, is_leaf, roff


def build_bvh8_chunked(prim_lo, prim_hi, tri_geo, max_leaf: int = 8,
                       binary_bvh=None,
                       budget: int = SMEM_BUDGET) -> BVH8Chunked:
    """Host build for the chunked multi-launch path.
    tri_geo: (T, 10) UNordered [p0, p1, p2, id] rows."""
    from . import bvh as bvh_mod
    b = binary_bvh if binary_bvh is not None \
        else bvh_mod.build_bvh(prim_lo, prim_hi, max_leaf=4)
    order = np.asarray(b.prim_indices)
    tg = np.asarray(tri_geo, np.float32)[order]
    # f32 C-contiguous once: the native collapse + ranges calls then see a
    # zero-copy view instead of a per-chunk full-array conversion
    nb = np.ascontiguousarray(np.asarray(b.nodes), np.float32)

    # the byte estimate in partition_chunk_roots can under-predict on
    # skewed trees; the padded (NL + TL) page pair must PROVABLY fit the
    # scalar-prefetch budget, so shrink and re-partition until it does
    part_budget = budget
    for _ in range(8):
        chunk_roots, start, count, _, _ = partition_chunk_roots(
            nb, part_budget)
        nf_pages, nq_pages, tri_pages, starts = [], [], [], []
        max_depth = 0
        for s in chunk_roots:
            nd, dep = collapse_to_bvh8(nb, max_leaf, root=s,
                                       prim_base=int(start[s]))
            max_depth = max(max_depth, dep)
            nf, nq = quantize_nodes(nd)
            nf_pages.append(nf)
            nq_pages.append(nq)
            tri_pages.append(
                pack_tris_flat(tg[start[s]:start[s] + count[s]]))
            starts.append(int(start[s]))
        worst = sum(-(-max(p.shape[0] for p in pages_) // LANES) * LANES
                    for pages_ in (nf_pages, nq_pages, tri_pages))
        if worst * 4 <= budget:
            break
        part_budget = int(part_budget * 0.7)
    else:
        raise RuntimeError(
            f"chunk pages ({worst * 4}B) exceed SMEM budget {budget}B "
            "after 8 re-partitions")
    K = len(nf_pages)
    # page dims rounded up to LANES multiples: the binned kernel views
    # each page array as (K, rows, LANES) for HBM->SMEM DMA
    NFL = -(-max(p.shape[0] for p in nf_pages) // LANES) * LANES
    NQL = -(-max(p.shape[0] for p in nq_pages) // LANES) * LANES
    TL = -(-max(p.shape[0] for p in tri_pages) // LANES) * LANES
    nodes_f = np.zeros((K, NFL), np.float32)
    nodes_q = np.zeros((K, NQL), np.int32)
    tris = np.zeros((K, TL), np.float32)
    for k in range(K):
        nodes_f[k, :nf_pages[k].shape[0]] = nf_pages[k]
        nodes_q[k, :nq_pages[k].shape[0]] = nq_pages[k]
        tris[k, :tri_pages[k].shape[0]] = tri_pages[k]
    return BVH8Chunked(nodes_f=jnp.asarray(nodes_f),
                       nodes_q=jnp.asarray(nodes_q),
                       tris=jnp.asarray(tris),
                       page_start=jnp.asarray(starts, jnp.int32),
                       prim_indices=jnp.asarray(order.astype(np.int32)),
                       n_chunks=K, n_tris=tg.shape[0], depth=max_depth)


def chunked_intersect(c: BVH8Chunked, o, d, t_max, any_hit=False,
                      interpret=False):
    """Closest/any hit over the chunk scan. Same returns as
    bvh8_intersect. Lanes that already hold a hit enter later chunks with
    t_max = their hit t (closest) or -1 (any-hit: root slabs all miss and
    the block exits after one node visit)."""
    N = o.shape[0]
    n_pad = -(-N // BLOCK) * BLOCK

    def prep(v, fill):
        v = jnp.concatenate([v, jnp.full((n_pad - N,), fill, v.dtype)]) \
            if n_pad != N else v
        return v.reshape(n_pad // LANES, LANES)

    ox, oy, oz = (prep(o[:, i], 1e9) for i in range(3))
    dx, dy, dz = (prep(d[:, i], 1.0) for i in range(3))
    tm = prep(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,)), -1.0)

    def step(carry, pages):
        t_c, k_c, b1_c, b2_c = carry
        nf_k, nq_k, tris_k, start_k = pages
        tmax_in = jnp.where(k_c >= 0.0, -1.0, t_c) if any_hit else t_c
        t_n, k_n, b1_n, b2_n = _run8(nf_k, nq_k, tris_k, ox, oy, oz,
                                     dx, dy, dz, tmax_in, any_hit,
                                     interpret=interpret)
        better = k_n >= 0.0
        # kernel returns page-LOCAL sorted slot -> global sorted slot
        k_g = k_n + start_k.astype(jnp.float32)
        return (jnp.where(better, t_n, t_c), jnp.where(better, k_g, k_c),
                jnp.where(better, b1_n, b1_c),
                jnp.where(better, b2_n, b2_c)), None

    init = (tm, jnp.full_like(tm, -1.0), jnp.zeros_like(tm),
            jnp.zeros_like(tm))
    (t, kf, b1, b2), _ = jax.lax.scan(
        step, init, (c.nodes_f, c.nodes_q, c.tris, c.page_start))
    t = t.reshape(-1)[:N]
    kf = kf.reshape(-1)[:N]
    b1 = b1.reshape(-1)[:N]
    b2 = b2.reshape(-1)[:N]
    slot = jnp.round(kf).astype(jnp.int32)
    hit = slot >= 0
    prim = jnp.where(
        hit, c.prim_indices[jnp.clip(slot, 0, c.prim_indices.shape[0] - 1)],
        -1)
    return dict(hit=hit, t=jnp.where(hit, t, jnp.inf), prim=prim,
                b0=1.0 - b1 - b2, b1=b1, b2=b2)


# ---------------------------------------------------------------------------
# Forest build (arbitrary triangle counts): the binary SAH tree is
# partitioned into SUBTREE CHUNKS that each fit an SMEM scratch budget;
# each chunk is an independent BVH8 whose nodes+tris pack into one
# (R, 128) f32 page. Pages live in HBM; the kernel DMAs a page into SMEM
# scratch only when the ray block hits the chunk's root box, then runs
# the same all-SMEM traversal. This plays the role of OptiX's
# device-memory GAS at arbitrary scale (gpu/optix/aggregate.cpp:343).


@struct.dataclass
class BVH8Forest:
    meta: jnp.ndarray          # (K*8,) f32: per chunk [n_nodes, tri_base
    #                            (flat floats), root lo xyz, hi xyz, pad]
    pages: jnp.ndarray         # (K, R, 128) f32 HBM chunk pages
    prim_indices: jnp.ndarray  # (T,) int32 permutation into original prims
    n_chunks: int = struct.field(pytree_node=False)
    rows: int = struct.field(pytree_node=False)
    n_tris: int = struct.field(pytree_node=False)
    depth: int = struct.field(pytree_node=False)


PAGE_BUDGET = 640 * 1024      # bytes per chunk page (SMEM scratch size)


def build_bvh8_forest(prim_lo, prim_hi, tri_geo, max_leaf: int = 8,
                      binary_bvh=None,
                      page_budget: int = PAGE_BUDGET) -> BVH8Forest:
    """tri_geo: (T, 10) UNordered [p0, p1, p2, id] rows."""
    from . import bvh as bvh_mod
    b = binary_bvh if binary_bvh is not None \
        else bvh_mod.build_bvh(prim_lo, prim_hi, max_leaf=4)
    order = np.asarray(b.prim_indices)
    tg = np.asarray(tri_geo, np.float32)[order]
    nb = np.asarray(b.nodes, np.float64)
    m = nb.shape[0]
    roff = np.round(nb[:, 6]).astype(np.int64)
    meta_b = np.round(nb[:, 7]).astype(np.int64)
    nprim = meta_b >> 2
    is_leaf = nprim > 0
    start = np.zeros(m, np.int64)
    count = np.zeros(m, np.int64)
    for i in range(m - 1, -1, -1):
        if is_leaf[i]:
            start[i] = roff[i]
            count[i] = nprim[i]
        else:
            l, r = i + 1, roff[i]
            start[i] = min(start[l], start[r])
            count[i] = count[l] + count[r]

    # greedy DFS partition: a subtree becomes a chunk when its estimated
    # page (collapsed nodes ~9.3B/tri + tris 40B/tri, margin 1.3x) fits
    def est(c):
        return int(c * 50 * 1.3)

    chunk_roots = []
    stack = [0]
    while stack:
        s = stack.pop()
        if est(count[s]) <= page_budget or is_leaf[s]:
            chunk_roots.append(s)
        else:
            stack.append(roff[s])
            stack.append(s + 1)

    pages = []
    metas = []
    max_depth = 0
    for s in chunk_roots:
        nd, dep = collapse_to_bvh8(nb, max_leaf, root=s,
                                   prim_base=int(start[s]))
        max_depth = max(max_depth, dep)
        tri_flat = pack_tris_flat10(tg[start[s]:start[s] + count[s]])
        node_flat = nd.reshape(-1)
        page = np.concatenate([node_flat, tri_flat])
        assert page.nbytes <= page_budget, \
            f"chunk page {page.nbytes}B exceeds budget {page_budget}B"
        pages.append(page)
        metas.append([nd.shape[0], node_flat.shape[0],
                      nb[s, 0], nb[s, 1], nb[s, 2],
                      nb[s, 3], nb[s, 4], nb[s, 5]])
    rows = max(-(-p.shape[0] // LANES) for p in pages)
    K = len(pages)
    pg = np.zeros((K, rows * LANES), np.float32)
    for k, p in enumerate(pages):
        pg[k, :p.shape[0]] = p
    return BVH8Forest(
        meta=jnp.asarray(np.asarray(metas, np.float32).reshape(-1)),
        pages=jnp.asarray(pg.reshape(K, rows, LANES)),
        prim_indices=jnp.asarray(order.astype(np.int32)),
        n_chunks=K, rows=rows, n_tris=tg.shape[0], depth=max_depth)


# ---------------------------------------------------------------------------
# Kernel


def _traverse_page(nf, nq, tr, o_x, o_y, o_z, d_x, d_y, d_z,
                   t_ref, k_ref, b1_ref, b2_ref, stack_ref, *,
                   any_hit, extra_hit_ref=None):
    """Shared one-page BVH8 traversal body. `nf`/`nq`/`tr` are scalar
    READER functions (flat index -> scalar) so the same code runs against
    scalar-prefetch SMEM refs (single/chunked launches) and DMA'd SMEM
    scratch pages (binned launch). `t_ref` must already hold the per-lane
    t bound, `k_ref` the page-LOCAL prim carry (-1 = none), b1/b2 the
    barycentric carries. `extra_hit_ref`: optional second hit carry (the
    binned kernel's cross-page global prim slot) consulted for any_hit
    liveness."""
    inv_dx = 1.0 / jnp.where(d_x == 0.0, 1e-20, d_x)
    inv_dy = 1.0 / jnp.where(d_y == 0.0, 1e-20, d_y)
    inv_dz = 1.0 / jnp.where(d_z == 0.0, 1e-20, d_z)
    # NOTE: the slab tests below deliberately use (plane - o) * inv_d,
    # NOT the FMA-friendly plane*inv_d - o*inv_d: distributing the
    # multiply loses sign correctness near t=0 (o*inv_d reaches ~1e10
    # for grazing rays, so the cancellation error is absolute ~ulp(1e10)
    # ~= 1e3 — larger than real traversal t values), silently culling
    # boxes that surface-origin rays start inside.
    sgn = [jnp.sum(d_x) < 0, jnp.sum(d_y) < 0, jnp.sum(d_z) < 0]

    def live_mask():
        live = k_ref[...] < 0.0
        if extra_hit_ref is not None:
            live = live & (extra_hit_ref[...] < 0.0)
        return live

    def tri_test(idx):
        """One MT test at page-local slot idx. Returns (t, tid, b1, b2,
        valid) — valid excludes the t_best comparison (done at merge)."""
        base = idx * 9
        p0x, p0y, p0z = tr(base), tr(base + 1), tr(base + 2)
        e1x, e1y, e1z = tr(base + 3), tr(base + 4), tr(base + 5)
        e2x, e2y, e2z = tr(base + 6), tr(base + 7), tr(base + 8)
        tid = idx.astype(jnp.float32)            # page-local sorted slot
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
        tol = jnp.float32(1e-6) * det_a
        valid = (det_a > 1e-12) & (u_n >= -tol) & (v_n >= -tol) & \
            (u_n + v_n <= det_a + tol)
        inv_det = 1.0 / jnp.where(det_a == 0.0, 1.0, det_a)
        t = t_n * inv_det
        valid = valid & (t > 1e-5)
        return t, tid, u_n * inv_det, v_n * inv_det, valid

    def make_tri_pair_body(first, cnt):
        """fori_loop body testing TWO triangles per iteration: the two MT
        chains are independent (ILP the serial one-tri loop cannot
        expose), merged pairwise then against the carry. Tie-break order
        matches the serial loop (strict <, earlier slot wins)."""
        def body(k, carry):
            t_best, prim, b1, b2 = carry
            i0 = first + 2 * k
            t0, id0, b10, b20, v0 = tri_test(i0)
            # clamp keeps the odd-cnt tail read in bounds; the mask kills it
            t1, id1, b11, b21, v1 = tri_test(
                jnp.minimum(i0 + 1, first + cnt - 1))
            v1 = v1 & (2 * k + 1 < cnt)
            one_wins = v1 & ((t1 < t0) | ~v0)
            t_m = jnp.where(one_wins, t1, t0)
            id_m = jnp.where(one_wins, id1, id0)
            b1m = jnp.where(one_wins, b11, b10)
            b2m = jnp.where(one_wins, b21, b20)
            better = (v0 | v1) & (t_m < t_best)
            if any_hit:
                better = better & (prim < 0.0)
            return (jnp.where(better, t_m, t_best),
                    jnp.where(better, id_m, prim),
                    jnp.where(better, b1m, b1),
                    jnp.where(better, b2m, b2))
        return body

    def body(sp):
        sp = sp - 1
        cur = stack_ref[sp]
        base_f = 8 + cur * NF_F
        onx = nf(base_f)
        ony = nf(base_f + 1)
        onz = nf(base_f + 2)
        sx = nf(base_f + 3)
        sy = nf(base_f + 4)
        sz = nf(base_f + 5)
        axis = jnp.round(nf(base_f + 6)).astype(jnp.int32)
        neg = jnp.where(axis == 0, sgn[0],
                        jnp.where(axis == 1, sgn[1], sgn[2]))
        t_best = t_ref[...]
        if any_hit:
            live = live_mask()
        # test all 8 child slabs; reductions are independent -> pipelined
        base_q = cur * NQ_I
        infos = []
        for c in range(WIDTH):
            qb = base_q + c * 3
            w0 = nq(qb)
            w1 = nq(qb + 1)
            first = nq(qb + 2)
            cnt = jnp.bitwise_and(jnp.right_shift(w0, 24), 255)
            lox = onx + jnp.bitwise_and(w0, 255).astype(jnp.float32) * sx
            loy = ony + jnp.bitwise_and(jnp.right_shift(w0, 8),
                                        255).astype(jnp.float32) * sy
            loz = onz + jnp.bitwise_and(jnp.right_shift(w0, 16),
                                        255).astype(jnp.float32) * sz
            hix = onx + jnp.bitwise_and(w1, 255).astype(jnp.float32) * sx
            hiy = ony + jnp.bitwise_and(jnp.right_shift(w1, 8),
                                        255).astype(jnp.float32) * sy
            hiz = onz + jnp.bitwise_and(jnp.right_shift(w1, 16),
                                        255).astype(jnp.float32) * sz
            tx0 = (lox - o_x) * inv_dx
            tx1 = (hix - o_x) * inv_dx
            ty0 = (loy - o_y) * inv_dy
            ty1 = (hiy - o_y) * inv_dy
            tz0 = (loz - o_z) * inv_dz
            tz1 = (hiz - o_z) * inv_dz
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                           jnp.minimum(ty0, ty1)),
                               jnp.maximum(jnp.minimum(tz0, tz1), 0.0))
            tmx = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                          jnp.maximum(ty0, ty1)),
                              jnp.minimum(jnp.maximum(tz0, tz1), t_best))
            mask = tmin <= tmx * 1.0000004
            if any_hit:
                mask = mask & live
            infos.append((first, cnt, jnp.any(mask)))

        # leaves: inline masked triangle loops (no cond over vector state)
        for c in range(WIDTH):
            first, cnt, any_c = infos[c]

            @pl.when(any_c & (cnt > 0) & (cnt < CNT_EMPTY))
            def _(first=first, cnt=cnt):
                carry = (t_ref[...], k_ref[...], b1_ref[...], b2_ref[...])
                t_b, pr, b1, b2 = jax.lax.fori_loop(
                    0, (cnt + 1) // 2, make_tri_pair_body(first, cnt),
                    carry)
                t_ref[...] = t_b
                k_ref[...] = pr
                b1_ref[...] = b1
                b2_ref[...] = b2

        # interior pushes, far-to-near by block-majority sign: children are
        # sorted ascending along `axis`, so positive-direction blocks pop
        # low slots first (push 7..0) and negative-direction blocks the
        # reverse
        for c in range(WIDTH - 1, -1, -1):
            first, cnt, any_c = infos[c]
            do = any_c & (cnt == 0) & ~neg

            @pl.when(do)
            def _(first=first, sp=sp):
                stack_ref[sp] = first
            sp = jnp.where(do, sp + 1, sp)
        for c in range(WIDTH):
            first, cnt, any_c = infos[c]
            do = any_c & (cnt == 0) & neg

            @pl.when(do)
            def _(first=first, sp=sp):
                stack_ref[sp] = first
            sp = jnp.where(do, sp + 1, sp)

        if any_hit:
            sp = jnp.where(jnp.any(live_mask()), sp, 0)
        return sp

    # whole-block root pre-test: in the chunked multi-launch scan most
    # (chunk, block) pairs are dead — one slab test against the root's
    # union box (stored in node 0's pad floats) skips the traversal
    rtx0 = (nf(0) - o_x) * inv_dx
    rtx1 = (nf(3) - o_x) * inv_dx
    rty0 = (nf(1) - o_y) * inv_dy
    rty1 = (nf(4) - o_y) * inv_dy
    rtz0 = (nf(2) - o_z) * inv_dz
    rtz1 = (nf(5) - o_z) * inv_dz
    rmin = jnp.maximum(jnp.maximum(jnp.minimum(rtx0, rtx1),
                                   jnp.minimum(rty0, rty1)),
                       jnp.maximum(jnp.minimum(rtz0, rtz1), 0.0))
    rmax = jnp.minimum(jnp.minimum(jnp.maximum(rtx0, rtx1),
                                   jnp.maximum(rty0, rty1)),
                       jnp.minimum(jnp.maximum(rtz0, rtz1),
                                   t_ref[...]))
    go = jnp.any(rmin <= rmax * 1.0000004)
    if any_hit and extra_hit_ref is not None:
        go = go & jnp.any(live_mask())

    @pl.when(go)
    def _():
        stack_ref[0] = 0
        jax.lax.while_loop(lambda sp: sp > 0, body, jnp.int32(1))


def _bvh8_kernel(nodes_f_ref, nodes_q_ref, tris_ref, ox, oy, oz, dx, dy, dz,
                 tmax_ref, t_out, k_out, b1_out, b2_out, stack_ref, *,
                 any_hit):
    t_out[...] = tmax_ref[...]
    k_out[...] = jnp.full(ox.shape, -1.0, jnp.float32)
    b1_out[...] = jnp.zeros(ox.shape, jnp.float32)
    b2_out[...] = jnp.zeros(ox.shape, jnp.float32)
    _traverse_page(lambda i: nodes_f_ref[i], lambda i: nodes_q_ref[i],
                   lambda i: tris_ref[i],
                   ox[...], oy[...], oz[...], dx[...], dy[...], dz[...],
                   t_out, k_out, b1_out, b2_out, stack_ref,
                   any_hit=any_hit)


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret",
                                              "rows"))
def _run8(nodes_f_flat, nodes_q_flat, tris_flat, ox, oy, oz, dx, dy, dz,
          tmax, any_hit, interpret=False, rows=BLOCK_ROWS):
    nb = ox.shape[0] // rows
    ray_spec = pl.BlockSpec((rows, LANES),
                            lambda i, nf, nq, tf: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[ray_spec] * 7,
        out_specs=[ray_spec] * 4,
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
    )
    kern = functools.partial(_bvh8_kernel, any_hit=any_hit)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(ox.shape, jnp.float32)] * 4,
        interpret=interpret,
    )(nodes_f_flat, nodes_q_flat, tris_flat, ox, oy, oz, dx, dy, dz, tmax)


def _forest_kernel(meta_ref, pages_hbm, ox, oy, oz, dx, dy, dz, tmax_ref,
                   t_out, k_out, b1_out, b2_out, page, sem, stack_ref, *,
                   n_chunks, any_hit):
    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    inv_dx = 1.0 / jnp.where(d_x == 0.0, 1e-20, d_x)
    inv_dy = 1.0 / jnp.where(d_y == 0.0, 1e-20, d_y)
    inv_dz = 1.0 / jnp.where(d_z == 0.0, 1e-20, d_z)
    sgn = [jnp.sum(d_x) < 0, jnp.sum(d_y) < 0, jnp.sum(d_z) < 0]

    t_out[...] = tmax_ref[...]
    k_out[...] = jnp.full((BLOCK_ROWS, LANES), -1.0, jnp.float32)
    b1_out[...] = jnp.zeros((BLOCK_ROWS, LANES), jnp.float32)
    b2_out[...] = jnp.zeros((BLOCK_ROWS, LANES), jnp.float32)

    def rd(i):
        return page[i >> 7, i & 127]

    def slab(lox, loy, loz, hix, hiy, hiz, t_best):
        tx0 = (lox - o_x) * inv_dx
        tx1 = (hix - o_x) * inv_dx
        ty0 = (loy - o_y) * inv_dy
        ty1 = (hiy - o_y) * inv_dy
        tz0 = (loz - o_z) * inv_dz
        tz1 = (hiz - o_z) * inv_dz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                       jnp.minimum(ty0, ty1)),
                           jnp.maximum(jnp.minimum(tz0, tz1), 0.0))
        tmx = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                      jnp.maximum(ty0, ty1)),
                          jnp.minimum(jnp.maximum(tz0, tz1), t_best))
        return tmin <= tmx * 1.0000004

    def chunk_body(k, _):
        mb = k * 8
        tri_base = jnp.round(meta_ref[mb + 1]).astype(jnp.int32)
        t_bound = t_out[...]
        mask0 = slab(meta_ref[mb + 2], meta_ref[mb + 3], meta_ref[mb + 4],
                     meta_ref[mb + 5], meta_ref[mb + 6], meta_ref[mb + 7],
                     t_bound)
        if any_hit:
            mask0 = mask0 & (k_out[...] < 0.0)

        @pl.when(jnp.any(mask0))
        def _():
            dma = pltpu.make_async_copy(pages_hbm.at[k], page, sem)
            dma.start()
            dma.wait()
            stack_ref[0] = 0

            def tri_body(kk, carry):
                t_best, prim, b1, b2, first = carry
                base = tri_base + (first + kk) * 10
                p0x, p0y, p0z = rd(base), rd(base + 1), rd(base + 2)
                e1x, e1y, e1z = rd(base + 3), rd(base + 4), rd(base + 5)
                e2x, e2y, e2z = rd(base + 6), rd(base + 7), rd(base + 8)
                tid = rd(base + 9)
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
                tol = jnp.float32(1e-6) * det_a
                valid = (det_a > 1e-12) & (u_n >= -tol) & (v_n >= -tol) & \
                    (u_n + v_n <= det_a + tol)
                inv_det = 1.0 / jnp.where(det_a == 0.0, 1.0, det_a)
                t = t_n * inv_det
                better = valid & (t > 1e-5) & (t < t_best)
                if any_hit:
                    better = better & (prim < 0.0)
                t_best = jnp.where(better, t, t_best)
                prim = jnp.where(better, tid, prim)
                b1 = jnp.where(better, u_n * inv_det, b1)
                b2 = jnp.where(better, v_n * inv_det, b2)
                return t_best, prim, b1, b2, first

            def body(sp):
                sp = sp - 1
                cur = stack_ref[sp]
                base = cur * NODE_F
                axis = jnp.round(rd(base + WIDTH * 8)).astype(jnp.int32)
                neg = jnp.where(axis == 0, sgn[0],
                                jnp.where(axis == 1, sgn[1], sgn[2]))
                t_best = t_out[...]
                if any_hit:
                    live = k_out[...] < 0.0
                infos = []
                for c in range(WIDTH):
                    cb = base + c * 8
                    first = jnp.round(rd(cb + 6)).astype(jnp.int32)
                    cnt = jnp.round(rd(cb + 7)).astype(jnp.int32)
                    mask = slab(rd(cb), rd(cb + 1), rd(cb + 2),
                                rd(cb + 3), rd(cb + 4), rd(cb + 5),
                                t_best)
                    if any_hit:
                        mask = mask & live
                    infos.append((first, cnt, jnp.any(mask)))

                for c in range(WIDTH):
                    first, cnt, any_c = infos[c]

                    @pl.when(any_c & (cnt > 0))
                    def _(first=first, cnt=cnt):
                        carry = (t_out[...], k_out[...], b1_out[...],
                                 b2_out[...], first)
                        t_b, pr, b1, b2, _ = jax.lax.fori_loop(
                            0, cnt, tri_body, carry)
                        t_out[...] = t_b
                        k_out[...] = pr
                        b1_out[...] = b1
                        b2_out[...] = b2

                for c in range(WIDTH - 1, -1, -1):
                    first, cnt, any_c = infos[c]
                    do = any_c & (cnt == 0) & ~neg

                    @pl.when(do)
                    def _(first=first, sp=sp):
                        stack_ref[sp] = first
                    sp = jnp.where(do, sp + 1, sp)
                for c in range(WIDTH):
                    first, cnt, any_c = infos[c]
                    do = any_c & (cnt == 0) & neg

                    @pl.when(do)
                    def _(first=first, sp=sp):
                        stack_ref[sp] = first
                    sp = jnp.where(do, sp + 1, sp)

                if any_hit:
                    sp = jnp.where(jnp.any(k_out[...] < 0.0), sp, 0)
                return sp

            jax.lax.while_loop(lambda sp: sp > 0, body, jnp.int32(1))

        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("n_chunks", "rows", "any_hit",
                                    "interpret"))
def _run_forest(meta, pages, ox, oy, oz, dx, dy, dz, tmax,
                n_chunks, rows, any_hit, interpret=False):
    nb = ox.shape[0] // BLOCK_ROWS
    ray_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i, nf: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + [ray_spec] * 7,
        out_specs=[ray_spec] * 4,
        scratch_shapes=[pltpu.SMEM((rows, LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SMEM((STACK,), jnp.int32)],
    )
    kern = functools.partial(_forest_kernel, n_chunks=n_chunks,
                             any_hit=any_hit)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(ox.shape, jnp.float32)] * 4,
        interpret=interpret,
    )(meta, pages, ox, oy, oz, dx, dy, dz, tmax)


def forest_intersect(f: BVH8Forest, o, d, t_max, any_hit=False,
                     interpret=False):
    """HBM-paged packet-BVH8 closest/any hit (arbitrary triangle count).
    Same returns as bvh8_intersect."""
    N = o.shape[0]
    n_pad = -(-N // BLOCK) * BLOCK

    def prep(v, fill):
        v = jnp.concatenate([v, jnp.full((n_pad - N,), fill, v.dtype)]) \
            if n_pad != N else v
        return v.reshape(n_pad // LANES, LANES)

    ox, oy, oz = (prep(o[:, i], 1e9) for i in range(3))
    dx, dy, dz = (prep(d[:, i], 1.0) for i in range(3))
    tm = prep(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,)), -1.0)

    t, kf, b1, b2 = _run_forest(f.meta, f.pages, ox, oy, oz, dx, dy, dz,
                                tm, f.n_chunks, f.rows, bool(any_hit),
                                interpret=bool(interpret))
    t = t.reshape(-1)[:N]
    kf = kf.reshape(-1)[:N]
    b1 = b1.reshape(-1)[:N]
    b2 = b2.reshape(-1)[:N]
    prim = jnp.round(kf).astype(jnp.int32)
    hit = prim >= 0
    return dict(hit=hit, t=jnp.where(hit, t, jnp.inf), prim=prim,
                b0=1.0 - b1 - b2, b1=b1, b2=b2)


# ---------------------------------------------------------------------------
# Binned page traversal (round 5): the scalable big-mesh path. Instead of
# re-launching the all-SMEM kernel once per chunk against EVERY ray block
# (chunked_intersect: O(K * B) root tests + K full launches), an XLA
# pre-pass slab-tests every ray against every chunk ROOT box, reduces to a
# per-block (hit, min-entry-t) table, and builds a per-block shortlist of
# the P nearest hit pages. ONE Pallas launch with grid (B, P) then DMAs
# exactly the pages each block needs from HBM into SMEM scratch
# (scalar-prefetched schedule -> grid-driven DMA, which sidesteps the
# round-4 Mosaic conditional-DMA hang on vector predicates), traverses,
# and accumulates the best hit in the VMEM-resident output block across
# the P same-block grid steps. Blocks needing more than P pages are
# served by an outer lax.while_loop round that re-prunes the remaining
# pages against the tightened per-block t bound — so correctness never
# depends on P. Plays the role of OptiX's device-memory GAS at arbitrary
# scale (gpu/optix/aggregate.cpp:343, :1429); traversal semantics match
# cpu/aggregates.cpp:529-579.


def _binned_kernel(sched_ref, vmask_ref, start_ref, nf_ref, nq_ref,
                   tr_ref, ox, oy, oz, dx, dy, dz, t_in, k_in, b1_in,
                   b2_in, t_out, k_out, b1_out, b2_out, k_loc, stack_ref,
                   *, P, any_hit):
    b = pl.program_id(0)
    p = pl.program_id(1)
    valid = vmask_ref[b * P + p] > 0
    k = sched_ref[b * P + p]

    @pl.when(p == 0)
    def _():
        t_out[...] = t_in[...]
        k_out[...] = k_in[...]
        b1_out[...] = b1_in[...]
        b2_out[...] = b2_in[...]

    @pl.when(valid)
    def _():
        k_loc[...] = jnp.full(k_loc.shape, -1.0, jnp.float32)
        _traverse_page(
            lambda i: nf_ref[0, i >> 7, i & 127],
            lambda i: nq_ref[0, i >> 7, i & 127],
            lambda i: tr_ref[0, i >> 7, i & 127],
            ox[...], oy[...], oz[...], dx[...], dy[...], dz[...],
            t_out, k_loc, b1_out, b2_out, stack_ref,
            any_hit=any_hit, extra_hit_ref=k_out)
        kl = k_loc[...]
        k_out[...] = jnp.where(
            kl >= 0.0, kl + start_ref[k].astype(jnp.float32), k_out[...])


@functools.partial(jax.jit, static_argnames=("P", "any_hit", "interpret",
                                              "rows"))
def _run_binned(sched, vmask, start, nf3, nq3, tr3, ox, oy, oz, dx, dy,
                dz, t, kf, b1, b2, P, any_hit, interpret=False,
                rows=BLOCK_ROWS):
    nb = ox.shape[0] // rows
    ray_spec = pl.BlockSpec((rows, LANES), lambda b, p, s, v, st: (b, 0))

    def page_spec(r, ms=pltpu.SMEM):
        # pages are DMA'd HBM->SMEM by the Pallas pipeline itself, driven
        # by the scalar-prefetched schedule (double-buffered; identical
        # consecutive indices skip the copy). Manual make_async_copy of a
        # dim-0 slice of a 3-D HBM memref hangs on v5e (tools/exp_dma_var*)
        # — this BlockSpec form is the one that works.
        return pl.BlockSpec((1, r, LANES),
                            lambda b, p, s, v, st: (s[b * P + p], 0, 0),
                            memory_space=ms)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb, P),
        in_specs=[page_spec(nf3.shape[1]), page_spec(nq3.shape[1]),
                  page_spec(tr3.shape[1])] + [ray_spec] * 10,
        out_specs=[ray_spec] * 4,
        scratch_shapes=[pltpu.VMEM((rows, LANES), jnp.float32),
                        pltpu.SMEM((STACK,), jnp.int32)])
    kern = functools.partial(_binned_kernel, P=P, any_hit=any_hit)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(ox.shape, jnp.float32)] * 4,
        interpret=interpret)(sched, vmask, start, nf3, nq3, tr3,
                             ox, oy, oz, dx, dy, dz, t, kf, b1, b2)


def _page_entries(c: BVH8Chunked, o3, d3, tm, B, blk, group=16):
    """Per-(block, chunk) min entry distance: every ray slab-tested
    against every chunk root box (header floats 0..5 of each nodes_f
    page), reduced per ray block. Grouped lax.map bounds the fused
    intermediate to (N, group)."""
    K = c.n_chunks
    roots = c.nodes_f[:, :6]
    G = min(group, K)
    Kp = -(-K // G) * G
    lo = jnp.concatenate(
        [roots[:, 0:3], jnp.full((Kp - K, 3), BIG, jnp.float32)])
    hi = jnp.concatenate(
        [roots[:, 3:6], jnp.full((Kp - K, 3), -BIG, jnp.float32)])
    inv = 1.0 / jnp.where(d3 == 0.0, 1e-20, d3)

    def grp(args):
        lg, hg = args
        t0 = (lg[None] - o3[:, None]) * inv[:, None]
        t1 = (hg[None] - o3[:, None]) * inv[:, None]
        tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), 0.0)
        tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1),
                         tm[:, None])
        entg = jnp.where(tn <= tf * 1.0000004, tn, BIG)
        return entg.reshape(B, blk, G).min(axis=1)

    ent = jax.lax.map(grp, (lo.reshape(-1, G, 3), hi.reshape(-1, G, 3)))
    return jnp.moveaxis(ent, 0, 1).reshape(B, Kp)[:, :K]


def binned_intersect(c: BVH8Chunked, o, d, t_max, any_hit=False,
                     interpret=False, pages_per_round: int = 16,
                     rows: int = BLOCK_ROWS):
    """Closest/any hit via per-block page shortlists (see banner above).
    Bit-identical results to chunked_intersect (same page traversal,
    same merge order guarantees: pages are served nearest-first and a
    later page only wins with strictly smaller t). Same returns."""
    N = o.shape[0]
    blk = rows * LANES
    n_pad = -(-N // blk) * blk
    B = n_pad // blk
    K = c.n_chunks
    P = min(pages_per_round, K)

    def prep(v, fill):
        v = jnp.concatenate([v, jnp.full((n_pad - N,), fill, v.dtype)]) \
            if n_pad != N else v
        return v.reshape(n_pad // LANES, LANES)

    ox, oy, oz = (prep(o[:, i], 1e9) for i in range(3))
    dx, dy, dz = (prep(d[:, i], 1.0) for i in range(3))
    tmf = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    tm = prep(tmf, -1.0)
    o3 = jnp.concatenate([v.reshape(-1, 1) for v in
                          (ox.reshape(-1), oy.reshape(-1),
                           oz.reshape(-1))], 1)
    d3 = jnp.concatenate([v.reshape(-1, 1) for v in
                          (dx.reshape(-1), dy.reshape(-1),
                           dz.reshape(-1))], 1)
    nf3 = c.nodes_f.reshape(K, -1, LANES)
    nq3 = c.nodes_q.reshape(K, -1, LANES)
    tr3 = c.tris.reshape(K, -1, LANES)
    rowsB = jnp.arange(B)[:, None]

    def live_ent(t, kf, served):
        """Per-(block, page) min entry distance among lanes whose CURRENT
        per-lane t bound the page root still beats — recomputed each round
        so the pruning is per-lane exact (a block-level min-entry vs max-t
        test keeps ~every crossed page alive and re-traverses the world)."""
        te = jnp.where(kf >= 0.0, -1.0, t) if any_hit else t
        ent = _page_entries(c, o3, d3, te.reshape(-1), B, blk)
        return jnp.where(served, BIG, ent)

    def cond(s):
        return jnp.any(s[5] < BIG)

    def body(s):
        t, kf, b1, b2, served, ent = s
        idx = jnp.argsort(ent, axis=1)[:, :P]
        entp = jnp.take_along_axis(ent, idx, 1)
        # ent is served nearest-first, so `valid` is a PREFIX of each row;
        # pad entries repeat the row's LAST valid page so the pipeline's
        # consecutive-same-index copy elision makes them free
        valid = entp < BIG
        cnt = jnp.sum(valid.astype(jnp.int32), axis=1)
        last = jnp.take_along_axis(
            idx, jnp.maximum(cnt - 1, 0)[:, None], 1)
        sched = jnp.where(valid, idx, last).astype(jnp.int32).reshape(-1)
        vmask = valid.astype(jnp.int32).reshape(-1)
        served = served.at[rowsB, idx].set(valid | served[rowsB, idx])
        t, kf, b1, b2 = _run_binned(
            sched, vmask, c.page_start, nf3, nq3, tr3, ox, oy, oz,
            dx, dy, dz, t, kf, b1, b2, P, any_hit, interpret=interpret,
            rows=rows)
        return (t, kf, b1, b2, served, live_ent(t, kf, served))

    kf0 = jnp.full_like(tm, -1.0)
    served0 = jnp.zeros((B, K), jnp.bool_)
    init = (tm, kf0, jnp.zeros_like(tm), jnp.zeros_like(tm), served0,
            live_ent(tm, kf0, served0))
    t, kf, b1, b2, _, _ = jax.lax.while_loop(cond, body, init)
    t = t.reshape(-1)[:N]
    kf = kf.reshape(-1)[:N]
    b1 = b1.reshape(-1)[:N]
    b2 = b2.reshape(-1)[:N]
    slot = jnp.round(kf).astype(jnp.int32)
    hit = slot >= 0
    prim = jnp.where(
        hit, c.prim_indices[jnp.clip(slot, 0, c.prim_indices.shape[0] - 1)],
        -1)
    return dict(hit=hit, t=jnp.where(hit, t, jnp.inf), prim=prim,
                b0=1.0 - b1 - b2, b1=b1, b2=b2)


def bvh8_intersect(b8: BVH8, o, d, t_max, any_hit=False, interpret=False,
                   rows=BLOCK_ROWS):
    """Packet-BVH8 closest/any hit. o, d: (N, 3); t_max: (N,) or scalar.
    Returns dict(hit, t, prim (ORIGINAL id), b0, b1, b2).

    rows: lanes-per-block is rows*128 — bigger blocks amortize the
    per-visit scalar dequant over more lanes but traverse a LARGER
    union (tools/sim_union.py block-size table)."""
    N = o.shape[0]
    blk = rows * LANES
    n_pad = -(-N // blk) * blk

    def prep(v, fill):
        v = jnp.concatenate([v, jnp.full((n_pad - N,), fill, v.dtype)]) \
            if n_pad != N else v
        return v.reshape(n_pad // LANES, LANES)

    ox, oy, oz = (prep(o[:, i], 1e9) for i in range(3))
    dx, dy, dz = (prep(d[:, i], 1.0) for i in range(3))
    tm = prep(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,)), -1.0)

    t, kf, b1, b2 = _run8(b8.nodes_f, b8.nodes_q, b8.tris, ox, oy, oz,
                          dx, dy, dz, tm, bool(any_hit),
                          interpret=bool(interpret), rows=int(rows))
    t = t.reshape(-1)[:N]
    kf = kf.reshape(-1)[:N]
    b1 = b1.reshape(-1)[:N]
    b2 = b2.reshape(-1)[:N]
    slot = jnp.round(kf).astype(jnp.int32)
    hit = slot >= 0
    prim = jnp.where(
        hit,
        b8.prim_indices[jnp.clip(slot, 0, b8.prim_indices.shape[0] - 1)],
        -1)
    return dict(hit=hit, t=jnp.where(hit, t, jnp.inf), prim=prim,
                b0=1.0 - b1 - b2, b1=b1, b2=b2)
