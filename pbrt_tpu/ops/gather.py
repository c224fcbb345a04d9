"""Gather-avoidance primitives for TPU.

Measured on the target TPU (v5e via axon): every XLA gather/scatter op costs
~0.5-1ms regardless of size, while elementwise ops and small matmuls are
effectively free. Design rules encoded here:

- tiny tables (< ~64 rows): one-hot compare + reduce (VPU/MXU, no gather)
- per-entity attribute pools: pack ALL attributes into one (n, C) row matrix
  so each entity lookup is ONE gather, with int fields bitcast through f32
- component picks (xyz by index): arithmetic select, never take_along_axis
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


ONEHOT_MAX_ROWS = 512  # below this, one-hot matmul beats a gather decisively

# Trace-time switches (tools/ablate_wave.py A/B harness): the jit wrappers
# that consume these are created fresh per measurement, so a plain module
# global is re-read at each trace.
_ONEHOT_IMPL = "arith"   # "arith" (f32 clamp ramp) | "cmp" (int compare);
#                          arith measured +3.5% on the cornell wave (the
#                          int compare materializes an s32 broadcast + a
#                          packed-pred buffer per distinct one-hot) and is
#                          bit-exact vs cmp
_FORCE_GATHER = False    # route every pool_lookup through a real gather


def pool_lookup(table, idx):
    """Row lookup from an entity pool: one-hot matmul for small pools
    (MXU, effectively free), gather for large ones (~1 GB/s on this TPU).

    table: (K, C) f32 — int columns must be VALUE-encoded f32 (ints < 2^24),
    never bitcast (0 * NaN-pattern would poison the one-hot sum).
    idx: (...,) int32, already clipped to [0, K).
    """
    if not _FORCE_GATHER and table.shape[0] <= ONEHOT_MAX_ROWS:
        return onehot_lookup(table, idx)
    return table[idx]


SELECT_MAX_ROWS = 2


def onehot_lookup(table, idx, axis_size=None):
    """Gather-free lookup for small tables.

    table: (K,) or (K, C) f32/int32-safe-in-f32; idx: (...) int32.
    Returns (...,) or (..., C).

    Lowering note (measured on the axon TPU): inside large while-loop
    programs, select chains fused worse than the exact-f32 one-hot matmul
    overall (641k vs 951k paths/s on the cornell bench), so matmul is the
    default; K<=2 keeps the trivial select.
    """
    table = jnp.asarray(table, jnp.float32)
    K = table.shape[0] if axis_size is None else axis_size
    if K <= SELECT_MAX_ROWS:
        expand = table.ndim > 1
        acc = jnp.zeros(idx.shape + ((table.shape[1],) if expand else ()),
                        jnp.float32)
        for k in range(K):
            mask = idx == k
            row = table[k]
            acc = jnp.where(mask[..., None] if expand else mask, row, acc)
        return acc
    if _ONEHOT_IMPL == "arith":
        # pure-f32 ramp (exact for int-valued idx): |idx - k| >= 1 -> 0,
        # == 0 -> 1. Fuses into the dot-operand fusion without the s32
        # broadcast + packed-pred materializations the int compare lowers
        # to (hlo_bytes: 2x20.5MB buffers per distinct one-hot on cornell)
        oh = jnp.maximum(0.0, 1.0 - jnp.abs(
            idx.astype(jnp.float32)[..., None]
            - jnp.arange(K, dtype=jnp.float32)))
    else:
        oh = (idx[..., None] == jnp.arange(K, dtype=jnp.int32)) \
            .astype(jnp.float32)
    # HIGHEST precision: TPU f32 matmuls default to one-pass bf16, which
    # would corrupt value-encoded int columns > 256
    if table.ndim == 1:
        return jnp.matmul(oh, table, precision=jax.lax.Precision.HIGHEST)
    return jnp.tensordot(oh, table, axes=([-1], [0]),
                         precision=jax.lax.Precision.HIGHEST)


def f32_to_i32(v):
    """Decode a value-encoded int column (exact for |v| < 2^24; round guards
    the ~1ulp error of bf16x3 matmul recovery)."""
    return jnp.round(v).astype(jnp.int32)


def pick3(v, k):
    """v[..., k] for k in {0,1,2} without a gather. v: (..., 3); k: (...)."""
    return jnp.where(k == 0, v[..., 0], jnp.where(k == 1, v[..., 1], v[..., 2]))


def f32_bits(i):
    """int32 -> f32 bit pattern (for packing int columns in f32 row matrices)."""
    return jax.lax.bitcast_convert_type(jnp.asarray(i, jnp.int32), jnp.float32)


def i32_bits(f):
    return jax.lax.bitcast_convert_type(jnp.asarray(f, jnp.float32), jnp.int32)


def pack_rows(*cols):
    """Pack columns (each (n,) f32/int32 or (n, k)) into one (n, C) f32 matrix.
    Int columns are bitcast. Returns (matrix, unpack_spec) where unpack_spec
    records (offset, width, is_int) per column for unpack_row."""
    parts = []
    spec = []
    off = 0
    for c in cols:
        c = np.asarray(c)
        is_int = np.issubdtype(c.dtype, np.integer) or c.dtype == bool
        if c.ndim == 1:
            c = c[:, None]
        w = c.shape[1]
        if is_int:
            parts.append(c.astype(np.int32).view(np.float32))
        else:
            parts.append(c.astype(np.float32))
        spec.append((off, w, bool(is_int)))
        off += w
    return np.concatenate(parts, axis=1), tuple(spec)


def unpack_col(rows, spec_entry):
    """rows: (..., C) gathered packed rows; spec_entry from pack_rows."""
    off, w, is_int = spec_entry
    v = rows[..., off:off + w]
    if is_int:
        v = i32_bits(v)
    if w == 1:
        v = v[..., 0]
    return v
