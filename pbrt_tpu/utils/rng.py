"""Counter-based RNG + hashing in pure uint32 ops (reference util/rng.h, util/hash.h).

The reference uses stateful PCG32 (64-bit state) plus MurmurHash64A for seed
decorrelation. On TPU we avoid 64-bit integers (not natively supported) and use
stateless counter-based 32-bit mixers instead: every random number is a pure
function of (seed, counter...) words, which is exactly what a jit/vmap pipeline
wants. Statistical quality: PCG-RXS-M-XS output permutation + murmur3-style
avalanche rounds — ample for Monte Carlo decorrelation.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)
_PCG_MULT = np.uint32(747796405)
_PCG_INC = np.uint32(2891336453)


def _u32(x):
    return jnp.asarray(x).astype(U32)


def fmix32(h):
    """murmur3 finalizer: full avalanche on 32 bits."""
    h = _u32(h)
    h = h ^ (h >> 16)
    h = h * _M1
    h = h ^ (h >> 13)
    h = h * _M2
    h = h ^ (h >> 16)
    return h


def pcg_hash(x):
    """PCG-RXS-M-XS 32-bit hash (O'Neill)."""
    state = _u32(x) * _PCG_MULT + _PCG_INC
    word = ((state >> ((state >> 28) + np.uint32(4))) ^ state) * np.uint32(277803737)
    return (word >> 22) ^ word


def hash_u32(*words):
    """Combine any number of uint32 words/arrays into one decorrelated uint32.

    Replaces the reference's MurmurHash64A-based Hash(...) (util/hash.h:116).
    Not bit-identical to the reference (which is 64-bit); serves the same role
    of per-pixel/per-dimension seed decorrelation.
    """
    with np.errstate(over="ignore"):
        h = np.uint32(0x9E3779B9)
        for w in words:
            h = fmix32(_u32(w) ^ (h * np.uint32(0x01000193) + np.uint32(0x517CC1B7)))
    return h


def hash_float(*words):
    return u32_to_float01(hash_u32(*words))


def u32_to_float01(u):
    """uint32 -> float32 in [0, 1): top 24 bits * 2^-24."""
    return (_u32(u) >> 8).astype(jnp.float32) * np.float32(2.0**-24)


def uniform_u32(seed, *counters):
    return hash_u32(seed, *counters)


def uniform_float(seed, *counters):
    return u32_to_float01(hash_u32(seed, *counters))


def uniform_float2(seed, *counters):
    u = hash_u32(seed, *counters)
    # second stream by one extra mixing round with distinct constant
    v = fmix32(u ^ np.uint32(0x6C078965))
    return jnp.stack([u32_to_float01(u), u32_to_float01(v)], axis=-1)


def reverse_bits_32(n):
    """Bit reversal (reference util/lowdiscrepancy.h ReverseBits32)."""
    n = _u32(n)
    n = ((n << 16) | (n >> 16))
    n = ((n & np.uint32(0x00FF00FF)) << 8) | ((n & np.uint32(0xFF00FF00)) >> 8)
    n = ((n & np.uint32(0x0F0F0F0F)) << 4) | ((n & np.uint32(0xF0F0F0F0)) >> 4)
    n = ((n & np.uint32(0x33333333)) << 2) | ((n & np.uint32(0xCCCCCCCC)) >> 2)
    n = ((n & np.uint32(0x55555555)) << 1) | ((n & np.uint32(0xAAAAAAAA)) >> 1)
    return n


def left_shift_2(x):
    """Spread bits of low 16 bits into even positions (Morton helper,
    reference util/math.h LeftShift2 / EncodeMorton2)."""
    x = _u32(x)
    x = (x ^ (x << 8)) & np.uint32(0x00FF00FF)
    x = (x ^ (x << 4)) & np.uint32(0x0F0F0F0F)
    x = (x ^ (x << 2)) & np.uint32(0x33333333)
    x = (x ^ (x << 1)) & np.uint32(0x55555555)
    return x


def encode_morton_2(x, y):
    return (left_shift_2(y) << 1) | left_shift_2(x)


class PCG32:
    """Host-side PCG32 (numpy uint64) for scene-build randomness.

    Matches the reference's PCG32 (util/rng.h:30) including the default
    state/sequence constants, so host-side shuffles (e.g. Halton digit
    permutations, BVH sampling) can be made reproducible.
    """
    PCG32_DEFAULT_STATE = np.uint64(0x853C49E6748FEA9B)
    PCG32_DEFAULT_STREAM = np.uint64(0xDA3E39CB94B95BDB)
    PCG32_MULT = np.uint64(0x5851F42D4C957F2D)

    def __init__(self, seq_index=None, offset=None):
        self.state = self.PCG32_DEFAULT_STATE
        self.inc = self.PCG32_DEFAULT_STREAM
        if seq_index is not None:
            self.set_sequence(np.uint64(seq_index),
                              np.uint64(offset) if offset is not None else None)

    def set_sequence(self, seq, offset=None):
        with np.errstate(over="ignore"):
            self.state = np.uint64(0)
            self.inc = (np.uint64(seq) << np.uint64(1)) | np.uint64(1)
            self.uniform_u32()
            if offset is None:
                offset = np.uint64(0x5D835D3B9C229B65)  # mix-in like Hash(seq)
            self.state += np.uint64(offset)
            self.uniform_u32()

    def uniform_u32(self):
        with np.errstate(over="ignore"):
            old = self.state
            self.state = old * self.PCG32_MULT + self.inc
            xorshifted = np.uint32(((old >> np.uint64(18)) ^ old) >> np.uint64(27))
            rot = np.uint32(old >> np.uint64(59))
            return np.uint32((xorshifted >> rot) | (xorshifted << ((~rot + np.uint32(1)) & np.uint32(31))))

    def uniform_float(self):
        return min(float(self.uniform_u32()) * 2.0**-32, 1.0 - 2.0**-24)

    def uniform_u32_bounded(self, b):
        threshold = np.uint32((2**32 - b) % b)
        while True:
            r = self.uniform_u32()
            if r >= threshold:
                return np.uint32(r % np.uint32(b))
