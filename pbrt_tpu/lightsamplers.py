"""Light samplers (reference lightsamplers.{h,cpp}; base/lightsampler.h:23:
Uniform, Power, BVH, Exhaustive).

Round 1: Uniform + Power (alias-table). The many-light BVH sampler
(Conty-Kulla) follows once large scenes land.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from .utils import sampling as sp

LS_UNIFORM = 0
LS_POWER = 1


@struct.dataclass
class LightSampler:
    kind: int = struct.field(pytree_node=False, default=LS_UNIFORM)
    n_lights: int = struct.field(pytree_node=False, default=0)
    alias: sp.AliasTable = None
    pmf_table: jnp.ndarray = None  # (L,)


def make_light_sampler(kind: str, light_powers: np.ndarray) -> LightSampler:
    n = len(light_powers)
    if kind == "power" and n > 0 and np.sum(light_powers) > 0:
        at = sp.AliasTable.build(light_powers)
        return LightSampler(kind=LS_POWER, n_lights=n, alias=at, pmf_table=at.pmf)
    pmf = jnp.full((max(n, 1),), 1.0 / max(n, 1), jnp.float32)
    return LightSampler(kind=LS_UNIFORM, n_lights=n, pmf_table=pmf)


def sample_light(ls: LightSampler, u):
    """u: (N,) -> (light_idx (N,), pmf (N,), u_remapped (N,))."""
    if ls.n_lights == 0:
        z = jnp.zeros_like(u)
        return jnp.full(u.shape, -1, jnp.int32), z, u
    if ls.kind == LS_POWER:
        return ls.alias.sample(u)
    n = ls.n_lights
    idx = jnp.clip((u * n).astype(jnp.int32), 0, n - 1)
    u_new = jnp.clip(u * n - idx.astype(jnp.float32), 0.0, 1.0 - 1e-7)
    return idx, jnp.full(u.shape, 1.0 / n, jnp.float32), u_new


def light_pmf(ls: LightSampler, light_idx):
    """PMF of picking light_idx (for MIS on BSDF-sampled light hits)."""
    if ls.n_lights == 0:
        return jnp.zeros(light_idx.shape, jnp.float32)
    return ls.pmf_table[jnp.clip(light_idx, 0, ls.n_lights - 1)]
