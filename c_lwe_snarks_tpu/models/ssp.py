"""SSP instances on TPU: dense uint32 coefficient tensors.

The reference stores an SSP as a flat byte buffer of (m+1) degree-<d
polynomials (src/ssp.h:6-9, 5.33 GiB at release params); here it is a
pair of device arrays — t: uint32 [d], v: uint32 [m, d] — sharded over m
at scale (parallel/mesh.py).  ``random_ssp`` reproduces src/ssp.c:37-77
draw-for-draw from a seeded entropy stream: m-bit input, then 8d bytes
per v_i interpreted as uint64-LE words reduced mod p, then
t = v_0 + sum_{input bit i-1} v_i - 1.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import modp, sampling
from ..utils.params import Params


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SSPDev:
    """Device-resident instance: t [d], v [m, d], all uint32 mod p."""

    t: jnp.ndarray
    v: jnp.ndarray


def entropy_bytes_random_ssp(params: Params) -> int:
    """Entropy stream bytes consumed by random_ssp (witness + m polys)."""
    return params.m // 8 + params.m * 8 * params.d


def witness_bits(w_bytes: jnp.ndarray, m: int) -> jnp.ndarray:
    """uint8 [ceil(m/8)] LE bytes -> uint8 bit vector [m] (LSB first)."""
    k = jnp.arange(m)
    return (w_bytes[k // 8] >> (k % 8).astype(jnp.uint8)) & 1


def random_ssp(
    key: sampling.PRGKey, byte_offset: int, params: Params
) -> tuple[jnp.ndarray, SSPDev]:
    """(witness bits uint8 [m], SSPDev) from the entropy stream.

    Draw order == src/ssp.c:37-77: input (m//8 bytes), then 8d bytes per
    v_i.  Each uint64-LE word is reduced mod p on import (the nmod_poly
    coercion of src/ssp.c:28-34).
    """
    m, d = params.m, params.d
    wb = m // 8
    ks = sampling.keystream_bytes(key, byte_offset, wb + m * 8 * d)
    wits = witness_bits(ks[:wb], m)
    words = ks[wb:].reshape(m, d, 8).astype(jnp.uint32)
    shifts = jnp.arange(4, dtype=jnp.uint32) * 8
    lo = jnp.sum(words[..., :4] << shifts, axis=-1)
    hi = jnp.sum(words[..., 4:] << shifts, axis=-1)
    v = modp.fold64_mod_p(hi, lo)  # [m, d]

    # t = v_0 + sum_{i>=1, input bit i-1} v_i - 1
    mask = jnp.concatenate([jnp.ones((1,), jnp.uint8), wits[: m - 1]])
    sel = jnp.where(mask[:, None].astype(bool), v, jnp.zeros_like(v))
    t = modp.sum_mod_p(sel, axis=0)
    t = t.at[0].set(modp.submod_p(t[0], jnp.uint32(1)))
    return wits, SSPDev(t=t, v=v)
