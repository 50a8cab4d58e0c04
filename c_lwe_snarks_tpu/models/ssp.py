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


def witness_pad_bytes(params: Params) -> tuple[int, int]:
    """(witness draw bytes, pad to the next AES-block boundary).

    The reference draws the instance from getrandom(2) with no stream
    layout at all (src/ssp.c:56,62); the seeded layout here is this
    framework's protocol definition, and block-aligning the polynomial
    section lets every m-tile regenerate its slice from pure counter
    arithmetic (and shard over chips the same way)."""
    wb = params.m // 8
    return wb, (-wb) % 16


def entropy_bytes_random_ssp(params: Params) -> int:
    """Entropy stream bytes consumed by random_ssp (witness + m polys)."""
    wb, pad = witness_pad_bytes(params)
    return wb + pad + params.m * 8 * params.d


def witness_bits(w_bytes: jnp.ndarray, m: int) -> jnp.ndarray:
    """uint8 [m//8] LE bytes -> uint8 bit vector [m] (LSB first).

    The draw is floor(m/8) bytes (urandomb's floor-byte discipline,
    src/entropy.c:11-26), so the top m % 8 witness bits are ZERO by
    definition — at the release m=21845 that is bits 21840-21844.  The
    gather index is clamped and the tail masked explicitly: XLA clamps
    out-of-bounds gathers, which would otherwise silently duplicate the
    last byte's bits for those positions (oracle/TPU divergence).
    """
    nbytes = w_bytes.shape[0]
    if nbytes == 0:
        return jnp.zeros((m,), jnp.uint8)
    k = jnp.arange(m)
    bits = (w_bytes[jnp.minimum(k // 8, nbytes - 1)]
            >> (k % 8).astype(jnp.uint8)) & 1
    return jnp.where(k < 8 * nbytes, bits, jnp.uint8(0))


def gen_v_scan(
    key: sampling.PRGKey, ctr0, mask: jnp.ndarray, d: int, tile: int,
    axis_name: str | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Generate ``rows`` v-polynomials from block counter ``ctr0``.

    mask: uint8 [rows] (rows % tile == 0) t-gate per row.  Returns
    (v uint32 [rows, d], masked mod-p column sum uint32 [d]).  Shared by
    the single-chip scan and the per-shard body of
    parallel/mesh.random_ssp_sharded (each shard's counter is pure
    arithmetic because a polynomial row is exactly 8d stream bytes);
    sharded callers pass ``axis_name`` so the scan carry starts
    device-varying.  Each tile rides the fused keystream→fold kernel.
    (A single flat kernel over all rows + one gated row-sum was measured
    SLOWER on a v5e — 0.26-0.28 s vs 0.225 s at release shapes — than
    this scan, which overlaps each tile's fold kernel with the previous
    tile's t-accumulation ops.)
    """
    rows = mask.shape[0]
    assert rows % tile == 0, (rows, tile)
    blocks_per_tile = tile * 8 * d // 16

    def step(carry, mask_t):
        ctr, t_acc = carry
        # fused keystream→fold kernel: raw words never reach HBM (on TPU)
        vi = sampling.keystream_fold_p(key, ctr, tile * d).reshape(tile, d)
        sel = jnp.where(mask_t[:, None].astype(bool), vi, jnp.zeros_like(vi))
        t_acc = modp.addmod_p(t_acc, modp.sum_mod_p(sel, axis=0))
        return (sampling.advance_ctr(*ctr, blocks_per_tile), t_acc), vi

    t0 = jnp.zeros((d,), jnp.uint32)
    if axis_name is not None:
        t0 = jax.lax.pcast(t0, axis_name, to="varying")
    (_, t), v = jax.lax.scan(step, (ctr0, t0), mask.reshape(-1, tile))
    return v.reshape(rows, d), t


def random_ssp(
    key: sampling.PRGKey, byte_offset: int, params: Params, *, tile: int = 64
) -> tuple[jnp.ndarray, SSPDev]:
    """(witness bits uint8 [m], SSPDev) from the entropy stream.

    Draw order == src/ssp.c:37-77: input (m//8 bytes, block-padded), then
    8d bytes per v_i.  Each uint64-LE word is reduced mod p on import
    (the nmod_poly coercion of src/ssp.c:28-34).  Polynomials generate in
    m-tiles inside a lax.scan; each tile rides the fused keystream→fold
    kernel (ops/aes_pallas.keystream_fold_p) so the raw word stream —
    5.7 GB at release scale — never reaches HBM, and t accumulates
    in-scan, never materializing a masked copy of v.  tile=64 measured
    fastest on a v5e with the fused kernel (16 MB of folded v per step).
    """
    m, d = params.m, params.d
    wb, pad = witness_pad_bytes(params)
    assert byte_offset % 16 == 0, "random_ssp section must be block-aligned"
    wits = witness_bits(sampling.keystream_bytes(key, byte_offset, wb), m)

    tile = min(tile, m)
    m_pad = -(-m // tile) * tile
    _, ctr0 = sampling.split_offset(byte_offset + wb + pad)
    # t-mask: v_0 always, v_i gated by witness bit i-1; padding rows off.
    mask = jnp.concatenate(
        [jnp.ones((1,), jnp.uint8), wits[: m - 1],
         jnp.zeros((m_pad - m,), jnp.uint8)]
    )
    v, t = gen_v_scan(key, ctr0, mask, d, tile)
    v = v[:m]
    t = t.at[0].set(modp.submod_p(t[0], jnp.uint32(1)))
    return wits, SSPDev(t=t, v=v)
