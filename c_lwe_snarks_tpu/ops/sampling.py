"""Keystream → digit-tensor sampling: the PRG/bignum bridge.

The reference samples mod-q integers by filling GMP limbs with PRG bytes,
92 bytes per 736-bit draw (``mpz2_urandomb``, reference src/entropy.c:11-26),
and re-expands every ciphertext's a-vector from the stream on import
(src/lwe.c:122-126).  Here the same byte stream becomes uint8 digit
tensors directly: a batch of draws is ``keystream[offset : offset+c*92]``
reshaped to ``[c, 92]``, and the mod-2^704 arithmetic layer keeps only
the low 88 digits (truncation is a ring hom — SURVEY §2 quirk 1 — so
dropping the top 4 bytes before arithmetic changes no reduced result).

Section offsets in the CRS stream (CTR_* of src/snark.h:8-12) are NOT
AES-block aligned (CTR_CT = 135,240 = 16·8452.5), so the keystream
helpers here accept arbitrary byte offsets: they over-generate from the
enclosing block boundary and slice.  Counters may be traced uint32 pairs,
which is what lets eval_poly regenerate its a-tiles inside a lax.scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import aes_pallas, aes_tpu, modp


class PRGKey:
    """Device-resident AES-256-CTR key material for both kernel backends.

    seed = 8 nonce bytes (LE) || 32 key bytes, as in the reference's
    ``rseed_t`` (src/entropy.h:34-35, src/entropy.c:58-61).
    """

    def __init__(self, seed: bytes):
        assert len(seed) == 40
        self.seed = seed
        self.jnp_key = aes_tpu.make_key(seed)
        self.pallas_key = aes_pallas.make_key_pallas(seed)


@functools.cache
def _default_backend() -> str:
    return "pallas" if jax.default_backend() == "tpu" else "jnp"


def keystream_blocks(key: PRGKey, start_ctr, nblocks: int, *, backend: str = "auto"):
    """uint8 [nblocks, 16] for counters [start, start+n); start may be traced."""
    if backend == "auto":
        backend = _default_backend()
    if backend == "pallas":
        return aes_pallas.keystream_blocks(key.pallas_key, start_ctr, nblocks)
    return aes_tpu.keystream_blocks(key.jnp_key, start_ctr, _pad32(nblocks))[:nblocks]


def _pad32(n: int) -> int:
    return -(-n // 32) * 32


def keystream_bytes(
    key: PRGKey, byte_offset, nbytes: int, *, backend: str = "auto"
) -> jnp.ndarray:
    """Keystream bytes [byte_offset, byte_offset + nbytes), any alignment.

    ``byte_offset`` is either a python int or ``(offset_static_skip,
    traced_block_ctr)`` — see ``split_offset``.  ``nbytes`` is static.
    """
    if isinstance(byte_offset, tuple):
        skip, (lo, hi) = byte_offset
    else:
        byte_offset = int(byte_offset)
        skip = byte_offset % 16
        blk = byte_offset // 16
        lo, hi = jnp.uint32(blk & 0xFFFFFFFF), jnp.uint32(blk >> 32)
    if isinstance(skip, (int, np.integer)):
        nblocks = -(-(int(skip) + nbytes) // 16)
    else:
        # Traced intra-block skip (sharded callers pass per-shard stream
        # positions as device scalars): over-generate one block and slice
        # at the traced start.
        nblocks = -(-(15 + nbytes) // 16)
    ks = keystream_blocks(key, (lo, hi), nblocks, backend=backend)
    return jax.lax.dynamic_slice_in_dim(ks.reshape(-1), skip, nbytes)


def split_offset(byte_offset: int):
    """Split a static byte offset into (skip, (ctr_lo, ctr_hi)) for tracing."""
    skip = byte_offset % 16
    blk = byte_offset // 16
    return skip, (jnp.uint32(blk & 0xFFFFFFFF), jnp.uint32(blk >> 32))


def offset_parts(byte_offset: int) -> np.ndarray:
    """Static byte offset -> uint32 [3] = (skip, ctr_lo, ctr_hi).

    Host-side form of ``split_offset`` used by the sharded layers: per-
    shard stream positions are computed as python ints, stacked to a
    [P, 3] array, and sharded over the mesh so each shard reads its own
    (traced) position (parallel/mesh.py).
    """
    skip = byte_offset % 16
    blk = byte_offset // 16
    return np.asarray([skip, blk & 0xFFFFFFFF, blk >> 32], dtype=np.uint32)


def parts_to_offset(parts: jnp.ndarray):
    """uint32 [3] (possibly traced) -> (skip, (ctr_lo, ctr_hi))."""
    return parts[0], (parts[1], parts[2])


def advance_ctr(lo, hi, nblocks: int):
    """64-bit counter addition on a traced (lo, hi) uint32 pair."""
    nlo = lo + jnp.uint32(nblocks & 0xFFFFFFFF)
    carry = (nlo < lo).astype(jnp.uint32)
    return nlo, hi + jnp.uint32(nblocks >> 32) + carry


def sample_digit_rows(
    key: PRGKey,
    byte_offset,
    count: int,
    *,
    draw_bytes: int = 92,
    ndigits: int = 88,
    backend: str = "auto",
) -> jnp.ndarray:
    """``count`` sequential PRG draws as uint8 digit rows [count, ndigits].

    Each draw consumes exactly ``draw_bytes`` keystream bytes (the
    reference's floor-byte discipline, src/entropy.c:17-22) and keeps the
    low ``ndigits`` as little-endian base-256 digits.

    Word-aligned offsets take the word-native path: keystream words are
    byte-extracted with fused shifts over groups of P rows (P = the row
    period at which draw_bytes realigns to words), avoiding the u32->u8
    bitcast relayout that dominated the byte path's wall time — same
    bytes, same floor-byte discipline (tests/test_oracle.py pins both
    paths to the host oracle).
    """
    if isinstance(byte_offset, (int, np.integer)) and int(byte_offset) % 4 == 0:
        off = int(byte_offset)
        period = 4 // np.gcd(draw_bytes, 4)  # rows per word-aligned group
        padded = -(-count // period) * period
        total = padded * draw_bytes
        skip = off % 16
        nblocks = -(-(skip + total) // 16)
        _, ctr = split_offset(off)
        words = keystream_words(key, ctr, nblocks, backend=backend)
        rows_w = jax.lax.dynamic_slice_in_dim(
            words, skip // 4, total // 4
        ).reshape(padded // period, period * draw_bytes // 4)
        shifts = jnp.arange(4, dtype=jnp.uint32) * 8
        b = ((rows_w[..., None] >> shifts) & jnp.uint32(255)).astype(jnp.uint8)
        rows = b.reshape(padded, draw_bytes)
        return rows[:count, :ndigits]
    ks = keystream_bytes(key, byte_offset, count * draw_bytes, backend=backend)
    rows = ks.reshape(count, draw_bytes)
    return rows[:, :ndigits]


def keystream_words(
    key: PRGKey, start_ctr, nblocks: int, *, backend: str = "auto"
) -> jnp.ndarray:
    """uint32 [4 * nblocks] LE stream words for counters [start, start+n).

    The hot-path form of the keystream: on TPU the Pallas kernel emits
    words directly and consumers extract bytes with fused shifts — a
    u32->u8 bitcast is a physical re-tiling pass on TPU and measured as
    ~half of total keystream wall time.
    """
    if backend == "auto":
        backend = _default_backend()
    if backend == "pallas":
        return aes_pallas.keystream_words(key.pallas_key, start_ctr, nblocks)
    ks = aes_tpu.keystream_blocks(key.jnp_key, start_ctr, _pad32(nblocks))[:nblocks]
    # CPU/jnp path: bitcast is cheap off-TPU and keeps bit-exact coverage
    # of the word-consuming callers in the CPU test suite.
    return jax.lax.bitcast_convert_type(
        ks.reshape(nblocks, 4, 4), jnp.uint32
    ).reshape(-1)


def keystream_fold_p(
    key: PRGKey, start_ctr, npairs: int, *, backend: str = "auto"
) -> jnp.ndarray:
    """uint32 [npairs] mod-p folds of consecutive u64-LE stream words.

    Draw k is (word[2k+1]·2^32 + word[2k]) mod p — the rand_modp /
    nmod-coercion stream (src/lwe.h:97-103, src/ssp.c:28-34).  On TPU
    the fold runs inside the cipher kernel (aes_pallas.keystream_fold_p)
    so the raw keystream never touches HBM; the jnp path folds the word
    stream and keeps bit-exact CPU coverage of the same consumers.
    """
    if backend == "auto":
        backend = _default_backend()
    if backend == "pallas":
        return aes_pallas.keystream_fold_p(key.pallas_key, start_ctr, npairs)
    words = keystream_words(key, start_ctr, -(-npairs // 2), backend=backend)
    w = words[: 2 * npairs].reshape(npairs, 2)
    return modp.fold64_mod_p(w[:, 1], w[:, 0])


def expand_a(
    key: PRGKey,
    byte_offset,
    count: int,
    n: int,
    *,
    draw_bytes: int = 92,
    ndigits: int = 88,
    backend: str = "auto",
) -> jnp.ndarray:
    """a-matrices for ``count`` ciphertexts: uint8 [count, n, ndigits].

    One ciphertext's expansion consumes n*draw_bytes = CTR_CT stream bytes
    (src/snark.h:8); a batch is one contiguous slab, byte-identical to
    ``count`` sequential ct_import calls (src/lwe.c:122-126).
    """
    if draw_bytes % 4 == 0 and ndigits % 4 == 0:
        skip, ctr = (byte_offset if isinstance(byte_offset, tuple)
                     else split_offset(byte_offset))
        aligned = (skip % 4 == 0) if isinstance(skip, (int, np.integer)) else True
        if aligned:
            # word path: extract bytes with fused shifts, no u8 bitcast.
            # Hot-path skips are 0 or 8 (section offsets are multiples of
            # CTR_CT = 92n with n even); traced skips from the sharded
            # layers are word-aligned for the same reason.
            total = count * n * draw_bytes
            nblocks = -(-(15 + total) // 16) if not isinstance(
                skip, (int, np.integer)
            ) else -(-(int(skip) + total) // 16)
            words = keystream_words(key, ctr, nblocks, backend=backend)
            w0 = skip // 4 if not isinstance(skip, (int, np.integer)) else int(skip) // 4
            rows = jax.lax.dynamic_slice_in_dim(
                words, w0, count * n * (draw_bytes // 4)
            ).reshape(count, n, draw_bytes // 4)[:, :, : ndigits // 4]
            shifts = jnp.arange(4, dtype=jnp.uint32) * 8
            d = ((rows[..., None] >> shifts) & jnp.uint32(255)).astype(jnp.uint8)
            return d.reshape(count, n, ndigits)
    ks = keystream_bytes(key, byte_offset, count * n * draw_bytes, backend=backend)
    rows = ks.reshape(count, n, draw_bytes)
    return rows[:, :, :ndigits]
