"""Bitsliced AES-256-CTR keystream on TPU (pure jnp, XLA-fused).

The reference expands all CRS randomness from AES-256-CTR (src/aes.c),
consuming ~20.7 GB of keystream per proof at release params.  TPUs have
no AES-NI and no fast byte gathers, so table lookups are out; instead the
cipher runs as a boolean circuit over uint32 bit planes: each of the 128
state bit positions is a vector of uint32 words, each word carrying that
bit for 32 independent blocks.  All S-boxes of all blocks in the batch
evaluate simultaneously on the VPU.

The S-box is computed algebraically — GF(2^8) inversion x^254 via an
addition chain (4 bitsliced multiplications + 8 squarings) followed by
the affine map — correct by construction from the Rijndael polynomial,
cross-checked against the generated-table host oracle.  CTR structure:
block = nonce (8B LE) || counter (8B LE), matching src/aes.c:104-144;
counter-mode means any shard can generate its keystream slice from
(seed, block index) alone — the property that makes the CRS compressed
format (seed + b-components) and multi-chip regeneration work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..oracle import aes as host_aes
from .bitslice import transpose32

_FULL = np.uint32(0xFFFFFFFF)  # numpy scalar: a literal, not a captured device constant

# x^(2i) mod the Rijndael polynomial, for the linear squaring map.
_SQ_TABLE = [1, 4, 16, 64, 27, 108, 171, 154]  # x^{2i} mod 0x11B, checked below


def _check_sq_table():
    for i in range(8):
        v = 1
        for _ in range(2 * i):
            v = host_aes._gf_mul(v, 2)
        assert v == _SQ_TABLE[i], (i, v)


_check_sq_table()


# --------------------------------------------------------------------------
# GF(2^8) bitsliced circuit (operates on lists of 8 identically-shaped
# uint32 arrays; index = coefficient of x^i in the polynomial basis).
# --------------------------------------------------------------------------


def _gf_mul_bits(a, b):
    """Schoolbook product + reduction mod x^8+x^4+x^3+x+1 (64 AND gates)."""
    c = [None] * 15
    for i in range(8):
        for j in range(8):
            t = a[i] & b[j]
            c[i + j] = t if c[i + j] is None else c[i + j] ^ t
    # x^k ≡ x^{k-4} + x^{k-5} + x^{k-7} + x^{k-8}  (from x^8 ≡ x^4+x^3+x+1)
    for k in range(14, 7, -1):
        c[k - 4] = c[k - 4] ^ c[k]
        c[k - 5] = c[k - 5] ^ c[k]
        c[k - 7] = c[k - 7] ^ c[k]
        c[k - 8] = c[k - 8] ^ c[k]
    return c[:8]


def _gf_square_bits(a):
    """Squaring is GF(2)-linear: out_k = xor of a_i with bit k of x^{2i}."""
    out = []
    for k in range(8):
        acc = None
        for i in range(8):
            if (_SQ_TABLE[i] >> k) & 1:
                acc = a[i] if acc is None else acc ^ a[i]
        out.append(acc)
    return out


def _sbox_bits(x):
    """AES S-box: x -> affine(x^254).  x^254 == inverse (and fixes 0)."""
    x2 = _gf_square_bits(x)
    x3 = _gf_mul_bits(x2, x)
    x12 = _gf_square_bits(_gf_square_bits(x3))
    x15 = _gf_mul_bits(x12, x3)
    x240 = x15
    for _ in range(4):
        x240 = _gf_square_bits(x240)
    x252 = _gf_mul_bits(x240, x12)
    b = _gf_mul_bits(x252, x2)  # x^254
    out = []
    for i in range(8):
        s = b[i] ^ b[(i + 4) % 8] ^ b[(i + 5) % 8] ^ b[(i + 6) % 8] ^ b[(i + 7) % 8]
        if (0x63 >> i) & 1:
            s = s ^ _FULL
        out.append(s)
    return out


def _xtime_bits(a):
    """Multiply by x in GF(2^8): shift + conditional reduction (free-ish)."""
    return [a[7], a[0] ^ a[7], a[1], a[2] ^ a[7], a[3] ^ a[7], a[4], a[5], a[6]]


# --------------------------------------------------------------------------
# Round structure.  State S: uint32 [16, 8, W] — [byte index (FIPS in[]
# order, byte i = state[r=i%4][c=i//4]), bit (LSB first), 32-block groups].
# --------------------------------------------------------------------------

# ShiftRows: new[r + 4c] = old[r + 4((c + r) % 4)]
_SHIFTROWS_PERM = np.array(
    [(i % 4) + 4 * (((i // 4) + (i % 4)) % 4) for i in range(16)], dtype=np.int32
)


def _sub_bytes(s):
    planes = [s[:, k, :] for k in range(8)]  # each [16, W]
    out = _sbox_bits(planes)
    return jnp.stack(out, axis=1)


def _shift_rows(s):
    # static slicing (no gather -> no captured index constants in Pallas)
    return jnp.stack([s[int(i)] for i in _SHIFTROWS_PERM])


def _mix_columns(s):
    a = s.reshape(4, 4, 8, s.shape[-1])  # [c, r, bit, W]
    rows = [[a[:, r, k] for k in range(8)] for r in range(4)]  # bits per row
    t = [rows[0][k] ^ rows[1][k] ^ rows[2][k] ^ rows[3][k] for k in range(8)]
    new_rows = []
    for r in range(4):
        xr = _xtime_bits([rows[r][k] ^ rows[(r + 1) % 4][k] for k in range(8)])
        new_rows.append([rows[r][k] ^ t[k] ^ xr[k] for k in range(8)])
    out = jnp.stack(
        [jnp.stack(new_rows[r], axis=1) for r in range(4)], axis=1
    )  # [c, r, bit, W]
    return out.reshape(16, 8, s.shape[-1])


def encrypt_planes(state: jnp.ndarray, rk_planes: jnp.ndarray) -> jnp.ndarray:
    """AES-256 on bitsliced state [16, 8, W] with rk_planes [15, 16, 8].

    Rounds 1..13 are homogeneous, so they run under lax.scan with the
    round key as the scanned input — keeps the traced graph at ~2 rounds
    of gates instead of 14 (compile-time control).
    """
    s = state ^ rk_planes[0][:, :, None]

    def round_fn(s, rk):
        s = _sub_bytes(s)
        s = _shift_rows(s)
        s = _mix_columns(s)
        return s ^ rk[:, :, None], None

    s, _ = jax.lax.scan(round_fn, s, rk_planes[1:14])
    # final round: no MixColumns
    s = _sub_bytes(s)
    s = _shift_rows(s)
    return s ^ rk_planes[14][:, :, None]


# --------------------------------------------------------------------------
# CTR-mode plumbing.
# --------------------------------------------------------------------------


def make_key(seed: bytes) -> dict:
    """Host-side key schedule for a 40-byte seed (nonce LE || key).

    Returns device constants: rk_planes uint32 [15,16,8] (0 / all-ones)
    and nonce_planes uint32 [8,8].
    """
    assert len(seed) == 40
    nonce = int.from_bytes(seed[:8], "little")
    key = seed[8:]
    rks = host_aes.key_expansion(key)  # [15, 16] bytes
    bits = (rks[:, :, None] >> np.arange(8)) & 1  # [15,16,8]
    rk_planes = (bits.astype(np.uint32) * 0xFFFFFFFF).astype(np.uint32)
    nbytes = np.frombuffer(int(nonce).to_bytes(8, "little"), dtype=np.uint8)
    nbits = (nbytes[:, None] >> np.arange(8)) & 1
    nonce_planes = (nbits.astype(np.uint32) * 0xFFFFFFFF).astype(np.uint32)
    return {
        "rk_planes": jnp.asarray(rk_planes),
        "nonce_planes": jnp.asarray(nonce_planes),
    }


def _ctr_planes(start_lo, start_hi, ngroups: int):
    """Bit planes of the 64-bit counters for ngroups*32 blocks.

    Returns (lo_planes, hi_planes): uint32 [32, ngroups] each — plane k of
    counter bit k, packed 32 blocks per word (block index = w*32 + b).
    """
    idx = jnp.arange(ngroups * 32, dtype=jnp.uint32)
    lo = start_lo + idx
    carry = (lo < start_lo).astype(jnp.uint32)
    hi = start_hi + carry
    # arrange as [32, W]: row b = block lane b within each group
    lo_m = lo.reshape(ngroups, 32).T
    hi_m = hi.reshape(ngroups, 32).T
    return transpose32(lo_m), transpose32(hi_m)


def keystream_blocks(key: dict, start_ctr, nblocks: int) -> jnp.ndarray:
    """Keystream for blocks [start_ctr, start_ctr + nblocks).

    start_ctr: python int or traced uint32 pair (lo, hi).
    nblocks: static, must be a multiple of 32.  Returns uint8 [nblocks, 16].
    """
    assert nblocks % 32 == 0
    ngroups = nblocks // 32
    if isinstance(start_ctr, (tuple, list)):
        lo, hi = start_ctr
    else:
        c = int(start_ctr)
        lo = jnp.uint32(c & 0xFFFFFFFF)
        hi = jnp.uint32(c >> 32)

    lo_p, hi_p = _ctr_planes(lo, hi, ngroups)
    nonce_p = jnp.broadcast_to(
        key["nonce_planes"][:, :, None], (8, 8, ngroups)
    )  # bytes 0-7
    ctr_p = jnp.concatenate([lo_p, hi_p], axis=0).reshape(8, 8, ngroups)
    state = jnp.concatenate([nonce_p, ctr_p], axis=0)  # [16, 8, W]

    out = encrypt_planes(state, key["rk_planes"])  # [16, 8, W]

    # un-bitslice: 4 uint32 words per block, LE byte order
    words = []
    for g in range(4):
        p32 = out[4 * g : 4 * g + 4].reshape(32, ngroups)
        words.append(transpose32(p32))  # [32, W] rows = block lanes
    w = jnp.stack(words, axis=0)  # [4, 32, W]
    w = w.transpose(2, 1, 0)  # [W, 32, 4]
    b = jax.lax.bitcast_convert_type(w, jnp.uint8)  # [W, 32, 4, 4]
    return b.reshape(nblocks, 16)


def keystream_bytes(key: dict, byte_offset: int, nbytes: int) -> jnp.ndarray:
    """Keystream bytes [byte_offset, byte_offset + nbytes).

    Offsets must be 16-byte aligned (all section bases are; see
    models/snark.py for the alignment argument).  nbytes is padded up to
    a 512-byte (32-block) boundary internally and sliced.
    """
    assert byte_offset % 16 == 0, "section base must be block aligned"
    start_block = byte_offset // 16
    nblocks = -(-nbytes // 16)
    nblocks_pad = -(-nblocks // 32) * 32
    ks = keystream_blocks(key, start_block, nblocks_pad)
    return ks.reshape(-1)[:nbytes]
