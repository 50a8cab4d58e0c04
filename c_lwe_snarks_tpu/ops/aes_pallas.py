"""Pallas TPU kernel for the bitsliced AES-256-CTR keystream.

The pure-jnp circuit in aes_tpu.py is correct but HBM-bound (~0.4 GB/s:
XLA spills plane intermediates between gate ops).  This kernel keeps the
entire 14-round cipher state in VMEM per tile, so the only HBM traffic is
the output keystream itself and throughput is VPU-gate-count-bound.

Layout (chosen for Mosaic): the state is 8 separate uint32 arrays of
shape [16, Wt] — one per *bit* position, rows indexed q = 4r + c (row-
major FIPS state), lanes = 32-block groups.  Every S-box gate is then a
full-tile elementwise op with no relayouts; ShiftRows is a static
rotation of 4-row groups; MixColumns slices row groups [4, Wt].

Same (nonce || counter) block structure as src/aes.c:104-144; bit-exact
against the host oracle (tests/test_aes_tpu.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..oracle import aes as host_aes
from . import modp
from .aes_tpu import _xtime_bits
# Folded BP S-box: computes S(x) ^ 0x63 in 115 XOR/AND gates; the 0x63
# constant is cancelled by the folded round keys from make_key_pallas.
from .sbox_bp import sbox_bits_bp as _sbox_bits

_FULL32 = np.uint32(0xFFFFFFFF)
from .bitslice import transpose32

# row q = 4r + c  <->  FIPS input byte i = r + 4c
_ROW_OF_BYTE = [4 * (i % 4) + i // 4 for i in range(16)]  # q for byte i
_BYTE_OF_ROW = [q // 4 + 4 * (q % 4) for q in range(16)]  # i for row q


def _shift_rows_rm(planes):
    """new[r][c] = old[r][(c+r)%4]: rotate each 4-row group left by r."""
    out = []
    for s in planes:
        gs = [s[4 * r : 4 * (r + 1)] for r in range(4)]
        gs = [
            g if r == 0 else jnp.concatenate([g[r:], g[:r]], axis=0)
            for r, g in enumerate(gs)
        ]
        out.append(jnp.concatenate(gs, axis=0))
    return out


def _mix_columns_rm(planes):
    """MixColumns on full [16, W] planes via sublane rolls.

    With rows q = 4r + c, state row r+1 sits 4 sublanes below row r, so
    u[r] = a[r] ^ a[r+1] for ALL r is one roll + one xor per plane, and
    t = a0^a1^a2^a3 (replicated to every row) is u ^ roll(u, 8).  This
    keeps every op on full 16-sublane tiles — the earlier [4, W]
    quarter-tile formulation left half of each 8-sublane vreg idle and
    measured ~10% slower end-to-end.
    """
    shifted = [pltpu.roll(p, 12, 0) for p in planes]  # [q] <- [q+4]
    u = [p ^ s for p, s in zip(planes, shifted)]
    t = [x ^ pltpu.roll(x, 8, 0) for x in u]
    xt = _xtime_bits(u)
    return [planes[k] ^ t[k] ^ xt[k] for k in range(8)]


def _kernel(start_ref, rk_ref, const_ref, out_ref, *, tile_w: int):
    i = pl.program_id(0)
    base_lo = start_ref[0] + jnp.uint32(i * tile_w * 32)
    carry0 = (base_lo < start_ref[0]).astype(jnp.uint32)
    base_hi = start_ref[1] + carry0

    idx = jax.lax.broadcasted_iota(jnp.uint32, (tile_w, 32), 1) + (
        jax.lax.broadcasted_iota(jnp.uint32, (tile_w, 32), 0) * jnp.uint32(32)
    )
    lo = base_lo + idx  # [Wt, 32]
    hi = base_hi + (lo < base_lo).astype(jnp.uint32)
    lo_p = transpose32(lo.T)  # [32, Wt]: row = ctr-lo bit
    hi_p = transpose32(hi.T)

    # Assemble initial state: 8 planes [16, Wt]; nonce rows are constant
    # (from const_ref), counter rows come from the transposed planes.
    planes = []
    for k in range(8):
        rows = []
        for q in range(16):
            byte = _BYTE_OF_ROW[q]
            if byte < 8:  # nonce byte: constant plane
                rows.append(jnp.full((1, tile_w), const_ref[k, q], jnp.uint32))
            else:
                j = byte - 8
                src = lo_p if j < 4 else hi_p
                rows.append(src[8 * (j % 4) + k][None, :])
        planes.append(jnp.concatenate(rows, axis=0))

    def ark(planes, rnd):
        return [p ^ rk_ref[rnd, k] for k, p in enumerate(planes)]

    planes = ark(planes, 0)

    def round_fn(rnd, planes):
        planes = _sbox_bits(planes)
        planes = _shift_rows_rm(planes)
        planes = _mix_columns_rm(planes)
        return [p ^ rk_ref[rnd, k] for k, p in enumerate(planes)]

    planes = jax.lax.fori_loop(1, 14, round_fn, planes, unroll=False)
    planes = _sbox_bits(planes)
    planes = _shift_rows_rm(planes)
    planes = ark(planes, 14)

    # un-bitslice: row 4b+g of the output tile = LE word g of block (w, b),
    # so that [Wt, 128] (after the caller's 2D transpose) bitcasts to the
    # flat keystream byte order w*512 + 16b + 4g + gg.
    words = []
    for g in range(4):
        rows = []
        for jj in range(4):
            q = _ROW_OF_BYTE[4 * g + jj]
            rows.extend(planes[k][q][None, :] for k in range(8))
        p32 = jnp.concatenate(rows, axis=0)  # [32, Wt]
        words.append(transpose32(p32))
    w = jnp.stack(words, axis=1)  # [32, 4, Wt]: [b, g, w]
    out_ref[0] = w.reshape(128, tile_w)  # leading-dim merge: row = 4b+g


@functools.cache
def _v2_meta_np() -> np.ndarray:
    """Static per-(plane, row) control tensors for _kernel_v2.

    uint32 [8, 4, 16, 1]: [k, 0] = left-shift placing the counter bit at
    bit 31; [k, 1] = ~0 where the row is a constant (nonce byte, or the
    in-word pattern rows k < 5 of counter byte 8); [k, 2] = ~0 on pattern
    rows; [k, 3] = ~0 on ctr-hi-word rows (bytes 12-15; plane-indep).
    """
    meta = np.zeros((8, 4, 16, 1), np.uint32)
    full = np.uint32(0xFFFFFFFF)
    for k in range(8):
        for q in range(16):
            byte = _BYTE_OF_ROW[q]
            shift = 0
            if byte < 8:
                meta[k, 1, q, 0] = full
            elif byte == 8:
                if k < 5:
                    meta[k, 1, q, 0] = meta[k, 2, q, 0] = full
                else:
                    shift = k - 5
            elif byte < 12:
                shift = 8 * (byte - 8) + k - 5
            else:
                shift = 8 * (byte - 12) + k
                meta[k, 3, q, 0] = full
            meta[k, 0, q, 0] = 31 - shift
    return meta


def _v2_meta_jnp() -> jnp.ndarray:
    # jnp.asarray per call: a cached device array would leak tracers when
    # first materialized inside a jit trace.
    return jnp.asarray(_v2_meta_np())


def _v2_group_words(start_ref, rk_ref, const_ref, meta_ref, *, tile_w: int):
    """Shared _kernel_v2 body: cipher the tile, return un-bitsliced words.

    Kernel-bisection on a v5e showed the 14 cipher rounds cost ~3 us/tile
    while counter assembly (transpose32 + 128 single-row concatenates) and
    the XLA-side [., 128, Wt] -> [., Wt, 128] transpose cost ~80 us.  This
    body (a) builds the counter bit planes directly with per-row static
    shift/select tensors — no bit-matrix transposes, no row concatenates —
    and (b) hands back the keystream as four uint32 [32, Wt] arrays
    ``words[g][b]`` = LE word g of block b, so each epilogue
    (_kernel_v2: raw words; _kernel_v2_fold: mod-p u64 folds) only
    restacks VMEM-resident data.
    """
    i = pl.program_id(0)
    base_lo = start_ref[0] + jnp.uint32(i * tile_w * 32)
    base_hi = start_ref[1] + (base_lo < start_ref[0]).astype(jnp.uint32)

    # Per-lane counter words: block (w, b) has ctr64 = base + 32w + b.
    # Split base_lo + 32w = (V0 << 5) + L: lanes share the 5-bit phase L,
    # and the 32 in-word blocks b only touch (V0, H0) through the carry
    # pattern C = {b : L + b >= 32}.
    L = base_lo & jnp.uint32(31)
    nz = L > 0
    # patterns as uint32 words over b: bit b of P_k(L) = bit k of (L+b)%32
    rot = lambda x: jnp.where(nz, (x >> L) | (x << (jnp.uint32(32) - L)), x)
    pats = [rot(jnp.uint32(p)) for p in
            (0xAAAAAAAA, 0xCCCCCCCC, 0xF0F0F0F0, 0xFF00FF00, 0xFFFF0000)]
    carry_pat = jnp.where(
        nz, _FULL32 << (jnp.uint32(32) - L), jnp.uint32(0)
    )  # bits b with L + b >= 32

    w_iota = jax.lax.broadcasted_iota(jnp.uint32, (1, tile_w), 1)
    t_lane = base_lo + (w_iota << 5)  # [1, W]
    v0 = t_lane >> 5  # upper 27 bits (lane-only part)
    v1 = v0 + 1
    h0 = base_hi + (t_lane < base_lo).astype(jnp.uint32)
    h1 = h0 + 1
    # hi-word carry only when the 27-bit part wraps AND b carries
    himask = (0 - (v0 == jnp.uint32(0x07FFFFFF)).astype(jnp.uint32)) & carry_pat

    hi = meta_ref[0, 3]  # [16, 1] ~0 on ctr-hi rows (plane-independent)
    vnc = (h0 & hi) | (v0 & ~hi)  # [16, W]
    vc = (h1 & hi) | (v1 & ~hi)
    cmask = (himask & hi) | (carry_pat & ~hi)

    planes = []
    for k in range(8):
        sh31 = meta_ref[k, 0]  # [16, 1] uint32 left-shift amounts
        ext = lambda v: (
            ((v << sh31).astype(jnp.int32) >> 31)
        ).astype(jnp.uint32)
        bit_nc = ext(vnc)
        word = bit_nc ^ ((bit_nc ^ ext(vc)) & cmask)
        constmask, patmask = meta_ref[k, 1], meta_ref[k, 2]
        patval = pats[k] if k < 5 else jnp.uint32(0)
        rowval = (patval & patmask) | (const_ref[k] & ~patmask)  # [16, 1]
        planes.append((rowval & constmask) | (word & ~constmask))

    planes = [p ^ rk_ref[0, k] for k, p in enumerate(planes)]

    def round_fn(rnd, planes):
        planes = _sbox_bits(planes)
        planes = _shift_rows_rm(planes)
        planes = _mix_columns_rm(planes)
        return [p ^ rk_ref[rnd, k] for k, p in enumerate(planes)]

    planes = jax.lax.fori_loop(1, 14, round_fn, planes, unroll=False)
    planes = _sbox_bits(planes)
    planes = _shift_rows_rm(planes)
    planes = [p ^ rk_ref[14, k] for k, p in enumerate(planes)]

    # un-bitslice: word g of a block gathers byte rows 4g..4g+3
    words = []
    for g in range(4):
        rows = []
        for jj in range(4):
            q = _ROW_OF_BYTE[4 * g + jj]
            rows.extend(planes[k][q][None, :] for k in range(8))
        p32 = jnp.concatenate(rows, axis=0)  # [32, Wt]
        words.append(transpose32(p32))  # [32(b), Wt]
    return words


def _kernel_v2(start_ref, rk_ref, const_ref, meta_ref, out_ref, *, tile_w: int):
    """Raw-keystream epilogue: row w of the output holds the 128 LE words
    (4b + g) of its 32 blocks, so the caller only bitcasts."""
    words = _v2_group_words(start_ref, rk_ref, const_ref, meta_ref,
                            tile_w=tile_w)
    w = jnp.stack(words, axis=1)  # [32(b), 4(g), Wt]
    out_ref[0] = w.reshape(128, tile_w).T  # [Wt, 128], col = 4b+g


def _kernel_v2_fold(start_ref, rk_ref, const_ref, meta_ref, out_ref, *,
                    tile_w: int):
    """Fused u64→mod-p fold epilogue (rand_modp / nmod-coercion stream).

    Each block's 4 LE words form two u64 draws (w0,w1) and (w2,w3);
    folding (hi*2^32 + lo) mod p in VMEM halves the HBM bytes written
    and removes the separate read-back fold pass the consumer would run
    (the keystream itself never reaches HBM).  Output [Wt, 64] uint32,
    col = 2b + j == flat u64-draw order of the stream.
    """
    words = _v2_group_words(start_ref, rk_ref, const_ref, meta_ref,
                            tile_w=tile_w)
    f0 = modp.fold64_mod_p(words[1], words[0])  # [32(b), Wt]
    f1 = modp.fold64_mod_p(words[3], words[2])
    w = jnp.stack([f0, f1], axis=1)  # [32(b), 2(j), Wt]
    out_ref[0] = w.reshape(64, tile_w).T  # [Wt, 64], col = 2b+j


def make_key_pallas(seed: bytes) -> dict:
    """Host key schedule in the kernel's row-major bit-plane layout.

    rk: uint32 [15, 8, 16, 1] (0 / all-ones), rows q = 4r + c.
    const: uint32 [8, 16] — nonce bit planes at nonce rows, 0 elsewhere.
    """
    assert len(seed) == 40
    nonce_bytes = np.frombuffer(seed[:8], dtype=np.uint8)
    rks = host_aes.key_expansion(seed[8:])  # [15, 16] bytes
    rk = np.zeros((15, 8, 16, 1), dtype=np.uint32)
    const = np.zeros((8, 16), dtype=np.uint32)
    for q in range(16):
        byte = _BYTE_OF_ROW[q]
        for k in range(8):
            rk[:, k, q, 0] = ((rks[:, byte] >> k) & 1).astype(np.uint32) * 0xFFFFFFFF
            if byte < 8:
                const[k, q] = np.uint32(int((nonce_bytes[byte] >> k) & 1) * 0xFFFFFFFF)
    # Fold the S-box affine constant 0x63 into round keys 1..14: the
    # kernels use the constant-free BP S-box (sbox_bp, S(x) ^ 0x63), and
    # the uniform 0x63 error state is invariant under ShiftRows (byte
    # permutation) and MixColumns (column weights 2^3^1^1 = 1), so one
    # plane flip per affected bit cancels it exactly — every NOT gate of
    # the S-box circuit moves into this free key-schedule XOR.
    from .sbox_bp import AFFINE_CONST

    for k in range(8):
        if (AFFINE_CONST >> k) & 1:
            rk[1:, k, :, 0] ^= np.uint32(0xFFFFFFFF)
    return {
        "rk_rm": jnp.asarray(rk),
        "const_rm": jnp.asarray(const),
        "const_rm2": jnp.asarray(const[:, :, None]),  # [8, 16, 1] for v2
    }


def keystream_blocks(
    key: dict, start_ctr, nblocks: int, *, tile_w: int = 512,
    interpret: bool = False, version: int = 2
) -> jnp.ndarray:
    """Keystream bytes uint8 [nblocks, 16] for counters [start, start+n)."""
    if isinstance(start_ctr, (tuple, list)):
        lo, hi = start_ctr
        lo = jnp.asarray(lo, jnp.uint32)
        hi = jnp.asarray(hi, jnp.uint32)
    else:
        c = int(start_ctr)
        lo = jnp.uint32(c & 0xFFFFFFFF)
        hi = jnp.uint32(c >> 32)

    blocks_per_tile = tile_w * 32
    ntiles = -(-nblocks // blocks_per_tile)
    ngroups = ntiles * tile_w

    if version == 2:
        out = pl.pallas_call(
            functools.partial(_kernel_v2, tile_w=tile_w),
            out_shape=jax.ShapeDtypeStruct((ntiles, tile_w, 128), jnp.uint32),
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (15, 8, 16, 1), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (8, 16, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (8, 4, 16, 1), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, tile_w, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(jnp.stack([lo, hi]), key["rk_rm"], key["const_rm2"], _v2_meta_jnp())
        b = jax.lax.bitcast_convert_type(out, jnp.uint8)
        return b.reshape(ngroups * 32, 16)[:nblocks]

    out = pl.pallas_call(
        functools.partial(_kernel, tile_w=tile_w),
        out_shape=jax.ShapeDtypeStruct((ntiles, 128, tile_w), jnp.uint32),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((15, 8, 16, 1), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 128, tile_w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(jnp.stack([lo, hi]), key["rk_rm"], key["const_rm"])

    # [tiles, 128, Wt] -T-> [tiles, Wt, 128] -> LE bytes in flat stream order
    b = jax.lax.bitcast_convert_type(out.transpose(0, 2, 1), jnp.uint8)
    return b.reshape(ngroups * 32, 16)[:nblocks]


def keystream_words(
    key: dict, start_ctr, nblocks: int, *, tile_w: int = 512,
    interpret: bool = False
) -> jnp.ndarray:
    """Keystream as uint32 [4 * nblocks] little-endian stream words.

    The uint8 view of this array IS the byte stream, but no u32->u8
    bitcast is materialized: on TPU a dtype bitcast is a physical
    re-tiling pass that measured as ~half of total keystream wall time.
    Hot consumers (expand_a) extract bytes with fused shifts instead.
    """
    if isinstance(start_ctr, (tuple, list)):
        lo, hi = start_ctr
        lo = jnp.asarray(lo, jnp.uint32)
        hi = jnp.asarray(hi, jnp.uint32)
    else:
        c = int(start_ctr)
        lo = jnp.uint32(c & 0xFFFFFFFF)
        hi = jnp.uint32(c >> 32)
    blocks_per_tile = tile_w * 32
    ntiles = -(-nblocks // blocks_per_tile)
    out = pl.pallas_call(
        functools.partial(_kernel_v2, tile_w=tile_w),
        out_shape=jax.ShapeDtypeStruct((ntiles, tile_w, 128), jnp.uint32),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (15, 8, 16, 1), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((8, 16, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (8, 4, 16, 1), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_w, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(jnp.stack([lo, hi]), key["rk_rm"], key["const_rm2"], _v2_meta_jnp())
    return out.reshape(-1)[: 4 * nblocks]


def keystream_fold_p(
    key: dict, start_ctr, npairs: int, *, tile_w: int = 512,
    interpret: bool = False
) -> jnp.ndarray:
    """uint32 [npairs]: (w_{2k+1}·2^32 + w_{2k}) mod p over stream words.

    The fused form of ``fold64_mod_p(keystream_words(...))`` — the
    uniform-mod-p u64 draw stream of rand_modp / the nmod_poly coercion
    (src/lwe.h:97-103, src/ssp.c:28-34) — with the fold running in VMEM
    inside the cipher kernel, so HBM sees only the folded values (half
    the keystream bytes, no read-back pass).  ``start_ctr`` is the
    counter of the first block consumed; draw k reads words 2k, 2k+1.
    """
    if isinstance(start_ctr, (tuple, list)):
        lo, hi = start_ctr
        lo = jnp.asarray(lo, jnp.uint32)
        hi = jnp.asarray(hi, jnp.uint32)
    else:
        c = int(start_ctr)
        lo = jnp.uint32(c & 0xFFFFFFFF)
        hi = jnp.uint32(c >> 32)
    pairs_per_tile = tile_w * 64
    ntiles = -(-npairs // pairs_per_tile)
    out = pl.pallas_call(
        functools.partial(_kernel_v2_fold, tile_w=tile_w),
        out_shape=jax.ShapeDtypeStruct((ntiles, tile_w, 64), jnp.uint32),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (15, 8, 16, 1), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((8, 16, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (8, 4, 16, 1), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_w, 64), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(jnp.stack([lo, hi]), key["rk_rm"], key["const_rm2"], _v2_meta_jnp())
    return out.reshape(-1)[:npairs]


def keystream_bytes(
    key: dict, byte_offset: int, nbytes: int, *, tile_w: int = 512, interpret: bool = False
) -> jnp.ndarray:
    """Keystream bytes [byte_offset, byte_offset + nbytes); offset % 16 == 0."""
    assert byte_offset % 16 == 0, "section base must be block aligned"
    nblocks = -(-nbytes // 16)
    ks = keystream_blocks(
        key, byte_offset // 16, nblocks, tile_w=tile_w, interpret=interpret
    )
    return ks.reshape(-1)[:nbytes]
