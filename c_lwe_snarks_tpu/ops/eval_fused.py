"""Fused AES-keystream Pallas kernels: eval_poly and the setup encrypt
loop without HBM round-trips.

Two kernels share one AES tile generator (_aes_pair_tile) and differ only
in the MXU contraction that follows: _mac_kernel contracts ciphertext
ROWS against per-term coefficients (the prover's eval_poly,
src/lwe.c:176-186), _enc_kernel contracts BYTE COLUMNS within each row
against a banded sk-digit matrix (the setup loop's <sk, a>,
src/snark.c:75-110 / src/lwe.c:20-28).

The two-stage eval pipeline (ops/aes_pallas.py keystream kernel + XLA
expand/matmul, models/lwe.py:262-314) measures 9.2 GB/s effective against
16.6 GB/s for the keystream kernel alone: ~45% of eval wall time is the
keystream's HBM write + read-back, the u32->u8 relayout, and the separate
MAC dispatch.  This kernel runs the MAC *inside* the AES tile loop, so
keystream words never leave VMEM and the only HBM traffic is the small
coefficient blocks in and the int32 accumulator blocks out.

Work decomposition (reference semantics: src/lwe.c:176-186 summed over
the degree axis, a-vectors re-expanded from the CRS stream per
src/snark.h:8-12):

* ciphertext *pairs* are the row unit — one ciphertext consumes
  CTR_CT = 92n stream bytes, a half-integer number of AES blocks for the
  release n=1470, but a pair is always block-aligned (n even);
* the keystream is generated column-major over the pair matrix: one grid
  step bitslices 32 consecutive block-columns x ``lane_w`` pair-rows —
  legal because CTR mode makes every block an independent function of
  its counter (counter = section_base + pair_row * STRIDE + block_col);
* each step's [128 word-cols, lane_w] tile is MACed on the MXU against
  the step's coefficient block ([lane_w, 8k]: even-ct and odd-ct
  coefficient bytes side by side) and accumulated into a per-column-chunk
  int32 output block that stays resident across the row-chunk sweep
  (grid = (col_chunks, row_chunks), rows minor);
* byte column j of a pair row belongs to the even ciphertext when
  j < CTR_CT, else to the odd one — selected per word-column in-kernel.

The XLA epilogue just transposes the [C, 4, 128, 4k] accumulator to byte
order, adds the even/odd halves, drops the 4 dead bytes of each 92-byte
draw (mod-2^704 truncation, SURVEY quirk 1), MACs the stored b-rows with
one small matmul, and carry-folds — bit-identical to eval_poly_multi.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import digits as dg
from .aes_pallas import _ROW_OF_BYTE, _mix_columns_rm, _shift_rows_rm, _v2_meta_np
from .sbox_bp import sbox_bits_bp as _sbox_bits  # folded: needs folded rks
from .bitslice import transpose32

_FULL32 = np.uint32(0xFFFFFFFF)


def _aes_pair_tile(
    start_ref, rk_ref, const_ref, meta_ref, c, r, *, lane_w: int, stride: int
) -> jnp.ndarray:
    """One AES tile of the pair-major keystream matrix, as uint32 words.

    Lanes = pair rows r*lane_w + w of a section whose pair stride is
    ``stride`` blocks; word-columns = the 128 LE words of the 32
    consecutive blocks at block-column chunk c.  Returns uint32
    [128, lane_w], row 4b + g = word g of in-chunk block b.  Shared by
    the eval MAC kernel and the encrypt kernel — the whole cipher runs
    identically; only the contraction that follows differs.
    """
    # ---- per-step base counter: section + r*lane_w*stride + 32*c --------
    step = jnp.uint32(r) * jnp.uint32(lane_w * stride) + jnp.uint32(c) * jnp.uint32(32)
    base_lo = start_ref[0] + step
    base_hi = start_ref[1] + (base_lo < start_ref[0]).astype(jnp.uint32)

    # ---- per-lane counters: lane w is pair-row r*lane_w + w -------------
    w_iota = jax.lax.broadcasted_iota(jnp.uint32, (1, lane_w), 1)
    t_lane = base_lo + w_iota * jnp.uint32(stride)  # [1, W]
    h_lane = base_hi + (t_lane < base_lo).astype(jnp.uint32)

    # Within a lane the 32 blocks are consecutive counters t_lane + b.
    # Unlike aes_pallas._kernel_v2 the low-5-bit phase L varies per lane
    # (stride % 32 != 0 in general), so the bit patterns P_k(L) and the
    # carry pattern are per-lane vectors instead of scalars.
    L = t_lane & jnp.uint32(31)  # [1, W]
    nz = L > 0
    sh = (jnp.uint32(32) - L) & jnp.uint32(31)  # guarded: unused when L==0

    def rot(p):
        pv = jnp.uint32(p)
        return jnp.where(nz, (pv >> L) | (pv << sh), pv)

    pats = [rot(p) for p in
            (0xAAAAAAAA, 0xCCCCCCCC, 0xF0F0F0F0, 0xFF00FF00, 0xFFFF0000)]
    carry_pat = jnp.where(nz, _FULL32 << sh, jnp.uint32(0))  # [1, W]

    v0 = t_lane >> 5
    v1 = v0 + 1
    h0 = h_lane
    h1 = h0 + 1
    himask = (0 - (v0 == jnp.uint32(0x07FFFFFF)).astype(jnp.uint32)) & carry_pat

    hi = meta_ref[0, 3]  # [16, 1] ~0 on ctr-hi rows
    vnc = (h0 & hi) | (v0 & ~hi)  # [16, W]
    vc = (h1 & hi) | (v1 & ~hi)
    cmask = (himask & hi) | (carry_pat & ~hi)

    planes = []
    for k in range(8):
        sh31 = meta_ref[k, 0]  # [16, 1] left-shift placing bit at 31
        ext = lambda v: (((v << sh31).astype(jnp.int32)) >> 31).astype(jnp.uint32)
        bit_nc = ext(vnc)
        word = bit_nc ^ ((bit_nc ^ ext(vc)) & cmask)
        constmask, patmask = meta_ref[k, 1], meta_ref[k, 2]
        patval = pats[k] if k < 5 else jnp.uint32(0)
        rowval = (patval & patmask) | (const_ref[k] & ~patmask)  # [16, W]|[16,1]
        planes.append((rowval & constmask) | (word & ~constmask))

    # ---- 14-round AES-256 (identical to aes_pallas._kernel_v2) ----------
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

    # ---- un-bitslice to [128 word-cols, W] (no final transpose needed:
    # both consumers contract over a tile axis, so word-major is right)
    words = []
    for g in range(4):
        rows = []
        for jj in range(4):
            q = _ROW_OF_BYTE[4 * g + jj]
            rows.extend(planes[k][q][None, :] for k in range(8))
        p32 = jnp.concatenate(rows, axis=0)  # [32, W]
        words.append(transpose32(p32))  # [32(b), W]
    return jnp.stack(words, axis=1).reshape(128, lane_w)  # row = 4b+g


def _out_struct(shape, dtype, vma):
    """ShapeDtypeStruct for a pallas_call output, with mesh-varying axes.

    Under shard_map (parallel/mesh.py) jax's vma checking requires the
    kernel's out_shape to declare which mesh axes the output varies over;
    outside shard_map vma must stay unset."""
    if vma is None:
        return jax.ShapeDtypeStruct(shape, dtype)
    return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(vma))


def _offset_lead_start(section_offset):
    """Static int or traced (lead, (ctr_lo, ctr_hi)) -> (lead, SMEM start).

    The traced form carries the ALIGNED base block counter (the counter of
    byte offset - lead, matching sampling.split_offset's decomposition);
    lead must be a static python int either way (it shapes the kernel).
    """
    if isinstance(section_offset, tuple):
        lead, (lo, hi) = section_offset
        lead = int(lead)
        start = jnp.stack(
            [jnp.asarray(lo, jnp.uint32), jnp.asarray(hi, jnp.uint32)]
        )
    else:
        lead = int(section_offset) % 16
        base = (int(section_offset) - lead) // 16
        start = jnp.asarray([base & 0xFFFFFFFF, base >> 32], jnp.uint32)
    assert lead % 8 == 0, section_offset
    return lead, start


def _mac_kernel(
    start_ref,      # SMEM uint32 [2]: section base block counter (lo, hi)
    rk_ref,         # VMEM uint32 [15, 8, 16, 1]
    const_ref,      # VMEM uint32 [8, 16, 1]
    meta_ref,       # VMEM uint32 [8, 4, 16, 1]
    cb_ref,         # VMEM int8  [lane_w, 8k+1]: recentred coeffs + ones col
    out_ref,        # VMEM int32 [1, 512, 8k+1]: per-col-chunk raw accumulator
    *,
    lane_w: int,
    stride: int,    # pair block stride = 2 * ctr_ct / 16
    planes4k: int,  # 4k
):
    c = pl.program_id(0)
    r = pl.program_id(1)
    w32 = _aes_pair_tile(
        start_ref, rk_ref, const_ref, meta_ref, c, r,
        lane_w=lane_w, stride=stride,
    )

    # ---- MAC: ONE MXU matmul for all four byte-in-word positions --------
    # The four per-g [128, W] x [W, 8k] contractions share the coefficient
    # matrix, so they stack into a single [512, W] x [W, 8k+1] matmul
    # (rows g*128 + wc, g-major).  The trailing ones column yields the
    # keystream-side recentring rowsum as a matmul output — no cross-lane
    # VPU reductions.  Everything else (rowsum combine, even/odd column
    # select, dead-lead drop, coefficient-side corrections) is column- or
    # chunk-local and runs ONCE in the XLA epilogue over the accumulator
    # (eval_mac_planes) instead of per tile: the kernel's only per-tile
    # work beyond the cipher is extract -> matmul -> accumulate.
    xs = jnp.concatenate(
        [
            (((w32 >> jnp.uint32(8 * g)) & jnp.uint32(255)).astype(jnp.int32)
             - 128).astype(jnp.int8)
            for g in range(4)
        ],
        axis=0,
    )  # [512, W] recentred bytes
    mm = jax.lax.dot_general(
        xs, cb_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [512, 8k + 1]

    @pl.when(r == 0)
    def _():
        out_ref[0] = mm

    @pl.when(r > 0)
    def _():
        out_ref[0] += mm


def eval_mac_planes(
    key,
    section_offset: int,
    coeffs: jnp.ndarray,
    n: int,
    ctr_ct: int,
    *,
    lane_w: int = 512,
    interpret: bool = False,
    vma=None,
) -> jnp.ndarray:
    """a-part MAC planes of k fused homomorphic evaluations.

    coeffs: uint32 [k, d].  Returns int32 [4, k, n, 88]: plane c holds
    sum_i byte_c(coeff_k[i]) * a_i[coord, digit], every entry
    <= d * 255^2 < 2^31 (d <= 32768).  The b-component MAC and the final
    carry fold stay in XLA (models/lwe.py) — this kernel only covers the
    keystream-dominated a-part.

    Constraints (callers fall back to the scan path otherwise):
    d % (2 * lane_w) == 0, n even, section_offset % 8 == 0 (half-block
    offsets — the CTR_BV phase — are handled via a dead lead prefix).
    """
    k, d = coeffs.shape
    assert n % 2 == 0 and ctr_ct == 92 * n
    assert d % (2 * lane_w) == 0, (d, lane_w)
    lead, start = _offset_lead_start(section_offset)
    stride = ctr_ct // 8  # blocks per ciphertext pair
    n_chunks_c = -(-(16 * stride + lead) // 512)
    n_chunks_r = (d // 2) // lane_w
    planes4k = 4 * k

    # coefficient bytes: [d, 4] LE -> even/odd pair rows side by side,
    # recentred to int8 for the MXU (corrections need the column sums).
    shifts = jnp.arange(4, dtype=jnp.uint32) * 8
    cbytes = ((coeffs[..., None] >> shifts) & 0xFF).astype(jnp.uint8)  # [k,d,4]
    cb_pairs = cbytes.transpose(1, 0, 2).reshape(d // 2, 2, planes4k)
    cb = jnp.concatenate([cb_pairs[:, 0], cb_pairs[:, 1]], axis=1)  # [d/2, 8k]
    cb_s = jax.lax.bitcast_convert_type(cb ^ jnp.uint8(0x80), jnp.int8)
    # trailing ones column: the kernel reads the keystream-side recentring
    # rowsum out of the same matmul (see _mac_kernel)
    cb_s = jnp.concatenate(
        [cb_s, jnp.ones((d // 2, 1), jnp.int8)], axis=1
    )  # [d/2, 8k + 1]
    # coefficient-side correction, summed over even+odd halves (see kernel
    # comment): 128 * sum_i (byte_c(coeff_k[i]) - 128) + 128^2 * d, per
    # (k, c) plane — column-independent, added after the halves merge.
    corr = 128 * jnp.sum(
        cbytes.astype(jnp.int32) - 128, axis=1
    ).reshape(planes4k) + 128 * 128 * d  # [4k], (k, byte) flat

    out = pl.pallas_call(
        functools.partial(
            _mac_kernel, lane_w=lane_w, stride=stride, planes4k=planes4k,
        ),
        grid=(n_chunks_c, n_chunks_r),  # rows minor: out block stays put
        out_shape=_out_struct(
            (n_chunks_c, 512, 2 * planes4k + 1), jnp.int32, vma
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((15, 8, 16, 1), lambda c, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 16, 1), lambda c, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 4, 16, 1), lambda c, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lane_w, 2 * planes4k + 1), lambda c, r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 512, 2 * planes4k + 1), lambda c, r: (c, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(start, key.pallas_key["rk_rm"], key.pallas_key["const_rm2"],
      jnp.asarray(_v2_meta_np()), cb_s)

    # Epilogue (once, off the accumulator — nothing of this is per-tile):
    # combine the ones-column rowsum, map rows r = g*128 + wc to byte cols
    # j = 512c + 4wc + g, window past the dead lead, and pick the even-
    # coefficient planes on the even-ct half / odd on the odd half.  The
    # lead prefix and tail padding drop with the slice; every column kept
    # its own accumulator slot, so stray columns can't contaminate
    # section bytes.  Bounds: |raw| <= (d/2)*2^14, final sums = exact
    # non-negative MACs <= d * 255^2 < 2^31.
    h2 = 2 * planes4k
    exact = out[..., :h2] + 128 * out[..., h2:]  # [C, 512, 8k]
    planes = exact.reshape(n_chunks_c, 4, 128, h2).transpose(3, 0, 2, 1)
    planes = planes.reshape(h2, n_chunks_c * 512)
    win = planes[:, lead : lead + 2 * ctr_ct].reshape(h2, 2, n, 92)[..., :88]
    acc = win[:planes4k, 0] + win[planes4k:, 1] + corr[:, None, None]
    # [4k, n, 88]; plane axis is (k, byte) flattened with byte minor; put
    # byte leading to match combine_shift_planes' [4, ...] convention
    return acc.reshape(k, 4, n, 88).transpose(1, 0, 2, 3)


# --------------------------------------------------------------------------
# Fused keystream -> encrypt kernel: the setup loop without HBM round-trips.
# --------------------------------------------------------------------------


def _enc_kernel(
    start_ref,      # SMEM uint32 [2]: aligned section base block (lo, hi)
    rk_ref,         # VMEM uint32 [15, 8, 16, 1]
    const_ref,      # VMEM uint32 [8, 16, 1]
    meta_ref,       # VMEM uint32 [8, 4, 16, 1]
    w_ref,          # VMEM int8 [1, 4, 128, 384]: sk nibble-band block (chunk c)
    out_ref,        # VMEM int32 [1, lane_w, 384]: per-row-chunk accumulator
    *,
    lane_w: int,
    stride: int,    # pair block stride = 2 * ctr_ct / 16
):
    r = pl.program_id(0)
    c = pl.program_id(1)
    w32 = _aes_pair_tile(
        start_ref, rk_ref, const_ref, meta_ref, c, r,
        lane_w=lane_w, stride=stride,
    )

    # <sk, a> digit contraction over this chunk's 512 byte columns: byte
    # col 512c + 4wc + g of pair row l, against the matching sk-band rows.
    # The four per-g [128, W] x [128, 384] contractions sum into one
    # [512, W] x [512, 384] matmul (rows g*128 + wc, matching the band
    # block's [g, wc] order).  The keystream side is recentred for the
    # MXU; the band side holds raw sk NIBBLES (0..15), so every
    # accumulated column stays within int32 across the whole sweep
    # (<= n*88*255*15 = 4.9e8) and the recentring correction is one
    # lane-independent column-sum term applied in the epilogue.  No
    # in-kernel carry folding needed.
    xs = jnp.concatenate(
        [
            (((w32 >> jnp.uint32(8 * g)) & jnp.uint32(255)).astype(jnp.int32)
             - 128).astype(jnp.int8)
            for g in range(4)
        ],
        axis=0,
    )  # [512, W]
    mm = jax.lax.dot_general(
        xs, w_ref[0].reshape(512, 384),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [W, 384]

    @pl.when(c == 0)
    def _():
        out_ref[0] = mm

    @pl.when(c > 0)
    def _():
        out_ref[0] += mm


def _sk_band_blocks(sk: jnp.ndarray, lead: int, ctr_ct: int):
    """sk as a banded byte-column -> digit-plane matrix, chunk-blocked.

    Row (lead + e*ctr_ct + j*92 + k) of the [n_chunks*512, 384] matrix
    holds sk[j, t-k] at columns t + 176*nib (+88 for the odd ciphertext
    e=1), split into low/high nibbles; dead bytes (k >= 88), the lead
    prefix, and the pad tail are zero rows.  Returns (blocks int8
    [chunks, 4, 128, 384], colsum_lo int32 [176], colsum_hi int32 [176]).
    """
    n = sk.shape[0]
    total = lead + 2 * ctr_ct
    chunks = -(-total // 512)

    # W3[j, k, t] = sk[j, t - k] (0 when t < k or k >= 88)
    sk_pad = jnp.pad(sk, ((0, 0), (92, 0)))  # [n, 180]
    idx = (
        np.arange(88)[None, :] - np.arange(92)[:, None] + 92
    )  # [92, 88] in [1, 179]
    w3 = sk_pad[:, jnp.asarray(idx)].reshape(n * 92, 88)  # uint8
    wl, wh = w3 & 15, w3 >> 4
    z = jnp.zeros_like(wl)
    zp = jnp.zeros((n * 92, 32), jnp.uint8)
    even = jnp.concatenate([wl, z, wh, z, zp], axis=1)  # [92n, 384]
    odd = jnp.concatenate([z, wl, z, wh, zp], axis=1)
    full = jnp.concatenate(
        [
            jnp.zeros((lead, 384), jnp.uint8),
            even,
            odd,
            jnp.zeros((chunks * 512 - total, 384), jnp.uint8),
        ],
        axis=0,
    )
    blocks = jax.lax.bitcast_convert_type(
        full.reshape(chunks, 128, 4, 384).transpose(0, 2, 1, 3), jnp.int8
    )
    cs = jnp.sum(wl.astype(jnp.int32), axis=0), jnp.sum(wh.astype(jnp.int32), axis=0)
    # both ciphertexts of a pair share the same band, so one 88-wide sum
    # serves even and odd halves
    return blocks, cs[0], cs[1]


def encrypt_b_fused(
    key,
    section_offset: int,
    sk: jnp.ndarray,
    count: int,
    n: int,
    ctr_ct: int,
    *,
    lane_w: int = 512,
    interpret: bool = False,
    vma=None,
) -> jnp.ndarray:
    """<sk, a_i> mod 2^704 for ``count`` sequential section ciphertexts.

    Single-kernel counterpart of expand_a + bigint_dot_acc for the setup
    loop (reference src/snark.c:75-110): the keystream never leaves VMEM.
    Returns int32 planes [count, 88] (non-negative, one partial fold from
    normalized digits); the caller adds p*e + m and carry-folds.

    Constraints: n even; section_offset % 16 in {0, 8} (every CTR_*
    section offset is a multiple of CTR_CT = 92n which is 8 mod 16 for
    the release n — src/snark.h:8-12).
    """
    assert n % 2 == 0 and ctr_ct == 92 * n and (2 * ctr_ct) % 16 == 0
    lead, start = _offset_lead_start(section_offset)
    pairs = -(-count // 2)
    n_chunks_r = -(-pairs // lane_w)
    pairs_pad = n_chunks_r * lane_w
    total = lead + 2 * ctr_ct  # per-pair column window (lead bytes dead)
    n_chunks_c = -(-total // 512)
    stride = 2 * ctr_ct // 16  # pair-to-pair block stride (lead-independent)
    wblocks, cs_lo, cs_hi = _sk_band_blocks(sk, lead, ctr_ct)

    out = pl.pallas_call(
        functools.partial(_enc_kernel, lane_w=lane_w, stride=stride),
        grid=(n_chunks_r, n_chunks_c),  # cols minor: out block stays put
        out_shape=_out_struct((n_chunks_r, lane_w, 384), jnp.int32, vma),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((15, 8, 16, 1), lambda r, c: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 16, 1), lambda r, c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 4, 16, 1), lambda r, c: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 128, 384), lambda r, c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, lane_w, 384), lambda r, c: (r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(start, key.pallas_key["rk_rm"], key.pallas_key["const_rm2"],
      jnp.asarray(_v2_meta_np()), wblocks)

    acc = out.reshape(pairs_pad, 384)[:pairs]
    # recentring correction: sum_c x*W = mm + 128 * colsum(W); W holds raw
    # nibbles so the corrected columns are exact NON-NEGATIVE partial sums
    # (<= n*88*255*15 = 4.9e8), which keeps everything in int32 (x64 is
    # disabled): fold the high-nibble planes before the x16 scale.
    corr_lo = 128 * jnp.concatenate([cs_lo, cs_lo])  # int32 [176]
    corr_hi = 128 * jnp.concatenate([cs_hi, cs_hi])
    v_lo = (acc[:, :176] + corr_lo).reshape(pairs, 2, 88)
    v_hi = (acc[:, 176:352] + corr_hi).reshape(pairs, 2, 88)
    # per-ciphertext folds: carries at digit 87 drop = mod-2^704 truncation
    hi_f = dg.partial_fold(v_hi)  # <= 255 + 2^21
    comb = v_lo + 16 * hi_f  # <= 4.9e8 + 2^25 < 2^31
    planes = dg.partial_fold(comb).reshape(2 * pairs, 88)[:count]
    return planes  # <= 255 + ~2^21, non-negative int32
