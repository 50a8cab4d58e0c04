"""Fused AES-keystream -> MAC Pallas kernel: eval_poly without HBM round-trips.

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

from .aes_pallas import _ROW_OF_BYTE, _mix_columns_rm, _shift_rows_rm, _v2_meta_np
from .sbox_opt import sbox_bits_opt as _sbox_bits
from .bitslice import transpose32

_FULL32 = np.uint32(0xFFFFFFFF)


def _mac_kernel(
    start_ref,      # SMEM uint32 [2]: section base block counter (lo, hi)
    rk_ref,         # VMEM uint32 [15, 8, 16, 1]
    const_ref,      # VMEM uint32 [8, 16, 1]
    meta_ref,       # VMEM uint32 [8, 4, 16, 1]
    cb_ref,         # VMEM int8  [lane_w, 8k]: recentred coeff bytes (row chunk)
    out_ref,        # VMEM int32 [1, 4, 128, 4k]: per-col-chunk accumulator
    *,
    lane_w: int,
    stride: int,    # pair block stride = 2 * ctr_ct / 16
    planes4k: int,  # 4k
):
    c = pl.program_id(0)
    r = pl.program_id(1)

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
    # the MAC contracts over lanes, so word-cols-major is the right shape)
    words = []
    for g in range(4):
        rows = []
        for jj in range(4):
            q = _ROW_OF_BYTE[4 * g + jj]
            rows.extend(planes[k][q][None, :] for k in range(8))
        p32 = jnp.concatenate(rows, axis=0)  # [32, W]
        words.append(transpose32(p32))  # [32(b), W]
    w32 = jnp.stack(words, axis=1).reshape(128, lane_w)  # row = 4b+g

    # ---- MAC: per byte-in-word position g', one MXU matmul --------------
    # Column select: byte col of word-col wc at position g' is
    # 512*c + 4*wc + g'; it belongs to the even ct iff < ctr_ct = 8*stride.
    # The coefficient-side recentring corrections (128 * colsum(cb-128)
    # + 128^2 * W per row chunk) are column-independent once the even and
    # odd halves are added, so they move to the XLA epilogue; only the
    # keystream-side rowsum correction needs the in-kernel bytes.
    wc_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    half = planes4k
    for g in range(4):
        x = ((w32 >> jnp.uint32(8 * g)) & jnp.uint32(255)).astype(jnp.int32)
        xs = (x - 128).astype(jnp.int8)  # recentred bytes, in [-128, 127]
        mm = jax.lax.dot_general(
            xs, cb_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [128, 8k]
        rowsum = jnp.sum(xs.astype(jnp.int32), axis=1, keepdims=True)  # [128,1]
        exact = mm + 128 * rowsum
        even = 512 * c + 4 * wc_iota + g < 8 * stride  # [128, 1]
        val = jnp.where(even, exact[:, :half], exact[:, half:])  # [128, 4k]

        @pl.when(r == 0)
        def _():
            out_ref[0, g] = val

        @pl.when(r > 0)
        def _():
            out_ref[0, g] += val


def eval_mac_planes(
    key,
    section_offset: int,
    coeffs: jnp.ndarray,
    n: int,
    ctr_ct: int,
    *,
    lane_w: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """a-part MAC planes of k fused homomorphic evaluations.

    coeffs: uint32 [k, d].  Returns int32 [4, k, n, 88]: plane c holds
    sum_i byte_c(coeff_k[i]) * a_i[coord, digit], every entry
    <= d * 255^2 < 2^31 (d <= 32768).  The b-component MAC and the final
    carry fold stay in XLA (models/lwe.py) — this kernel only covers the
    keystream-dominated a-part.

    Constraints (callers fall back to the scan path otherwise):
    d % (2 * lane_w) == 0, n even, section_offset % 16 == 0.
    """
    k, d = coeffs.shape
    assert n % 2 == 0 and ctr_ct == 92 * n
    assert d % (2 * lane_w) == 0, (d, lane_w)
    assert section_offset % 16 == 0, section_offset
    stride = ctr_ct // 8  # blocks per ciphertext pair
    n_chunks_c = -(-stride // 32)
    n_chunks_r = (d // 2) // lane_w
    planes4k = 4 * k

    base = section_offset // 16
    start = jnp.asarray([base & 0xFFFFFFFF, base >> 32], jnp.uint32)

    # coefficient bytes: [d, 4] LE -> even/odd pair rows side by side,
    # recentred to int8 for the MXU (corrections need the column sums).
    shifts = jnp.arange(4, dtype=jnp.uint32) * 8
    cbytes = ((coeffs[..., None] >> shifts) & 0xFF).astype(jnp.uint8)  # [k,d,4]
    cb_pairs = cbytes.transpose(1, 0, 2).reshape(d // 2, 2, planes4k)
    cb = jnp.concatenate([cb_pairs[:, 0], cb_pairs[:, 1]], axis=1)  # [d/2, 8k]
    cb_s = jax.lax.bitcast_convert_type(cb ^ jnp.uint8(0x80), jnp.int8)
    # coefficient-side correction, summed over even+odd halves (see kernel
    # comment): 128 * sum_i (byte_c(coeff_k[i]) - 128) + 128^2 * d, per
    # (k, c) plane — column-independent, added after the halves merge.
    corr = 128 * jnp.sum(
        cbytes.astype(jnp.int32) - 128, axis=1
    ).reshape(planes4k) + 128 * 128 * d  # [4k], (k, byte) flat

    out = pl.pallas_call(
        functools.partial(
            _mac_kernel, lane_w=lane_w, stride=stride, planes4k=planes4k
        ),
        grid=(n_chunks_c, n_chunks_r),  # rows minor: out block stays put
        out_shape=jax.ShapeDtypeStruct(
            (n_chunks_c, 4, 128, planes4k), jnp.int32
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((15, 8, 16, 1), lambda c, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 16, 1), lambda c, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 4, 16, 1), lambda c, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lane_w, 2 * planes4k), lambda c, r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, 128, planes4k), lambda c, r: (c, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(start, key.pallas_key["rk_rm"], key.pallas_key["const_rm2"],
      jnp.asarray(_v2_meta_np()), cb_s)

    # [C, 4(g'), 128(wc), 4k] -> byte cols j = 512c + 4wc + g'
    acc = out.transpose(3, 0, 2, 1).reshape(planes4k, n_chunks_c * 512)
    acc = acc[:, : 2 * ctr_ct].reshape(planes4k, 2, n, 92)[..., :88]
    # even-ct + odd-ct halves: both carry their own coefficients already
    acc = acc[:, 0] + acc[:, 1] + corr[:, None, None]
    # [4k, n, 88] <= d * 255^2 < 2^31
    # plane axis is (k, byte) flattened with byte minor; put byte leading
    # to match combine_shift_planes' [4, ...] convention
    return acc.reshape(k, 4, n, 88).transpose(1, 0, 2, 3)
