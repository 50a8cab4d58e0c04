"""Regev-LWE on TPU: batched digit-tensor ciphertext pipeline.

TPU-native re-design of the reference's per-integer GMP loop
(src/lwe.c): a ciphertext batch is one uint8 tensor ``[..., n+1, 88]``
(coordinate ``n`` is the b-component; 88 little-endian base-256 digits =
the effective mod-2^704 ring, SURVEY §2 quirk 1), and each primitive is
a fused MXU matmul + VPU carry fold from ops/digits.py:

* encrypt (src/lwe.c:78-97):  b = <sk, a> + p*e + m over a keystream-
  expanded a-slab — one [88,n]x[n,88] int8 matmul per ciphertext batch.
* decrypt (src/lwe.c:105-111): (b - <a, sk> mod 2^704) mod p.
* eval_poly (src/lwe.c:176-186): THE hot loop — sum_i coeff_i * ct_i with
  ct_i regenerated from the PRG.  Runs as a lax.scan over d-tiles: each
  step expands a keystream tile, then one [4k, T]x[T, (n+1)*88] int8
  matmul MACs k polynomials at once.  Evaluating k coefficient vectors
  per keystream pass is the fusion the reference misses (it regenerates
  the s- and as-section keystreams twice each, SURVEY §3.2).

Randomness (errors, smudging) is always *injected* as digit tensors so
the caller controls the entropy stream layout (models/snark.py replays
the reference's exact draw order; tests inject fixed vectors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import digits as dg
from ..ops import sampling
from ..utils.params import Params

DIGITS = dg.DIGITS


# --------------------------------------------------------------------------
# Scalar/byte plumbing.
# --------------------------------------------------------------------------


def u32_to_bytes(x: jnp.ndarray) -> jnp.ndarray:
    """uint32 [...] -> uint8 [..., 4] little-endian."""
    shifts = jnp.arange(4, dtype=jnp.uint32) * 8
    return ((x[..., None] >> shifts) & 0xFF).astype(jnp.uint8)


def u32_to_digits(x: jnp.ndarray, ndigits: int = DIGITS) -> jnp.ndarray:
    """uint32 [...] -> zero-extended digit rows [..., ndigits]."""
    b = u32_to_bytes(x)
    pad = [(0, 0)] * (b.ndim - 1) + [(0, ndigits - 4)]
    return jnp.pad(b, pad)


def pad_digits(rows: jnp.ndarray, ndigits: int = DIGITS) -> jnp.ndarray:
    """Zero-extend byte rows [..., k] to [..., ndigits]."""
    k = rows.shape[-1]
    if k == ndigits:
        return rows
    return jnp.pad(rows, [(0, 0)] * (rows.ndim - 1) + [(0, ndigits - k)])


# --------------------------------------------------------------------------
# Key generation / ciphertext accessors.
# --------------------------------------------------------------------------


def key_gen(key: sampling.PRGKey, byte_offset: int, params: Params) -> jnp.ndarray:
    """sk as uint8 [n, 88]: n sequential 92-byte draws (src/lwe.c:30-34).

    The reference samples full 736-bit keys; arithmetic only ever sees
    them mod 2^704, so the top 4 bytes are dropped at the source.
    """
    return sampling.sample_digit_rows(
        key, byte_offset, params.n, draw_bytes=params.logq_bytes
    )


def ct_a(ct: jnp.ndarray) -> jnp.ndarray:
    return ct[..., :-1, :]


def ct_b(ct: jnp.ndarray) -> jnp.ndarray:
    return ct[..., -1, :]


def ct_export(ct: jnp.ndarray, params: Params) -> jnp.ndarray:
    """Compressed form: b as 92 LE bytes, top 4 zero (src/lwe.c:115-119)."""
    return b_export(ct_b(ct), params)


def b_export(b: jnp.ndarray, params: Params) -> jnp.ndarray:
    """Pad b digit rows [..., 88] to the 92-byte stored format."""
    return pad_digits(b, params.ct_bytes)


def ct_import(
    key: sampling.PRGKey, byte_offset, b92: jnp.ndarray, params: Params
) -> jnp.ndarray:
    """Re-expand a from the stream, attach b (src/lwe.c:122-126).

    b92: uint8 [count, 92] (or [count, 88]).  Returns [count, n+1, 88].
    """
    count = b92.shape[0]
    a = sampling.expand_a(key, byte_offset, count, params.n)
    return jnp.concatenate([a, b92[:, None, :DIGITS]], axis=1)


# --------------------------------------------------------------------------
# Encrypt / decrypt.
# --------------------------------------------------------------------------


def encrypt_b(
    a: jnp.ndarray,
    sk: jnp.ndarray,
    msgs: jnp.ndarray,
    errs: jnp.ndarray,
    params: Params,
) -> jnp.ndarray:
    """b-components for a batch: <sk, a> + p*e + m mod 2^704.

    a: uint8 [B, n, 88]; sk: uint8 [n, 88]; msgs: uint32 [B];
    errs: uint8 [B, 88] (the 69-byte uniform error, zero-extended — the
    reference's sign flip is dead code, src/lwe.c:85-87).
    Returns uint8 [B, 88].
    """
    dot = dg.partial_fold(dg.bigint_dot_acc(a, sk))  # [B, 88] <= 255+2^23
    pe_planes = errs.astype(jnp.int32)[None] * jnp.asarray(
        [params.p & 0xFF, (params.p >> 8) & 0xFF, (params.p >> 16) & 0xFF, params.p >> 24],
        jnp.int32,
    ).reshape(4, 1, 1)
    pe = dg.combine_shift_planes(pe_planes)  # [B, 88] < 2^26
    m = u32_to_digits(msgs).astype(jnp.int32)  # [B, 88]
    return dg.carry_fold(dot + pe + m)


def encrypt(
    key: sampling.PRGKey,
    byte_offset,
    sk: jnp.ndarray,
    msgs: jnp.ndarray,
    errs: jnp.ndarray,
    params: Params,
) -> jnp.ndarray:
    """Full ciphertexts [B, n+1, 88] with a expanded from the CRS stream."""
    a = sampling.expand_a(key, byte_offset, msgs.shape[0], params.n)
    b = encrypt_b(a, sk, msgs, errs, params)
    return jnp.concatenate([a, b[:, None, :]], axis=1)


def _static_lead(section_offset):
    """Static lead bytes of an offset: int, or traced (lead, ctr) tuple
    with a static python-int lead (the sharded layers' form); None when
    the offset is fully traced (fused kernels need the lead at trace
    time — it shapes the grid)."""
    if isinstance(section_offset, int):
        return section_offset % 16
    if isinstance(section_offset, tuple) and isinstance(section_offset[0], int):
        return section_offset[0] % 16
    return None


def _fused_encrypt_ok(section_offset, count: int, params: Params) -> bool:
    """Static eligibility of the fused keystream->encrypt Pallas kernel."""
    lead = _static_lead(section_offset)
    return (
        lead is not None
        and lead % 8 == 0
        and params.n % 2 == 0
        and count >= 512  # below this the scan path amortizes better
        # int32 safety: the kernel's unfolded accumulator columns reach
        # n*88*255*15 (+ the 16*hi_f fold headroom, < 2^26); oversized n
        # must take the scan path, which folds per tile.
        and params.n * 88 * 255 * 15 + (1 << 26) < 2**31
    )


def encrypt_section_fused(
    key: sampling.PRGKey,
    section_offset: int,
    sk: jnp.ndarray,
    msgs: jnp.ndarray,
    errs: jnp.ndarray,
    params: Params,
    *,
    lane_w: int = 512,
    interpret: bool = False,
    vma=None,
) -> jnp.ndarray:
    """encrypt_section on the fused keystream->encrypt Pallas kernel.

    Bit-identical to the scan path (tests/test_eval_fused.py); the
    a-slab keystream never leaves VMEM (ops/eval_fused.py:_enc_kernel).
    ``vma``: mesh axes the output varies over when called under
    shard_map (parallel/mesh.py).
    """
    from ..ops import eval_fused

    dot = eval_fused.encrypt_b_fused(
        key, section_offset, sk, msgs.shape[0], params.n, params.ctr_ct,
        lane_w=lane_w, interpret=interpret, vma=vma,
    )  # int32 [B, 88] planes of <sk, a>
    pe_planes = errs.astype(jnp.int32)[None] * jnp.asarray(
        [params.p & 0xFF, (params.p >> 8) & 0xFF,
         (params.p >> 16) & 0xFF, params.p >> 24],
        jnp.int32,
    ).reshape(4, 1, 1)
    pe = dg.combine_shift_planes(pe_planes)  # [B, 88] < 2^26
    m = u32_to_digits(msgs).astype(jnp.int32)  # [B, 88]
    return dg.carry_fold(dot + pe + m)


def encrypt_section(
    key: sampling.PRGKey,
    section_offset: int,
    sk: jnp.ndarray,
    msgs: jnp.ndarray,
    errs: jnp.ndarray,
    params: Params,
    *,
    tile: int | None = None,
    impl: str = "auto",
    lane_w: int = 512,
    interpret: bool = False,
    vma=None,
) -> jnp.ndarray:
    """Compressed b-rows [B, 88] for B sequential encryptions.

    The a-slabs are regenerated per tile and never materialized in full —
    the setup loop (src/snark.c:75-110) without the reference's
    sequential mpz walk.  ``impl``: "fused" forces the single-kernel
    Pallas path (ops/eval_fused.py:_enc_kernel), "scan" the two-stage
    lax.scan path, "auto" picks fused on TPU whenever shape/offset allow.
    ``lane_w``/``interpret`` configure the fused kernel (interpret-mode
    CI coverage off-TPU uses a small lane_w).
    """
    total = msgs.shape[0]
    if impl == "fused":
        # Forcing the fused path must not bypass its safety bounds (the
        # auto path checks them via _fused_encrypt_ok; count>=512 there
        # is a perf heuristic, not safety): fail loudly at trace time
        # instead of producing silently wrong ciphertexts.
        lead = _static_lead(section_offset)
        assert lead is not None and lead % 8 == 0, section_offset
        assert params.n % 2 == 0, params.n
        assert params.n * 88 * 255 * 15 + (1 << 26) < 2**31, (
            "n too large for the fused kernel's int32 accumulator; "
            "use impl='scan'"
        )
    if impl == "fused" or (
        impl == "auto"
        and sampling._default_backend() == "pallas"
        and _fused_encrypt_ok(section_offset, total, params)
    ):
        return encrypt_section_fused(
            key, section_offset, sk, msgs, errs, params,
            lane_w=lane_w, interpret=interpret, vma=vma,
        )
    if tile is None:
        tile = min(total, 256)
    if total <= 2 or tile % 2:
        return encrypt_b(
            sampling.expand_a(key, section_offset, total, params.n),
            sk, msgs, errs, params,
        )
    if total % tile:
        # Pad with dummy encryptions to a whole number of tiles (their
        # keystream lies past the section, which no real term reads) and
        # drop them — never expand an unaligned section in one slab.
        extra = -total % tile
        pad = [(0, extra)] + [(0, 0)] * (errs.ndim - 1)
        out = encrypt_section(
            key, section_offset, sk,
            jnp.pad(msgs, (0, extra)), jnp.pad(errs, pad), params,
            tile=tile, impl="scan",
        )
        return out[:total]
    ntiles = total // tile
    skip, ctr0 = _offset_skip_ctr(section_offset)
    blocks_per_tile = tile * params.ctr_ct // 16

    def step(ctr, xs):
        m_t, e_t = xs
        a = sampling.expand_a(key, (skip, ctr), tile, params.n)
        b = encrypt_b(a, sk, m_t, e_t, params)
        return sampling.advance_ctr(*ctr, blocks_per_tile), b

    _, b_rows = jax.lax.scan(
        step, ctr0, (msgs.reshape(ntiles, tile), errs.reshape(ntiles, tile, -1))
    )
    return b_rows.reshape(total, DIGITS)


def decrypt(ct: jnp.ndarray, sk: jnp.ndarray, params: Params) -> jnp.ndarray:
    """(b - <a, sk>) mod p (src/lwe.c:105-111).  -> uint32 [...].

    The difference is taken mod p directly — NOT reduced mod 2^704 first.
    The reference subtracts mpz values and its modq passes negative
    results through untruncated (SURVEY §2 quirk 1), so the semantics are
    plain-integer difference mod p; wrapping mod 2^704 first would add a
    spurious 2^704 mod p when b < <a,sk> (e.g. after negative smudging).
    """
    dot = dg.bigint_dot(ct_a(ct), sk)
    return dg.sub_mod_p(dg.mod_p(ct_b(ct)), dg.mod_p(dot))


# --------------------------------------------------------------------------
# Ciphertext algebra (coordinate-wise mod 2^704, src/lwe.c:131-165).
# --------------------------------------------------------------------------


def ct_add(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return dg.add_digits(x, y)


def ct_mul_ui(ct: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """ct * c for uint32 scalar c (traced ok)."""
    return dg.scalar_mul_digits(ct, u32_to_bytes(c))


def ct_select_add(pred: jnp.ndarray, acc: jnp.ndarray, ct: jnp.ndarray) -> jnp.ndarray:
    """acc + ct where pred else acc (witness-bit accumulation)."""
    return dg.select_digits(
        jnp.broadcast_to(pred, acc.shape[:-1]), dg.add_digits(acc, ct), acc
    )


def smudge(
    ct: jnp.ndarray, s_digits: jnp.ndarray, sign_positive: jnp.ndarray, params: Params
) -> jnp.ndarray:
    """b += ±(uniform log_smudging bits) * p (src/lwe.c:65-76).

    s_digits: uint8 [88] (80 live digits); sign_positive: bool scalar.
    Only the b coordinate changes.
    """
    sp = dg.scalar_mul_digits(s_digits, u32_to_bytes(jnp.uint32(params.p)))
    b = ct_b(ct)
    b_new = jnp.where(sign_positive, dg.add_digits(b, sp), dg.sub_digits(b, sp))
    return jnp.concatenate([ct_a(ct), b_new[..., None, :]], axis=-2)


# --------------------------------------------------------------------------
# eval_poly: the prover's hot loop.
# --------------------------------------------------------------------------


def _offset_skip_ctr(section_offset):
    """Static int offset or traced (skip, (lo, hi)) -> (skip, ctr) pair."""
    if isinstance(section_offset, tuple):
        return section_offset
    return sampling.split_offset(section_offset)


def eval_poly_multi_acc(
    key: sampling.PRGKey,
    section_offset,
    b_rows: jnp.ndarray,
    coeffs: jnp.ndarray,
    params: Params,
    *,
    tile: int | None = None,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Partial accumulator of k homomorphic evaluations: int32 [k, n+1, 88].

    Positions are bounded by 255 + 2^23 (one partial_fold short of
    normalized digits), so partial accumulators from up to ~2^7 shards can
    be psum-reduced in int32 before one final carry_fold — the sharded
    eval_poly (parallel/mesh.py) rides this.  ``section_offset`` may be a
    traced (skip, (ctr_lo, ctr_hi)) stream position.  Inside shard_map,
    pass ``axis_name`` so the scan carry is marked mesh-varying.
    """
    k, d = coeffs.shape
    n = params.n
    if tile is None:
        tile = min(d, 256)
    assert d % tile == 0 and (tile * params.ctr_ct) % 16 == 0, (d, tile)
    ntiles = d // tile
    x_cols = (n + 1) * DIGITS

    cb = u32_to_bytes(coeffs)  # [k, d, 4]
    cb = cb.transpose(1, 0, 2).reshape(ntiles, tile, k * 4)
    b_tiles = b_rows[:, :DIGITS].reshape(ntiles, tile, DIGITS)

    skip, ctr0 = _offset_skip_ctr(section_offset)
    blocks_per_tile = tile * params.ctr_ct // 16

    def step(carry, xs):
        ctr, acc = carry
        cb_t, b_t = xs
        a = sampling.expand_a(key, (skip, ctr), tile, n)  # [T, n, 88]
        x = jnp.concatenate([a, b_t[:, None, :]], axis=1).reshape(tile, x_cols)
        planes = dg.u8_matmul(cb_t.T, x)  # [k*4, X]
        comb = dg.combine_shift_planes(
            planes.reshape(k, 4, n + 1, DIGITS).transpose(1, 0, 2, 3)
        )  # [k, n+1, 88] < 2^26
        acc = dg.partial_fold(acc + comb)
        return (sampling.advance_ctr(*ctr, blocks_per_tile), acc), None

    acc0 = jnp.zeros((k, n + 1, DIGITS), jnp.int32)
    if axis_name is not None:
        # ctr0 derives from the (sharded) stream position and is already
        # mesh-varying; the zero accumulator must be marked to match.
        acc0 = jax.lax.pcast(acc0, axis_name, to="varying")
    (_, acc), _ = jax.lax.scan(step, (ctr0, acc0), (cb, b_tiles))
    return acc


def _fused_eval_ok(section_offset, d: int, params: Params, lane_w: int) -> bool:
    """Static eligibility of the fused Pallas MAC kernel (ops/eval_fused)."""
    lead = _static_lead(section_offset)
    return (
        lead is not None and lead % 8 == 0
        and params.n % 2 == 0
        and d % (2 * lane_w) == 0
        and d > 0
        # int32 safety: MAC plane entries reach d * 255^2 (eval_fused);
        # larger degrees take the scan path, which folds per tile.
        and d * 255 * 255 < 2**31
    )


def eval_poly_multi_fused(
    key: sampling.PRGKey,
    section_offset: int,
    b_rows: jnp.ndarray,
    coeffs: jnp.ndarray,
    params: Params,
    *,
    lane_w: int = 512,
    interpret: bool = False,
    vma=None,
) -> jnp.ndarray:
    """eval_poly_multi on the fused keystream->MAC Pallas kernel.

    Bit-identical to the scan path (tests/test_eval_fused.py); the
    keystream never leaves VMEM, so throughput tracks the AES kernel's
    instead of losing ~45% to HBM round-trips (ops/eval_fused.py).
    ``vma``: mesh axes the output varies over under shard_map.
    """
    from ..ops import eval_fused

    k, d = coeffs.shape
    n = params.n
    acc_a = eval_fused.eval_mac_planes(
        key, section_offset, coeffs, n, params.ctr_ct,
        lane_w=lane_w, interpret=interpret, vma=vma,
    )  # [4, k, n, 88]
    cb = u32_to_bytes(coeffs)  # [k, d, 4]
    acc_b = dg.u8_matmul(
        cb.transpose(1, 0, 2).reshape(d, 4 * k).T, b_rows[:, :DIGITS]
    ).reshape(k, 4, DIGITS).transpose(1, 0, 2)  # [4, k, 88]
    planes = jnp.concatenate([acc_a, acc_b[:, :, None, :]], axis=2)
    return dg.carry_fold(dg.combine_shift_planes(planes))


def eval_poly_multi(
    key: sampling.PRGKey,
    section_offset,
    b_rows: jnp.ndarray,
    coeffs: jnp.ndarray,
    params: Params,
    *,
    tile: int | None = None,
    impl: str = "auto",
    lane_w: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """k homomorphic polynomial evaluations sharing one keystream pass.

    b_rows: uint8 [d, 88 or 92] — compressed b-components of the section's
    ciphertexts.  coeffs: uint32 [k, d] — k coefficient vectors (deg < d).
    Returns uint8 [k, n+1, 88]: result ciphertexts.

    Reference semantics per vector == eval_poly (src/lwe.c:176-186); the
    k-way batching + tile-wise keystream regeneration (never holding the
    expanded [d, n, 88] slab) is the TPU redesign.  ``impl``: "fused"
    forces the single-kernel Pallas path, "scan" the two-stage path,
    "auto" picks fused on TPU whenever the shape/offset allow it;
    ``lane_w``/``interpret`` configure the fused kernel.
    """
    if impl == "fused":
        # Forced fused path: assert the int32 MAC-plane bound and lead
        # alignment the auto path checks via _fused_eval_ok (degree
        # divisibility and lead%8 are asserted inside eval_mac_planes).
        assert coeffs.shape[1] * 255 * 255 < 2**31, (
            "degree too large for the fused kernel's int32 MAC planes; "
            "use impl='scan'"
        )
        assert params.n % 2 == 0, params.n
    if impl == "fused" or (
        impl == "auto"
        and sampling._default_backend() == "pallas"
        and _fused_eval_ok(section_offset, coeffs.shape[1], params, lane_w)
    ):
        return eval_poly_multi_fused(
            key, section_offset, b_rows, coeffs, params,
            lane_w=lane_w, interpret=interpret,
        )
    # Arbitrary degree counts (FLINT takes any d): zero-pad to the tile
    # grid.  Padded terms multiply their (past-section) keystream rows by
    # zero coefficients — exact zeros in the MAC, bit-identical result.
    d = coeffs.shape[1]
    tile_eff = tile if tile is not None else min(d + (d & 1), 256)
    while (tile_eff * params.ctr_ct) % 16:
        tile_eff *= 2  # even tiles align for even n; x4 covers odd n
    extra = -d % tile_eff
    if extra:
        coeffs = jnp.pad(coeffs, ((0, 0), (0, extra)))
        b_rows = jnp.pad(b_rows[:, :DIGITS], ((0, extra), (0, 0)))
    return dg.carry_fold(
        eval_poly_multi_acc(
            key, section_offset, b_rows, coeffs, params, tile=tile_eff
        )
    )


def eval_poly(
    key: sampling.PRGKey,
    section_offset: int,
    b_rows: jnp.ndarray,
    coeffs: jnp.ndarray,
    params: Params,
    *,
    tile: int | None = None,
) -> jnp.ndarray:
    """Single-polynomial wrapper: returns uint8 [n+1, 88]."""
    return eval_poly_multi(
        key, section_offset, b_rows, coeffs[None], params, tile=tile
    )[0]
