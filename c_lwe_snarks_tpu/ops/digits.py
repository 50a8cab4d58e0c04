"""Base-256 digit-plane arithmetic mod 2^704 — the MXU-native bignum layer.

The reference does all mod-q arithmetic on GMP limbs one integer at a time
(src/lwe.h:107-118, src/lwe.c:20-28).  Here a mod-2^704 integer is a row of
88 little-endian uint8 digits, a batch of them a 2D tensor, and every hot
operation becomes an int8 matmul on the MXU with int32 accumulation plus a
vectorized carry fold on the VPU:

* ``<sk, a> mod 2^704`` (encrypt/decrypt, src/lwe.c:20-28) — the digit-
  product matrix ``P[k,l] = sum_i a_i[k] * sk_i[l]`` is one [88,n]x[n,88]
  matmul; the result is the anti-diagonal sums of P (k+l = t, t < 88).
* ``rop += coeff_i * ct_i`` over i (eval_poly, src/lwe.c:176-186) — with
  coefficients split into 4 bytes, one [4,D]x[D,X] matmul per digit shift.

Why 88 digits and not 92: the reference's ``modq`` truncates to 2^704
(SURVEY §2 quirk 1), and mod 2^704 is a ring hom, so sampled 92-byte
values can be pre-truncated to 88 digits without changing any reduced
result.  The PRG still consumes 92 bytes per draw (src/snark.h:8).

int8 on the MXU is signed; unsigned digits go through the +/-128 recentre:
``u*v = (u-128)(v-128) + 128(u-128) + 128(v-128) + 16384`` summed over the
contraction — the correction terms are a ones-row/ones-column matmul away.
Accumulator bounds are chosen so nothing overflows int32: the worst case
255*255*D at D=2^15 is 2,130,739,200 < 2^31-1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

DIGITS = 88  # mod-2^704 width in base-256 digits
FULL_DIGITS = 92  # PRG bytes per sampled value (LOGQ_BYTES, src/lwe.h:29)


# --------------------------------------------------------------------------
# Host conversions (tests / oracle interop only).
# --------------------------------------------------------------------------


def int_to_digits(x: int, ndigits: int = DIGITS) -> np.ndarray:
    assert 0 <= x < 1 << (8 * ndigits)
    return np.frombuffer(x.to_bytes(ndigits, "little"), dtype=np.uint8).copy()


def digits_to_int(d) -> int:
    return int.from_bytes(bytes(np.asarray(d, dtype=np.uint8).tolist()), "little")


def ints_to_digit_matrix(xs, ndigits: int = DIGITS) -> np.ndarray:
    return np.stack([int_to_digits(x, ndigits) for x in xs])


# --------------------------------------------------------------------------
# Carry folding: int32 accumulator planes -> normalized uint8 digits.
# --------------------------------------------------------------------------


def partial_fold(v: jnp.ndarray) -> jnp.ndarray:
    """One shift-add carry pass: int32 planes -> int32 planes.

    Brings position values from < 2^31 down to <= 255 + 2^23; used to keep
    a running int32 accumulator bounded across scan steps (each step adds
    < 2^26 on top — see combine_shift_planes — so the sum stays < 2^27).
    Weight semantics (sum of pos * 256^pos mod 2^(8K)) are preserved.
    """
    lo = v & 255
    hi = v >> 8
    return lo + jnp.pad(hi[..., :-1], [(0, 0)] * (hi.ndim - 1) + [(1, 0)])


def carry_fold(acc: jnp.ndarray, ndigits: int = DIGITS) -> jnp.ndarray:
    """Normalize non-negative int32 accumulator planes to uint8 digits.

    acc: int32 [..., K] with 0 <= acc[k] < 2^31; position k has weight
    256^k.  Returns uint8 [..., ndigits] — the value mod 256^ndigits
    (mod 2^704 truncation for ndigits=88, matching src/lwe.h:107-118).

    Four shift-add passes bring every position to <= 256; the remaining
    one-bit ripple is resolved in O(log K) by a Kogge-Stone carry-
    lookahead (generate = digit 256, propagate = digit 255) instead of a
    sequential sweep.
    """
    x = acc.astype(jnp.int32)

    # bounds: 2^31 -> 255+2^23 -> 255+2^15 -> 255+2^7 -> <= 256
    for _ in range(4):
        x = partial_fold(x)

    # Carry-lookahead without a scan network: position t receives a carry
    # iff the nearest position below it that is not a propagator (255) is
    # a generator (256).  Track "latest generator index" vs "latest
    # blocker index" with two cummax ops.
    k = x.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    g_idx = jax.lax.cummax(jnp.where(x == 256, iota, -1), axis=x.ndim - 1)
    b_idx = jax.lax.cummax(jnp.where(x <= 254, iota, -1), axis=x.ndim - 1)
    carry_out = g_idx > b_idx  # carry out of prefix [0..t]
    carry_in = jnp.pad(
        carry_out[..., :-1], [(0, 0)] * (x.ndim - 1) + [(1, 0)]
    )
    out = (x + carry_in.astype(jnp.int32)) & 255
    return out[..., :ndigits].astype(jnp.uint8)


# --------------------------------------------------------------------------
# Recentred int8 matmul: exact uint8 x uint8 -> int32 contraction.
# --------------------------------------------------------------------------


def _recentre(u: jnp.ndarray) -> jnp.ndarray:
    """uint8 digits -> int8 (value - 128), bit-identical two's complement."""
    return (u ^ 0x80).astype(jnp.int8)


def u8_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact unsigned matmul a @ b for uint8 operands via the MXU.

    a: uint8 [..., M, K]; b: uint8 [K, N].  Returns int32 [..., M, N].
    Contraction K must satisfy K * 255 * 255 < 2^31 (K <= 32768).
    """
    asz = _recentre(a)
    bsz = _recentre(b)
    mm = jax.lax.dot_general(
        asz, bsz, (((asz.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    arow = jnp.sum(asz.astype(jnp.int32), axis=-1, keepdims=True)  # [..., M, 1]
    bcol = jnp.sum(bsz.astype(jnp.int32), axis=0)  # [N]
    k = a.shape[-1]
    return mm + 128 * arow + 128 * bcol + 128 * 128 * k


# --------------------------------------------------------------------------
# Big-int dot product: <a, b> mod 2^704 over a contraction axis.
# --------------------------------------------------------------------------


def bigint_dot_acc(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Accumulator planes of sum_i a_i * b_i, truncated to digits < DIGITS.

    a: uint8 [..., n, DIGITS]; b: uint8 [n, DIGITS].  Returns int32
    [..., DIGITS] planes (weight 256^t) with every plane < 2^30; feed to
    ``carry_fold`` (possibly after further accumulation) for the digits.

    This is the TPU form of mpz_add_dotp (src/lwe.c:20-28): the digit-
    product matrix P = a^T b is one MXU matmul, and only anti-diagonals
    t = k+l < DIGITS survive the mod-2^704 truncation.  P entries are
    <= n*255^2 (9.6e7 at n=1470); anti-diagonal sums of 88 of those would
    overflow int32, so P is split into (low byte, high part) planes whose
    anti-diagonal sums are bounded by 88*255 and 88*2^23.
    """
    n, k = b.shape
    assert a.shape[-2:] == (n, k) and k == DIGITS
    # P[..., k, l] = sum_i a[..., i, k] * b[i, l]
    p = u8_matmul(jnp.swapaxes(a, -1, -2), b)  # int32 [..., K, K]
    # split so 88-term anti-diagonal sums stay < 2^31: low byte keeps
    # weight 256^(k+l), the high part moves to the next anti-diagonal
    p_lo = p & 255
    p_hi = p >> 8
    pad = [(0, 0)] * (p.ndim - 1)
    p_comb = p_lo + jnp.pad(p_hi[..., : k - 1], pad + [(1, 0)])
    return antidiag_sums(p_comb)[..., :k]


def antidiag_sums(p: jnp.ndarray) -> jnp.ndarray:
    """out[..., t] = sum_k p[..., k, t-k] without gathers.

    Skew-reshape: zero-pad rows to width 2K, flatten, re-view the first
    K*(2K-1) elements as [K, 2K-1] — row k lands shifted right by k (the
    wrapped-in tail elements are the zero padding) — then column-sum.
    """
    *batch, kk, w = p.shape
    assert w == kk
    padded = jnp.pad(p, [(0, 0)] * len(batch) + [(0, 0), (0, kk)])
    flat = padded.reshape(*batch, kk * 2 * kk)
    skew = flat[..., : kk * (2 * kk - 1)].reshape(*batch, kk, 2 * kk - 1)
    return jnp.sum(skew, axis=-2)


def bigint_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """<a, b> mod 2^704 as uint8 digits [..., DIGITS]."""
    return carry_fold(bigint_dot_acc(a, b))


# --------------------------------------------------------------------------
# Coefficient MAC: sum_i coeff_i * x_i with 32-bit coefficients.
# --------------------------------------------------------------------------


def coeff_mac_acc(coeff_bytes: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Accumulator planes of sum_i coeff_i * x_i (the eval_poly MAC).

    coeff_bytes: uint8 [d, 4] — little-endian bytes of 32-bit scalars.
    x: uint8 [d, X] — digit rows (X = flattened coords * DIGITS).
    Returns int32 [4, X]: plane c holds sum_i coeff[i,c] * x[i, :], to be
    combined at byte shift c by ``combine_shift_planes``.

    One [4, d] x [d, X] int8 matmul (src/lwe.c:176-186's entire inner
    loop); d <= 32768 keeps every plane < 2^31.
    """
    d, four = coeff_bytes.shape
    assert four == 4 and x.shape[0] == d
    return u8_matmul(coeff_bytes.T, x)


def combine_shift_planes(planes: jnp.ndarray) -> jnp.ndarray:
    """Combine byte-shift planes: out[.., t] = sum_c planes[c][.., t-c].

    planes: int32 [4, ..., K] (each < 2^31).  Returns int32 [..., K] with
    entries < 2^26, ready for carry_fold.  Values shifted past position
    K-1 are dropped (mod-2^704 truncation when K = DIGITS).
    """
    lo = planes & 255
    hi = planes >> 8

    def shift(v, s):
        if s == 0:
            return v
        pad = [(0, 0)] * (v.ndim - 1) + [(s, 0)]
        return jnp.pad(v[..., : v.shape[-1] - s], pad)

    out = jnp.zeros(planes.shape[1:], jnp.int32)
    for c in range(planes.shape[0]):
        out = out + shift(lo[c], c) + shift(hi[c], c + 1)
    return out


# --------------------------------------------------------------------------
# Elementwise digit ops.
# --------------------------------------------------------------------------


def add_digits(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod 2^704 digitwise (ct_add, src/lwe.c:151-157)."""
    return carry_fold(a.astype(jnp.int32) + b.astype(jnp.int32))


def sub_digits(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod 2^704 via the base-256 complement: a + (255-b) + 1.

    Exact because (2^704 - b) mod 2^704 has digits (255 - b_k) plus one at
    position 0, and carry_fold reduces the sum mod 2^704.
    """
    acc = a.astype(jnp.int32) + (255 - b.astype(jnp.int32))
    one = jnp.zeros(acc.shape, jnp.int32).at[..., 0].set(1)
    return carry_fold(acc + one)


def select_digits(pred: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Elementwise where over digit rows; pred broadcast over the digit axis."""
    return jnp.where(pred[..., None], x, y)


def digits_ge(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a >= b as unsigned big-ints over LE digit rows (broadcasting).

    The sign of a - b is the sign of the most-significant differing
    digit; resolved with one cummax over the digit axis (no gathers).
    """
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    k = d.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
    # latest index where a's digit exceeds b's vs. where b's exceeds a's
    gt_idx = jnp.max(jnp.where(d > 0, iota, -1), axis=-1)
    lt_idx = jnp.max(jnp.where(d < 0, iota, -1), axis=-1)
    return gt_idx >= lt_idx  # equal (both -1) counts as >=


def scalar_mul_digits(a: jnp.ndarray, c_bytes: jnp.ndarray) -> jnp.ndarray:
    """(a * c) mod 2^704 for a 32-bit scalar c (ct_mul_ui, src/lwe.c:131).

    a: uint8 [..., DIGITS]; c_bytes: uint8 [4].  Products per shift plane
    are <= 255*255 so the combined planes stay far below int32 limits.
    """
    planes = a.astype(jnp.int32)[None] * c_bytes.astype(jnp.int32).reshape(
        (4,) + (1,) * a.ndim
    )
    return carry_fold(combine_shift_planes(planes))


# --------------------------------------------------------------------------
# mod-p fold: digits -> uint32 residue mod p = 2^32 - 5 (decrypt tail).
# --------------------------------------------------------------------------

_P = (1 << 32) - 5


def _pow256_mod_p(k: int) -> np.ndarray:
    w = np.empty(k, dtype=np.uint32)
    v = 1
    for i in range(k):
        w[i] = v
        v = (v * 256) % _P
    return w


def mod_p(digits: jnp.ndarray) -> jnp.ndarray:
    """Value of uint8 digit rows mod p, as uint32 [...].

    sum_k d_k * (256^k mod p): split the weights into 16-bit halves so
    both partial sums fit int32 (88 * 255 * 65535 = 1.47e9), then fold
    2^32 = 5 (mod p) in uint32 arithmetic.
    """
    k = digits.shape[-1]
    w = _pow256_mod_p(k)
    w_lo = jnp.asarray(w & 0xFFFF, jnp.int32)
    w_hi = jnp.asarray(w >> 16, jnp.int32)
    d = digits.astype(jnp.int32)
    s_lo = jnp.sum(d * w_lo, axis=-1).astype(jnp.uint32)  # < 2^31
    s_hi = jnp.sum(d * w_hi, axis=-1).astype(jnp.uint32)  # < 2^31
    # value = s_lo + 2^16 * s_hi; reduce with 2^32 == 5 (mod p)
    h_hi = s_hi >> 16  # < 2^15
    h_lo = s_hi & 0xFFFF
    # 2^16*s_hi = h_hi*2^32 + h_lo*2^16 == 5*h_hi + h_lo*2^16 (mod p);
    # both terms are < p individually (h_lo*2^16 <= 2^32-2^16 < p), but
    # their plain sum can wrap uint32, so combine with _addmod_p.
    t = _addmod_p(h_lo << 16, jnp.uint32(5) * h_hi)
    return _addmod_p(_mod_p_u32(s_lo), t)


def _mod_p_u32(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= jnp.uint32(_P), x - jnp.uint32(_P), x)


def _addmod_p(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p for a, b < p, in wraparound uint32 arithmetic."""
    s = a + b
    wrapped = s < a
    s = jnp.where(wrapped, s + jnp.uint32(5), s)  # +2^32 == +5 (mod p)
    return _mod_p_u32(s)


def sub_mod_p(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p for a, b < p."""
    return _addmod_p(a, jnp.where(b > jnp.uint32(0), jnp.uint32(_P) - b, b))
