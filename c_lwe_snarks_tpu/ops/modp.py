"""uint32 modular arithmetic on the VPU: mod p = 2^32 - 5 and helpers.

The reference does all Z_p work through FLINT's nmod layer (64-bit
machine words, src/ssp.c / src/snark.c); TPUs have no 64-bit multiply, so
every product here is built from 16-bit halves in uint32 lanes:
``mul32`` returns the exact (hi, lo) double word, and the mod-p fold uses
2^32 ≡ 5 (mod p).  All functions are shape-polymorphic jnp ops.
"""

from __future__ import annotations

import jax.numpy as jnp

P = (1 << 32) - 5  # plaintext modulus (GAMMA_P, src/lwe.h:25)
_U = jnp.uint32


def mul32(a: jnp.ndarray, b: jnp.ndarray):
    """Exact 32x32 -> 64-bit product as (hi, lo) uint32 pairs."""
    a = a.astype(_U)
    b = b.astype(_U)
    a0, a1 = a & 0xFFFF, a >> 16
    b0, b1 = b & 0xFFFF, b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = (ll >> 16) + (lh & 0xFFFF) + (hl & 0xFFFF)  # < 3*2^16
    lo = (ll & 0xFFFF) | ((mid & 0xFFFF) << 16)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    return hi, lo


def addmod_p(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p when at least ONE operand is < p (either side).

    NOT safe for two arbitrary uint32 operands: if a + b >= 2^33 - 5 the
    "+5" wrap correction itself wraps (e.g. a=2^32-1, b=2^32-4 returns 0,
    not 5).  That sum is unreachable when min(a, b) < p, which every
    in-repo call site satisfies; use add_u32_mod_p for two raw words.
    """
    s = a + b
    s = jnp.where(s < a, s + _U(5), s)  # wrapped: +2^32 ≡ +5
    return jnp.where(s >= _U(P), s - _U(P), s)


def add_u32_mod_p(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p for two ARBITRARY uint32 words (explicit carry).

    The double-wrap window addmod_p excludes (a + b in [2^33-5, 2^33-2])
    is reachable from two raw stream words — at ~2^-30 per draw, i.e.
    about once per release-scale random_ssp (716M folds) — so the hot
    fold paths must pay the one extra compare this costs.
    """
    s = a + b
    k = (s < a).astype(_U) * _U(5)  # carry word: +2^32 ≡ +5
    s = jnp.where(s >= _U(P), s - _U(P), s)  # s < p (s - p <= 4 on wrap)
    return addmod_p(s, k)  # s < p, k <= 5: in addmod_p's domain


def submod_p(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p for a, b < p."""
    return addmod_p(a, jnp.where(b > _U(0), _U(P) - b, b))


def mulmod_p(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a * b) mod p, exact for all uint32 inputs."""
    hi, lo = mul32(a, b)
    # a*b = hi*2^32 + lo ≡ 5*hi + lo;  5*hi = h2*2^32 + l2 ≡ 5*h2 + l2
    h2, l2 = mul32(hi, _U(5))
    # lo and l2 are both raw words: their add needs the full-range form
    # (the double-wrap window is reachable from uint32 products)
    return addmod_p(add_u32_mod_p(lo, l2), _U(5) * h2)  # 5*h2 <= 20


def fold64_mod_p(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """(hi * 2^32 + lo) mod p for arbitrary uint32 halves (2^32 ≡ 5).

    5*hi is only 35 bits, so its (carry, low-word) split needs two shifts
    and an overflow test — not a full 32x32 mul32 (measured: the mul32
    form cost ~40 ms per 716M folds inside the keystream kernel where
    every op competes with AES for VPU issue slots).
    """
    hi = hi.astype(_U)
    s4 = hi << 2
    lo5 = s4 + hi  # low word of 5*hi
    c = (hi >> 30) + (lo5 < s4).astype(_U)  # carry word of 5*hi, <= 4
    # lo and lo5 are both raw words — full-range add (see add_u32_mod_p)
    return addmod_p(add_u32_mod_p(lo, lo5), _U(5) * c)


def bytes_to_u64_mod_p(b: jnp.ndarray) -> jnp.ndarray:
    """uint8 [..., 8] little-endian words -> value mod p (rand_modp,
    src/lwe.h:97-103: uniform-ish uint64 mod p)."""
    w = b.astype(_U)
    shifts = jnp.arange(4, dtype=_U) * 8
    lo = jnp.sum(w[..., :4] << shifts, axis=-1)
    hi = jnp.sum(w[..., 4:] << shifts, axis=-1)
    return fold64_mod_p(hi, lo)


def powmod_p(a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e mod p, static exponent (square-and-multiply, unrolled)."""
    result = jnp.full_like(jnp.asarray(a, _U), 1)
    base = jnp.asarray(a, _U)
    while e:
        if e & 1:
            result = mulmod_p(result, base)
        e >>= 1
        if e:
            base = mulmod_p(base, base)
    return result


def invmod_p(a: jnp.ndarray) -> jnp.ndarray:
    """a^-1 mod p via Fermat (p prime)."""
    return powmod_p(a, P - 2)


def sum_mod_p(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Reduce-sum mod p along an axis via a pairwise addmod tree.

    Entries must be < p.  O(log n) vector adds — keeps everything in
    uint32 (a plain sum over d=2^15 terms would need 47 bits).
    """
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    while n > 1:
        half = n // 2
        lead = x[..., : 2 * half]
        x = jnp.concatenate(
            [addmod_p(lead[..., 0::2], lead[..., 1::2]), x[..., 2 * half :]],
            axis=-1,
        )
        n = half + (n & 1)
    return x[..., 0]


def powers_mod_p(s: jnp.ndarray, count: int) -> jnp.ndarray:
    """[1, s, s^2, ..., s^(count-1)] mod p in O(log count) vector steps.

    Doubling: P_{2k} = P_k ++ s^k * P_k.  Replaces the reference's
    sequential Horner walks (src/snark.c:75-110 message schedule,
    src/snark.c:199-201).
    """
    assert count >= 1
    out = jnp.ones((1,), _U)
    s = jnp.asarray(s, _U)
    s_pow = s  # s^(len(out))
    while out.shape[0] < count:
        out = jnp.concatenate([out, mulmod_p(s_pow, out)])
        s_pow = mulmod_p(s_pow, s_pow)
    return out[:count]


def poly_eval_mod_p(coeffs: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Evaluate polynomial(s) at scalar s: coeffs [..., d] -> [...]."""
    pw = powers_mod_p(s, coeffs.shape[-1])
    return sum_mod_p(mulmod_p(coeffs, pw))


def gated_rowsum_mod_p(v: jnp.ndarray, gate: jnp.ndarray) -> jnp.ndarray:
    """sum_{i : gate_i} v[i, :] mod p — the witness row selection.

    v: uint32 [m, d] (entries < p); gate: 0/1 uint8 [m], m <= 32768.
    The prover's w-accumulation (src/snark.c:147-155) as four byte-plane
    int8 MXU matmuls [1, m] x [m, d] (exact: plane sums <= m*255 < p)
    plus a 4-term mod-p fold — replaces an m x d masked select + mod-p
    reduction tree on the VPU.
    """
    m, d = v.shape
    if m > 32768:
        sel = jnp.where(gate[:, None].astype(bool), v, jnp.zeros_like(v))
        return sum_mod_p(sel, axis=0)
    from . import digits as dg

    g = gate.astype(jnp.uint8)[None, :]  # [1, m]
    total = jnp.zeros((d,), _U)
    for b in range(4):
        pb = ((v >> _U(8 * b)) & _U(255)).astype(jnp.uint8)  # [m, d]
        plane = dg.u8_matmul(g, pb)[0].astype(_U)  # [d] exact, < m*255 < p
        total = addmod_p(total, mulmod_p(plane, _U((1 << (8 * b)) % P)))
    return total


def matvec_mod_p(v: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """sum_i v[..., r, i] * w[i] mod p — rows of a mod-p matvec.

    v: uint32 [..., m, d]; w: uint32 [d]; entries < p.  For d <= 32768
    the contraction runs as ONE exact int8 MXU matmul over byte planes
    (u8_matmul's K*255^2 < 2^31 bound holds exactly at the release
    d=2^15): C[r, a, b] = sum_i byte_a(v) * byte_b(w) is < 2^31 < p, so
    the 16 plane sums fold with scalar mulmods by 2^(8(a+b)) mod p.
    This replaces ~8 VPU ops per (r, i) mulmod with MXU MACs — setup's
    message schedule (src/snark.c:103-110) is the heavy caller.  Larger
    d falls back to the VPU mulmod/tree-sum form.
    """
    d = v.shape[-1]
    if d > 32768 or d < 8:
        return sum_mod_p(mulmod_p(v, w[None, :]), axis=-1)
    from . import digits as dg

    shifts = jnp.arange(4, dtype=_U) * 8
    wb = ((w[:, None] >> shifts) & _U(255)).astype(jnp.uint8)  # [d, 4]
    # One matmul per v byte plane (not one [4m, d] mega-operand: at the
    # release m x d the byte-plane expansion would be ~3 GB of HBM temp
    # on top of v itself; per-plane operands let XLA fuse the shift/mask
    # into the matmul input and cap peak temp at one [m, d] u8 plane).
    c = [
        dg.u8_matmul(((v >> _U(8 * a)) & _U(255)).astype(jnp.uint8), wb)
        .astype(_U)  # int32 [..., m, 4] exact, entries < 2^31 < p
        for a in range(4)
    ]
    total = jnp.zeros(v.shape[:-1], _U)
    for ab in range(7):
        const = _U((1 << (8 * ab)) % P)
        plane = None
        for aa in range(max(0, ab - 3), min(3, ab) + 1):
            term = c[aa][..., ab - aa]  # < 2^31 < p
            plane = term if plane is None else addmod_p(plane, term)
        total = addmod_p(total, mulmod_p(plane, const))
    return total
