"""CRT-NTT polynomial engine over Z_p, p = 2^32 - 5.

The reference delegates Z_p polynomial multiplication/division to FLINT
(src/snark.c:166-169: h = (v^2 - 1) / t).  p - 1 = 2 * 5 * 19 * 22605091
has 2-adicity 1, so there is no radix-2 NTT mod p itself; instead each
product runs CRT-style over three NTT-friendly ~31-bit primes and is
reconstructed mod p (exact: the integer coefficients of a product of
degree-<2^15 polynomials with entries < p are < 2^79 < q1*q2*q3 ≈ 2^92.7).

TPUs have no 64-bit multiply, so all prime-field products are Montgomery
multiplications built from 16-bit halves (ops/modp.mul32).  Twiddle
factors are stored in Montgomery form; data stays in the plain domain
(mont_mul(plain, w*R) == plain*w mod q), so a butterfly is one mont_mul
plus an add/sub pair — all VPU lane arithmetic, log2(N) fully-vectorized
stages, no gathers except one static bit-reversal permutation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import modp

_U = jnp.uint32

# q = c * 2^k + 1, primality and 2-adicity asserted in _PrimeCtx.
NTT_PRIMES = (2013265921, 1811939329, 2281701377)  # 15*2^27+1, 27*2^26+1, 17*2^27+1


def _is_prime(n: int) -> bool:
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % a == 0:
            return n == a
        d, s = n - 1, 0
        while d % 2 == 0:
            d //= 2
            s += 1
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def _factor(n: int) -> set:
    fs, d = set(), 2
    while d * d <= n:
        while n % d == 0:
            fs.add(d)
            n //= d
        d += 1
    if n > 1:
        fs.add(n)
    return fs


class _PrimeCtx:
    """Montgomery context for one 32-bit NTT prime (host-side constants)."""

    def __init__(self, q: int):
        assert _is_prime(q), q
        self.q = q
        self.two_adicity = (q - 1 & -(q - 1)).bit_length() - 1
        # -q^-1 mod 2^32
        self.qinv_neg = (-pow(q, -1, 1 << 32)) % (1 << 32)
        self.r2 = (1 << 64) % q  # to_mont multiplier
        g = 2
        fs = _factor(q - 1)
        while any(pow(g, (q - 1) // f, q) == 1 for f in fs):
            g += 1
        self.generator = g

    # ---- jnp ops (all uint32, shape-polymorphic) -------------------------
    def mont_mul(self, a, b):
        """a * b * 2^-32 mod q, inputs < q (or one input < 2^32)."""
        hi_ab, lo_ab = modp.mul32(a, b)
        m = lo_ab * _U(self.qinv_neg)  # wrapping
        hi_mq, _ = modp.mul32(m, _U(self.q))
        t = hi_ab + hi_mq + (lo_ab != 0).astype(_U)
        return jnp.where(t >= _U(self.q), t - _U(self.q), t)

    def mulmod(self, a, b):
        """a * b mod q (plain domain), inputs < q."""
        return self.mont_mul(self.mont_mul(a, b), _U(self.r2))

    def addmod(self, a, b):
        s = a + b  # < 2q < 2^33 -- but q > 2^31 can wrap uint32!
        wrapped = s < a
        s = jnp.where(wrapped, s + _U((1 << 32) % self.q), s)
        return jnp.where(s >= _U(self.q), s - _U(self.q), s)

    def submod(self, a, b):
        return self.addmod(a, jnp.where(b > _U(0), _U(self.q) - b, b))

    def reduce_u32(self, x):
        """Arbitrary uint32 -> mod q (q > 2^30.7: at most 2 subtracts)."""
        if 2 * self.q < 1 << 32:
            x = jnp.where(x >= _U(2 * self.q), x - _U(2 * self.q), x)
        return jnp.where(x >= _U(self.q), x - _U(self.q), x)


@functools.cache
def _prime_ctx(q: int) -> _PrimeCtx:
    return _PrimeCtx(q)


@functools.cache
def _tables(q: int, n: int):
    """Per-stage twiddles (Montgomery form) + bit-rev perm for size n."""
    ctx = _prime_ctx(q)
    logn = n.bit_length() - 1
    assert 1 << logn == n and logn <= ctx.two_adicity, (q, n)
    w_n = pow(ctx.generator, (q - 1) // n, q)
    rev = np.zeros(n, np.int32)
    for i in range(n):
        rev[i] = int(format(i, f"0{logn}b")[::-1], 2) if logn else 0
    fwd, inv = [], []
    r = 1 << 32
    for s in range(1, logn + 1):
        length = 1 << s
        w = pow(w_n, n // length, q)
        tw = np.empty(length // 2, np.uint32)
        v = 1
        for j in range(length // 2):
            tw[j] = v * r % q
            v = v * w % q
        fwd.append(tw)
        wi = pow(w, q - 2, q)
        twi = np.empty(length // 2, np.uint32)
        v = 1
        for j in range(length // 2):
            twi[j] = v * r % q
            v = v * wi % q
        inv.append(twi)
    n_inv_mont = np.uint32(pow(n, q - 2, q) * r % q)
    return rev, fwd, inv, n_inv_mont


def _ntt_core(x: jnp.ndarray, q: int, stage_tw, rev) -> jnp.ndarray:
    """Radix-2 DIT NTT along the last axis; x uint32 [..., n] mod q."""
    ctx = _prime_ctx(q)
    n = x.shape[-1]
    x = jnp.take(x, jnp.asarray(rev), axis=-1)
    for s, tw in enumerate(stage_tw, start=1):
        length = 1 << s
        half = length // 2
        v = x.reshape(*x.shape[:-1], n // length, 2, half)
        u, w = v[..., 0, :], v[..., 1, :]
        wv = ctx.mont_mul(w, jnp.asarray(tw))
        x = jnp.concatenate(
            [ctx.addmod(u, wv)[..., None, :], ctx.submod(u, wv)[..., None, :]],
            axis=-2,
        ).reshape(*x.shape[:-1], n)
    return x


def ntt_forward(x: jnp.ndarray, q: int) -> jnp.ndarray:
    rev, fwd, _, _ = _tables(q, x.shape[-1])
    return _ntt_core(x, q, fwd, rev)


def ntt_inverse(x: jnp.ndarray, q: int) -> jnp.ndarray:
    rev, _, inv, n_inv_mont = _tables(q, x.shape[-1])
    out = _ntt_core(x, q, inv, rev)
    return _prime_ctx(q).mont_mul(out, jnp.asarray(n_inv_mont)[None])


# --------------------------------------------------------------------------
# Prime-batched transforms: all three CRT residues in ONE op stream.
#
# The replicated (single-chip) path's wall time is dispatch-bound: a
# radix-2 stage is ~20 small VPU ops on a [n] array, and running the
# three primes separately triples the op count for the same FLOPs.
# Here the prime axis is a leading tensor axis and the Montgomery/field
# constants are [3, 1, 1] broadcasts, so one stage serves all residues
# (and fwd(a)/fwd(b) stack on a second batch axis).  Bit-identical to
# the per-prime path (same butterflies, same tables).
# --------------------------------------------------------------------------


def _vconst(vals, ndim: int) -> np.ndarray:
    """uint32 [3] constants shaped [3, 1, ..] to broadcast over [3, B, n].

    Kept as NUMPY: jnp ops treat them as embedded constants, and a cached
    device array materialized inside a jit trace would leak tracers
    (same rule as aes_pallas._v2_meta_jnp)."""
    return np.asarray(vals, np.uint32).reshape((3,) + (1,) * (ndim - 1))


@functools.cache
def _vctx(ndim: int):
    """Broadcast constant set for the prime-batched ops at rank ndim."""
    ctxs = [_prime_ctx(q) for q in NTT_PRIMES]
    return dict(
        q=_vconst([c.q for c in ctxs], ndim),
        qinv=_vconst([c.qinv_neg for c in ctxs], ndim),
        r2=_vconst([c.r2 for c in ctxs], ndim),
        wrap=_vconst([(1 << 32) % c.q for c in ctxs], ndim),
    )


def _mont_mul_v(a, b, vc):
    hi_ab, lo_ab = modp.mul32(a, b)
    m = lo_ab * vc["qinv"]  # wrapping
    hi_mq, _ = modp.mul32(m, vc["q"])
    t = hi_ab + hi_mq + (lo_ab != 0).astype(_U)
    return jnp.where(t >= vc["q"], t - vc["q"], t)


def _addmod_v(a, b, vc):
    s = a + b
    s = jnp.where(s < a, s + vc["wrap"], s)  # uint32 wrap (q > 2^31 possible)
    return jnp.where(s >= vc["q"], s - vc["q"], s)


def _submod_v(a, b, vc):
    return _addmod_v(a, jnp.where(b > _U(0), vc["q"] - b, b), vc)


def _reduce_u32_v(x, vc):
    # q >= 2^32/3 for all three primes: two conditional subtracts land < q
    x = jnp.where(x >= vc["q"], x - vc["q"], x)
    return jnp.where(x >= vc["q"], x - vc["q"], x)


@functools.cache
def _tables_v(n: int):
    """Prime-stacked per-stage twiddles: [stage][3, half] + shared rev."""
    per = [_tables(q, n) for q in NTT_PRIMES]
    rev = per[0][0]  # bit-reversal depends only on n
    logn = n.bit_length() - 1
    fwd = [np.stack([per[p][1][s] for p in range(3)]) for s in range(logn)]
    inv = [np.stack([per[p][2][s] for p in range(3)]) for s in range(logn)]
    n_inv = np.stack([per[p][3] for p in range(3)])  # [3]
    return rev, fwd, inv, n_inv


def _ntt_core_v(x: jnp.ndarray, stage_tw, rev) -> jnp.ndarray:
    """Radix-2 DIT NTT along the last axis; x uint32 [3, ..., n]."""
    vc = _vctx(x.ndim + 1)  # +1: the stage view adds a (pairs, 2) axis
    n = x.shape[-1]
    x = jnp.take(x, jnp.asarray(rev), axis=-1)
    for s, tw in enumerate(stage_tw, start=1):
        length = 1 << s
        half = length // 2
        v = x.reshape(*x.shape[:-1], n // length, 2, half)
        u, w = v[..., 0, :], v[..., 1, :]
        twb = tw.reshape((3,) + (1,) * (x.ndim - 1) + (half,))  # np constant
        wv = _mont_mul_v(w, twb, vc)
        x = jnp.concatenate(
            [_addmod_v(u, wv, vc)[..., None, :], _submod_v(u, wv, vc)[..., None, :]],
            axis=-2,
        ).reshape(*x.shape[:-1], n)
    return x


def _poly_mul_batched(ap: jnp.ndarray, bp: jnp.ndarray | None) -> jnp.ndarray:
    """Replicated CRT product of padded pow2-length arrays, prime-batched.

    ap/bp: uint32 [..., n] mod p.  bp=None computes the square (one
    forward transform instead of two — the prover's v^2).  Returns the
    full cyclic product coefficients mod p, [..., n].
    """
    n = ap.shape[-1]
    rev, fwd, inv, n_inv = _tables_v(n)
    if bp is None:
        xs = jnp.broadcast_to(ap, (3, *ap.shape))  # [3, ..., n]
        xs = _reduce_u32_v(xs, _vctx(xs.ndim))
        f = _ntt_core_v(xs, fwd, rev)
        vc = _vctx(f.ndim)
        prod = _mont_mul_v(_mont_mul_v(f, f, vc), vc["r2"], vc)
    else:
        if ap.shape != bp.shape:  # batched-vs-plain operands broadcast
            shape = jnp.broadcast_shapes(ap.shape, bp.shape)
            ap = jnp.broadcast_to(ap, shape)
            bp = jnp.broadcast_to(bp, shape)
        stacked = jnp.stack([ap, bp])  # [2, ..., n]
        xs = jnp.broadcast_to(stacked, (3, *stacked.shape))  # [3, 2, ..., n]
        xs = _reduce_u32_v(xs, _vctx(xs.ndim))
        f = _ntt_core_v(xs, fwd, rev)
        vc = _vctx(f.ndim - 1)
        prod = _mont_mul_v(_mont_mul_v(f[:, 0], f[:, 1], vc), vc["r2"], vc)
    out = _ntt_core_v(prod, inv, rev)
    vc = _vctx(out.ndim)
    out = _mont_mul_v(out, _vconst(n_inv, out.ndim), vc)
    return crt_to_mod_p(out[0], out[1], out[2])


# --------------------------------------------------------------------------
# CRT reconstruction mod p (Garner, 3 primes).
# --------------------------------------------------------------------------

_Q1, _Q2, _Q3 = NTT_PRIMES
_INV_Q1_MOD_Q2 = pow(_Q1, -1, _Q2)
_INV_Q1Q2_MOD_Q3 = pow(_Q1 * _Q2, -1, _Q3)
_Q1_MOD_Q3 = _Q1 % _Q3
_Q1_MOD_P = _Q1 % modp.P
_Q1Q2_MOD_P = (_Q1 * _Q2) % modp.P


def crt_to_mod_p(r1: jnp.ndarray, r2: jnp.ndarray, r3: jnp.ndarray) -> jnp.ndarray:
    """Residues mod (q1, q2, q3) -> value mod p (value < q1*q2*q3)."""
    c2 = _prime_ctx(_Q2)
    c3 = _prime_ctx(_Q3)
    t2 = c2.mulmod(c2.submod(r2, c2.reduce_u32(r1)), _U(_INV_Q1_MOD_Q2))
    u = c3.submod(
        c3.submod(r3, c3.reduce_u32(r1)),
        c3.mulmod(_U(_Q1_MOD_Q3), c3.reduce_u32(t2)),
    )
    t3 = c3.mulmod(u, _U(_INV_Q1Q2_MOD_Q3))
    # x = r1 + q1*t2 + q1*q2*t3  (Garner); r1 < q1 < p, t2 < q2 < p, t3 < q3 < p
    return modp.addmod_p(
        r1,
        modp.addmod_p(
            modp.mulmod_p(_U(_Q1_MOD_P), t2), modp.mulmod_p(_U(_Q1Q2_MOD_P), t3)
        ),
    )


# --------------------------------------------------------------------------
# Distributed 4-step NTT (Bailey) over a 1-D device mesh.
#
# The SNARK's only replicated long-axis stage is the prover's h-poly
# (src/snark.c:166-169).  Here the transform length N = n1*n2 decomposes
# into column-DFTs (local: the coefficient matrix is column-sharded),
# one twiddle scale, ONE all_to_all transpose over ICI, and row-DFTs
# (local) — the classic 4-step factorization mapped onto shard_map.
# The pointwise product happens in the row-sharded frequency layout and
# the inverse mirrors every step, so a full sharded poly_mul moves each
# residue array across ICI exactly 3 times (fwd a, fwd b, inverse).
# --------------------------------------------------------------------------


@functools.cache
def _twiddle4(q: int, n1: int, n2: int, inverse: bool) -> np.ndarray:
    """uint32 [n2, n1] Montgomery-form w_N^{±j2*k1} twiddle table."""
    ctx = _prime_ctx(q)
    N = n1 * n2
    w = pow(ctx.generator, (q - 1) // N, q)
    if inverse:
        w = pow(w, q - 2, q)
    col = np.empty(n2, np.uint64)
    v = 1
    for j2 in range(n2):
        col[j2] = v
        v = v * w % q
    T = np.empty((n2, n1), np.uint64)
    T[:, 0] = 1
    for k1 in range(1, n1):
        T[:, k1] = T[:, k1 - 1] * col % q
    return ((T << 32) % q).astype(np.uint32)  # Montgomery form


def _mul4_body(axis: str, n1: int, n2: int, a_cols, b_cols, *tws):
    """Per-shard body of the sharded poly mul (one CRT residue set).

    a_cols/b_cols: uint32 [n1, n2/P] coefficient column blocks
    (x[j1*n2 + j2] = A[j1, j2]); tws: per-prime (fwd, inv) twiddle
    blocks [n2/P, n1].  Returns coefficient column blocks of a*b mod p.
    """
    outs = []
    for qi, q in enumerate(NTT_PRIMES):
        ctx = _prime_ctx(q)
        rev1, fwd1, inv1, n1_inv = _tables(q, n1)
        rev2, fwd2, inv2, n2_inv = _tables(q, n2)
        tw_f, tw_i = tws[2 * qi], tws[2 * qi + 1]

        def fwd(x_cols):
            # column DFT_{n1} (local, over j1) -> y[j2_local, k1]
            y = _ntt_core(ctx.reduce_u32(x_cols).T, q, fwd1, rev1)
            y = ctx.mont_mul(y, tw_f)  # w_N^{j2*k1}
            # ICI transpose: column-sharded -> row-sharded
            y = jax.lax.all_to_all(y, axis, 1, 0, tiled=True)  # [n2, n1/P]
            # row DFT_{n2} (local, over j2) -> z[k1_local, k2]
            return _ntt_core(y.T, q, fwd2, rev2)

        prod = ctx.mulmod(fwd(a_cols), fwd(b_cols))
        # inverse: mirror each step
        y = _ntt_core(prod, q, inv2, rev2)
        y = ctx.mont_mul(y, jnp.asarray(n2_inv)[None])
        y = jax.lax.all_to_all(y.T, axis, 0, 1, tiled=True)  # [n2/P, n1]
        y = ctx.mont_mul(y, tw_i)  # w_N^{-j2*k1}
        y = _ntt_core(y, q, inv1, rev1)
        y = ctx.mont_mul(y, jnp.asarray(n1_inv)[None])
        outs.append(y.T)  # [n1, n2/P]
    return crt_to_mod_p(*outs)


def _poly_mul_sharded_n(ap: jnp.ndarray, bp: jnp.ndarray, mesh) -> jnp.ndarray:
    """Sharded full-length product of padded length-n coefficient arrays."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    (axis,) = mesh.axis_names
    n = ap.shape[-1]
    logn = n.bit_length() - 1
    n1 = 1 << (logn - logn // 2)
    n2 = n // n1
    tws = []
    for q in NTT_PRIMES:
        tws.append(jnp.asarray(_twiddle4(q, n1, n2, False)))
        tws.append(jnp.asarray(_twiddle4(q, n1, n2, True)))
    out = shard_map(
        functools.partial(_mul4_body, axis, n1, n2),
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis)) + (P(axis, None),) * 6,
        out_specs=P(None, axis),
    )(ap.reshape(n1, n2), bp.reshape(n1, n2), *tws)
    return out.reshape(n)


def _can_shard_mul(n: int, a, b, mesh, min_n: int) -> bool:
    if mesh is None or a.ndim != 1 or b.ndim != 1 or n < min_n:
        return False
    (axis,) = mesh.axis_names
    nshards = mesh.shape[axis]
    logn = n.bit_length() - 1
    n1 = 1 << (logn - logn // 2)
    return nshards > 1 and n1 % nshards == 0 and (n // n1) % nshards == 0


# --------------------------------------------------------------------------
# Polynomial multiply / exact divide mod p.
# --------------------------------------------------------------------------


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def poly_mul_mod_p(
    a: jnp.ndarray,
    b: jnp.ndarray,
    out_len: int | None = None,
    *,
    mesh=None,
    min_shard_n: int = 4096,
):
    """Full product of coefficient arrays mod p.

    a: uint32 [..., la], b: uint32 [..., lb] (entries < p, deg = formal).
    Returns uint32 [..., out_len] (default la+lb-1), truncated.  With
    ``mesh`` set and the padded length large enough, the transform runs
    4-step sharded over the mesh (bit-identical; see _mul4_body).
    """
    la, lb = a.shape[-1], b.shape[-1]
    full = la + lb - 1
    if out_len is None:
        out_len = full
    n = _next_pow2(max(full, 2))
    pad_a = [(0, 0)] * (a.ndim - 1) + [(0, n - la)]
    pad_b = [(0, 0)] * (b.ndim - 1) + [(0, n - lb)]
    ap = jnp.pad(a, pad_a)
    bp = jnp.pad(b, pad_b)
    if _can_shard_mul(n, a, b, mesh, min_shard_n):
        out = _poly_mul_sharded_n(ap, bp, mesh)
    else:
        # prime-batched replicated path; a square (the prover's v^2) runs
        # one forward transform instead of two
        out = _poly_mul_batched(ap, None if a is b else bp)
    out = out[..., : min(out_len, full)]
    if out_len > full:  # requested window extends past the exact product
        out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, out_len - full)])
    return out


def poly_inv_series_mod_p(
    t: jnp.ndarray, out_len: int, *, mesh=None, min_shard_n: int = 4096
) -> jnp.ndarray:
    """Power-series inverse of t mod x^out_len (t[0] must be invertible).

    Newton: S_{2k} = S_k * (2 - t * S_k) mod x^{2k}.  Used for exact
    division (the FLINT nmod_poly_div replacement, src/snark.c:166-169).
    With ``mesh``, the large Newton levels run on the sharded transform.
    """
    s = modp.invmod_p(t[..., :1])
    k = 1
    while k < out_len:
        k2 = min(2 * k, _next_pow2(out_len))
        ts = poly_mul_mod_p(
            t[..., :k2], s, out_len=k2, mesh=mesh, min_shard_n=min_shard_n
        )
        # 2 - ts
        two_minus = modp.submod_p(
            jnp.zeros_like(ts).at[..., 0].set(2), ts
        )
        s = poly_mul_mod_p(
            s, two_minus, out_len=k2, mesh=mesh, min_shard_n=min_shard_n
        )
        k = k2
    return s[..., :out_len]


def poly_true_degree(x: jnp.ndarray) -> jnp.ndarray:
    """Index of the highest nonzero coefficient (-1 for the zero poly)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.max(jnp.where(x != 0, iota, -1), axis=-1)


def _div_rev_core(
    num: jnp.ndarray, den: jnp.ndarray, ql: int, mesh=None,
    min_shard_n: int = 4096,
) -> jnp.ndarray:
    """Reversed-series exact division; den's LAST formal entry nonzero.

    Valid whenever num = den * q exactly with deg q < ql: the formal
    reversal identity rev(num) = rev(den) * rev_ql(q) holds even when
    num's top formal coefficients are zero.
    """
    nr = jnp.flip(num, axis=-1)
    dr = jnp.flip(den, axis=-1)
    inv = poly_inv_series_mod_p(dr, ql, mesh=mesh, min_shard_n=min_shard_n)
    qr = poly_mul_mod_p(
        nr[..., :ql], inv, out_len=ql, mesh=mesh, min_shard_n=min_shard_n
    )
    return jnp.flip(qr, axis=-1)


def _fit_len(q: jnp.ndarray, out_len: int) -> jnp.ndarray:
    if q.shape[-1] >= out_len:
        return q[..., :out_len]
    return jnp.pad(q, [(0, 0)] * (q.ndim - 1) + [(0, out_len - q.shape[-1])])


def poly_div_exact_mod_p(
    num: jnp.ndarray, den: jnp.ndarray, quot_len: int, *, mesh=None,
    min_shard_n: int = 4096,
) -> jnp.ndarray:
    """Exact quotient num / den mod p with FLINT true-degree semantics.

    num: uint32 [ln]; den: uint32 [ld].  The reference divides by den's
    data-dependent TRUE degree (FLINT nmod_poly_divrem at
    src/snark.c:166-169), which for random_ssp instances is < ld-1 with
    probability 1/p per instance.  When den's last formal coefficient is
    zero, both operands are multiplied by x^(ld-1-dt) — an exact-
    quotient-preserving shift — so the reversed series always inverts a
    nonzero constant term.  Returns the LOW quot_len coefficients of the
    true quotient (what eval_poly reads: coefficients 0..d-1 regardless
    of deg h, src/lwe.c:176-186).  quot_len is static.
    """
    assert num.ndim == 1 and den.ndim == 1, "division is single-polynomial"
    ln, ld = num.shape[-1], den.shape[-1]
    shift = jnp.int32(ld - 1) - poly_true_degree(den)

    def fast(_):
        # common case (deg den == ld-1): quotient length ln - ld + 1
        return _fit_len(
            _div_rev_core(num, den, max(ln - ld + 1, 1), mesh, min_shard_n),
            quot_len,
        )

    def general(_):
        # num' = x^s num, den' = x^s den: den' has full formal degree.
        # True quotient degree <= ln - 1 (see bound in _div_rev_core),
        # so ql = ln covers it; rolls are pure shifts (the wrapped
        # entries are zeros by construction of s).
        num2 = jnp.roll(jnp.pad(num, (0, ld - 1)), shift)
        den2 = jnp.roll(den, shift)
        return _fit_len(
            _div_rev_core(num2, den2, ln, mesh, min_shard_n), quot_len
        )

    return jax.lax.cond(shift == 0, fast, general, None)
