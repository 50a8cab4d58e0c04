"""Conformance: mod-p scalar ops and the CRT-NTT poly engine vs python ints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c_lwe_snarks_tpu.ops import modp, ntt
from c_lwe_snarks_tpu.oracle import poly as opoly

P = modp.P
RNG = np.random.RandomState(11)


def ru32(*shape):
    return RNG.randint(0, 1 << 32, shape, dtype=np.uint64).astype(np.uint32)


def rmodp(*shape):
    return RNG.randint(0, P, shape, dtype=np.uint64).astype(np.uint32)


def test_mul32_exact():
    a, b = ru32(200), ru32(200)
    hi, lo = jax.jit(modp.mul32)(jnp.asarray(a), jnp.asarray(b))
    want = a.astype(object) * b.astype(object)
    got = np.asarray(hi).astype(object) * (1 << 32) + np.asarray(lo)
    assert np.all(got == want)


def test_add_u32_mod_p_double_wrap():
    """The full-range add at the a+b in [2^33-5, 2^33-2] window where
    addmod_p's "+5" correction itself wraps (regression: fold64/mulmod
    fed two raw words through addmod_p and returned 0 instead of 5 at
    lo=2^32-1, l2=2^32-4 — a ~2^-30-per-draw event at release scale)."""
    a = np.array([0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFE, 0xFFFFFFFB, 0, 7],
                 dtype=np.uint32)
    b = np.array([0xFFFFFFFC, 0xFFFFFFFF, 0xFFFFFFFD, 0xFFFFFFFB, 0, 11],
                 dtype=np.uint32)
    got = np.asarray(jax.jit(modp.add_u32_mod_p)(jnp.asarray(a), jnp.asarray(b)))
    want = (a.astype(object) + b.astype(object)) % P
    assert np.all(got.astype(object) == want)
    ra, rb = ru32(5000), ru32(5000)
    got = np.asarray(jax.jit(modp.add_u32_mod_p)(jnp.asarray(ra), jnp.asarray(rb)))
    assert np.all(got.astype(object) == (ra.astype(object) + rb.astype(object)) % P)


def test_fold64_mod_p_exact():
    """fold64's shift-based 5*hi split vs python ints, incl. the carry
    boundaries of the (hi<<2)+hi overflow test (hi >= 2^30, wraps)."""
    edge = np.array(
        [0, 1, (1 << 30) - 1, 1 << 30, 0xC0000000, (1 << 32) - 1,
         0xCCCCCCCC, 0x33333334],
        dtype=np.uint32,
    )
    hi = np.concatenate([edge.repeat(len(edge)), ru32(4000)])
    lo = np.concatenate([np.tile(edge, len(edge)), ru32(4000)])
    got = np.asarray(jax.jit(modp.fold64_mod_p)(jnp.asarray(hi), jnp.asarray(lo)))
    want = (hi.astype(object) * (1 << 32) + lo.astype(object)) % P
    assert np.all(got.astype(object) == want)


def test_scalar_mod_p_ops():
    a, b = ru32(300), ru32(300)
    am, bm = a % P, b % P
    add = np.asarray(jax.jit(modp.addmod_p)(jnp.asarray(a), jnp.asarray(b)))
    mul = np.asarray(jax.jit(modp.mulmod_p)(jnp.asarray(a), jnp.asarray(b)))
    sub = np.asarray(jax.jit(modp.submod_p)(jnp.asarray(am), jnp.asarray(bm)))
    for i in range(300):
        assert int(add[i]) == (int(a[i]) + int(b[i])) % P
        assert int(mul[i]) == (int(a[i]) * int(b[i])) % P
        assert int(sub[i]) == (int(am[i]) - int(bm[i])) % P


def test_powmod_invmod():
    a = rmodp(50) + 1
    inv = np.asarray(jax.jit(modp.invmod_p)(jnp.asarray(a)))
    for i in range(50):
        assert int(a[i]) * int(inv[i]) % P == 1
    cube = np.asarray(jax.jit(lambda x: modp.powmod_p(x, 3))(jnp.asarray(a)))
    for i in range(50):
        assert int(cube[i]) == pow(int(a[i]), 3, P)


def test_sum_powers_eval():
    d = 200
    c = rmodp(d)
    s = int(rmodp(1)[0])
    total = int(np.asarray(jax.jit(modp.sum_mod_p)(jnp.asarray(c))))
    assert total == sum(int(x) for x in c) % P
    pw = np.asarray(jax.jit(lambda: modp.powers_mod_p(jnp.uint32(s), d))())
    assert all(int(pw[i]) == pow(s, i, P) for i in range(d))
    ev = int(np.asarray(jax.jit(modp.poly_eval_mod_p)(jnp.asarray(c), jnp.uint32(s))))
    assert ev == opoly.poly_eval([int(x) for x in c], s)


@pytest.mark.parametrize("q", ntt.NTT_PRIMES)
def test_ntt_roundtrip(q):
    n = 128
    x = RNG.randint(0, q, n, dtype=np.uint64).astype(np.uint32)
    fwd = jax.jit(lambda v: ntt.ntt_forward(v, q))(jnp.asarray(x))
    back = np.asarray(jax.jit(lambda v: ntt.ntt_inverse(v, q))(fwd))
    assert np.array_equal(back, x)


@pytest.mark.parametrize("q", ntt.NTT_PRIMES)
def test_ntt_convolution_theorem(q):
    """Pointwise product in NTT domain == cyclic convolution."""
    n = 64
    a = RNG.randint(0, q, n, dtype=np.uint64).astype(np.uint32)
    b = RNG.randint(0, q, n, dtype=np.uint64).astype(np.uint32)
    ctx = ntt._prime_ctx(q)

    @jax.jit
    def conv(a, b):
        fa, fb = ntt.ntt_forward(a, q), ntt.ntt_forward(b, q)
        return ntt.ntt_inverse(ctx.mulmod(fa, fb), q)

    got = np.asarray(conv(jnp.asarray(a), jnp.asarray(b)))
    want = np.zeros(n, dtype=object)
    for i in range(n):
        for j in range(n):
            want[(i + j) % n] += int(a[i]) * int(b[j])
    assert np.all(got == np.array([int(w) % q for w in want], np.uint32))


def test_poly_mul_mod_p_matches_oracle():
    la, lb = 37, 61
    a = rmodp(la)
    b = rmodp(lb)
    out = np.asarray(
        jax.jit(lambda a, b: ntt.poly_mul_mod_p(a, b))(jnp.asarray(a), jnp.asarray(b))
    )
    want = opoly.poly_mul([int(x) for x in a], [int(x) for x in b])
    want = want + [0] * (la + lb - 1 - len(want))
    assert [int(x) for x in out] == want


def test_poly_mul_batched():
    a = rmodp(3, 16)
    b = rmodp(16)
    out = np.asarray(jax.jit(lambda a, b: ntt.poly_mul_mod_p(a, b))(
        jnp.asarray(a), jnp.asarray(b)))
    for r in range(3):
        want = opoly.poly_mul([int(x) for x in a[r]], [int(x) for x in b])
        want = want + [0] * (31 - len(want))
        assert [int(x) for x in out[r]] == want


def test_poly_inv_series():
    d = 32
    t = rmodp(d)
    t[0] = max(1, t[0])
    inv = np.asarray(
        jax.jit(lambda t: ntt.poly_inv_series_mod_p(t, d))(jnp.asarray(t))
    )
    prod = opoly.poly_mul([int(x) for x in t], [int(x) for x in inv])
    assert prod[0] == 1 and all(c == 0 for c in prod[1:d])


def test_poly_div_exact_random():
    """num = den * quot  ->  recover quot exactly."""
    d = 64
    den = rmodp(d)
    den[-1] = max(1, den[-1])  # formal degree = true degree
    quot = rmodp(d)
    num = opoly.poly_mul([int(x) for x in den], [int(x) for x in quot])
    num = np.array(num + [0] * (2 * d - 1 - len(num)), np.uint32)
    got = np.asarray(
        jax.jit(lambda n, dd: ntt.poly_div_exact_mod_p(n, dd, d))(
            jnp.asarray(num), jnp.asarray(den)
        )
    )
    assert np.array_equal(got, quot)


def test_poly_div_ssp_shape():
    """h = (v^2 - 1) / t with v = t + 1 (the random_ssp relation)."""
    d = 32
    t = rmodp(d)
    t[-1] = max(1, t[-1])
    t_int = [int(x) for x in t]
    v_int = opoly.poly_add(t_int, [1])
    num_int = opoly.poly_sub(opoly.poly_mul(v_int, v_int), [1])
    num = np.zeros(2 * d - 1, np.uint32)
    num[: len(num_int)] = num_int
    got = np.asarray(
        jax.jit(lambda n, dd: ntt.poly_div_exact_mod_p(n, dd, d))(
            jnp.asarray(num), jnp.asarray(t)
        )
    )
    want = opoly.poly_div(num_int, t_int)
    want = want + [0] * (d - len(want))
    assert [int(x) for x in got] == want


def test_poly_div_true_degree_degenerate():
    """deg(t) < d-1 (top coefficient zero): FLINT true-degree semantics.

    The reference divides by the data-dependent true degree
    (src/snark.c:166-169); a random_ssp instance hits this with
    probability 1/p, so it is constructed here.
    """
    d = 32
    t = rmodp(d)
    t[-1] = 0
    t[-2] = 0
    t[-3] = max(1, t[-3])  # true degree d-3
    t_int = [int(x) for x in t]
    v_int = opoly.poly_add(t_int, [1])  # v = t + 1 => v^2 - 1 = t(t + 2)
    num_int = opoly.poly_sub(opoly.poly_mul(v_int, v_int), [1])
    num = np.zeros(2 * d - 1, np.uint32)
    num[: len(num_int)] = num_int
    got = np.asarray(
        jax.jit(lambda n, dd: ntt.poly_div_exact_mod_p(n, dd, d))(
            jnp.asarray(num), jnp.asarray(t)
        )
    )
    want = opoly.poly_div(num_int, t_int)
    want = (want + [0] * d)[:d]
    assert [int(x) for x in got] == want


def test_poly_div_true_degree_quotient_overflows_d():
    """deg(t) = d-2 with deg(num) = 2d-2: true quotient has degree d,
    one past the d coefficient slots eval_poly reads — the returned
    window must be the LOW d coefficients (reference drops the top)."""
    d = 16
    t = rmodp(d)
    t[-1] = 0
    t[-2] = max(1, t[-2])  # true degree d-2
    q_true = rmodp(d + 1)  # degree d > d-1
    q_true[-1] = max(1, q_true[-1])
    t_int = [int(x) for x in t]
    q_int = [int(x) for x in q_true]
    num_int = opoly.poly_mul(t_int, q_int)  # degree 2d-2
    num = np.zeros(2 * d - 1, np.uint32)
    num[: len(num_int)] = num_int
    got = np.asarray(
        jax.jit(lambda n, dd: ntt.poly_div_exact_mod_p(n, dd, d))(
            jnp.asarray(num), jnp.asarray(t)
        )
    )
    assert [int(x) for x in got] == q_int[:d]


def test_poly_mul_sharded_matches():
    """4-step sharded transform == the replicated engine, bit for bit.

    n=256 -> n1=n2=16, both multiples of the 8-device mesh; one
    all_to_all per transform direction (ntt._mul4_body)."""
    from c_lwe_snarks_tpu.parallel import mesh as pmesh

    assert len(jax.devices()) >= 8
    mesh = pmesh.make_mesh(8)
    a, b = rmodp(128), rmodp(128)
    want = jax.jit(lambda a, b: ntt.poly_mul_mod_p(a, b))(
        jnp.asarray(a), jnp.asarray(b))
    got = jax.jit(
        lambda a, b: ntt.poly_mul_mod_p(a, b, mesh=mesh, min_shard_n=64)
    )(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow  # Newton's sharded-mul cascade is a ~90 s compile;
# replicated division + the sharded single mul stay in the fast gate
def test_poly_div_sharded_matches():
    from c_lwe_snarks_tpu.parallel import mesh as pmesh

    assert len(jax.devices()) >= 8
    mesh = pmesh.make_mesh(8)
    den = rmodp(64)
    den[-1] |= 1  # nonzero top coefficient: the fast path
    quot = rmodp(65)
    num = np.asarray(jax.jit(lambda a, b: ntt.poly_mul_mod_p(a, b))(
        jnp.asarray(den), jnp.asarray(quot)))
    want = jax.jit(
        lambda n, d: ntt.poly_div_exact_mod_p(n, d, 65)
    )(jnp.asarray(num), jnp.asarray(den))
    got = jax.jit(
        lambda n, d: ntt.poly_div_exact_mod_p(
            n, d, 65, mesh=mesh, min_shard_n=64
        )
    )(jnp.asarray(num), jnp.asarray(den))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_matvec_mod_p_matches_vpu_form():
    """MXU byte-plane matvec == the mulmod/tree-sum form, all paths."""
    for m, d in ((5, 4), (7, 64), (3, 257), (2, 32768)):
        v = rmodp(m, d)
        w = rmodp(d)
        want = jax.jit(
            lambda v, w: modp.sum_mod_p(modp.mulmod_p(v, w[None, :]), axis=-1)
        )(jnp.asarray(v), jnp.asarray(w))
        got = jax.jit(modp.matvec_mod_p)(jnp.asarray(v), jnp.asarray(w))
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want), err_msg=f"m={m} d={d}")


def test_gated_rowsum_mod_p():
    for m, d in ((9, 16), (64, 128)):
        v = rmodp(m, d)
        gate = (RNG.randint(0, 2, m)).astype(np.uint8)
        want = jax.jit(
            lambda v, g: modp.sum_mod_p(
                jnp.where(g[:, None].astype(bool), v, jnp.zeros_like(v)),
                axis=0,
            )
        )(jnp.asarray(v), jnp.asarray(gate))
        got = jax.jit(modp.gated_rowsum_mod_p)(
            jnp.asarray(v), jnp.asarray(gate))
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want), err_msg=f"m={m} d={d}")
