"""Conformance: digit-plane bignum ops vs Python int arithmetic."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c_lwe_snarks_tpu.ops import digits as dg

Q = 1 << 704
RNG = np.random.RandomState(42)


def rand_ints(n, bits=704):
    return [int.from_bytes(RNG.bytes(bits // 8), "little") for _ in range(n)]


def test_int_digit_roundtrip():
    for x in rand_ints(5):
        assert dg.digits_to_int(dg.int_to_digits(x)) == x


def test_carry_fold_random_accumulators():
    acc = RNG.randint(0, 1 << 31, (7, dg.DIGITS), dtype=np.int64).astype(np.int32)
    out = np.asarray(jax.jit(dg.carry_fold)(jnp.asarray(acc)))
    for r in range(7):
        want = sum(int(acc[r, k]) << (8 * k) for k in range(dg.DIGITS)) % Q
        assert dg.digits_to_int(out[r]) == want


def test_carry_fold_ripple_chain():
    """All-255 digits plus a 1 at the bottom: the worst-case full ripple."""
    acc = np.full((1, dg.DIGITS), 255, dtype=np.int32)
    acc[0, 0] = 256
    out = np.asarray(jax.jit(dg.carry_fold)(jnp.asarray(acc)))
    want = (sum(255 << (8 * k) for k in range(dg.DIGITS)) + 1) % Q
    assert dg.digits_to_int(out[0]) == want


def test_u8_matmul_exact():
    a = RNG.randint(0, 256, (3, 5, 37), dtype=np.uint8)
    b = RNG.randint(0, 256, (37, 11), dtype=np.uint8)
    out = np.asarray(jax.jit(dg.u8_matmul)(jnp.asarray(a), jnp.asarray(b)))
    want = a.astype(np.int64) @ b.astype(np.int64)
    assert np.array_equal(out, want)


def test_bigint_dot_matches_python():
    n = 23
    xs = rand_ints(n)
    ys = rand_ints(n)
    a = dg.ints_to_digit_matrix(xs)[None]  # batch of 1
    b = dg.ints_to_digit_matrix(ys)
    out = np.asarray(jax.jit(dg.bigint_dot)(jnp.asarray(a), jnp.asarray(b)))
    want = sum(x * y for x, y in zip(xs, ys)) % Q
    assert dg.digits_to_int(out[0]) == want


def test_bigint_dot_max_n():
    """n = 1470 all-0xff worst case: accumulator bounds hold."""
    n = 1470
    a = np.full((1, n, dg.DIGITS), 255, dtype=np.uint8)
    b = np.full((n, dg.DIGITS), 255, dtype=np.uint8)
    out = np.asarray(jax.jit(dg.bigint_dot)(jnp.asarray(a), jnp.asarray(b)))
    x = (1 << 704) - 1
    want = (n * x * x) % Q
    assert dg.digits_to_int(out[0]) == want


def test_coeff_mac_matches_python():
    d, ncoord = 200, 3
    xs = [rand_ints(ncoord) for _ in range(d)]
    coeffs = [int(c) for c in RNG.randint(0, 1 << 32, d, dtype=np.uint64)]
    x_digits = np.stack(
        [np.concatenate([dg.int_to_digits(v) for v in row]) for row in xs]
    )  # [d, ncoord*88]
    cb = np.stack([dg.int_to_digits(c, 4) for c in coeffs])  # [d, 4]

    @jax.jit
    def run(cb, xd):
        planes = dg.coeff_mac_acc(cb, xd)  # [4, X]
        planes = planes.reshape(4, ncoord, dg.DIGITS)
        return dg.carry_fold(dg.combine_shift_planes(planes))

    out = np.asarray(run(jnp.asarray(cb), jnp.asarray(x_digits)))
    for j in range(ncoord):
        want = sum(c * row[j] for c, row in zip(coeffs, xs)) % Q
        assert dg.digits_to_int(out[j]) == want


def test_coeff_mac_worst_case_bounds():
    """d = 32768 with all-ff coeffs and digits: the documented int32 edge."""
    d = 1 << 15
    xd = np.full((d, dg.DIGITS), 255, dtype=np.uint8)
    cb = np.full((d, 4), 255, dtype=np.uint8)

    @jax.jit
    def run(cb, xd):
        planes = dg.coeff_mac_acc(cb, xd)[:, None, :]
        return dg.carry_fold(dg.combine_shift_planes(planes))

    out = np.asarray(run(jnp.asarray(cb), jnp.asarray(xd)))
    want = (d * ((1 << 32) - 1) * ((1 << 704) - 1)) % Q
    assert dg.digits_to_int(out[0]) == want


def test_add_and_scalar_mul():
    x, y = rand_ints(2)
    c = int(RNG.randint(0, 1 << 32, dtype=np.uint64))
    xd = jnp.asarray(dg.int_to_digits(x)[None])
    yd = jnp.asarray(dg.int_to_digits(y)[None])
    out = np.asarray(jax.jit(dg.add_digits)(xd, yd))
    assert dg.digits_to_int(out[0]) == (x + y) % Q
    out = np.asarray(
        jax.jit(dg.scalar_mul_digits)(xd, jnp.asarray(dg.int_to_digits(c, 4)))
    )
    assert dg.digits_to_int(out[0]) == (x * c) % Q


def test_mod_p():
    p = (1 << 32) - 5
    xs = rand_ints(9) + [0, p - 1, p, p + 1, Q - 1]
    d = jnp.asarray(np.stack([dg.int_to_digits(x) for x in xs]))
    out = np.asarray(jax.jit(dg.mod_p)(d))
    for x, o in zip(xs, out):
        assert int(o) == x % p


def test_sub_mod_p():
    p = (1 << 32) - 5
    a = np.array([0, 5, p - 1, 123], dtype=np.uint32)
    b = np.array([0, 7, 1, p - 1], dtype=np.uint32)
    out = np.asarray(jax.jit(dg.sub_mod_p)(jnp.asarray(a), jnp.asarray(b)))
    for x, y, o in zip(a, b, out):
        assert int(o) == (int(x) - int(y)) % p
