"""Conformance: TPU LWE layer vs the host oracle (bit-exact).

Mirrors the reference's test_lwe.c strategy (roundtrip, import/export,
homomorphic eval — src/test_lwe.c:36-205) but checks every digit of every
coordinate against the python-int oracle, with fixed injected randomness.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c_lwe_snarks_tpu.models import lwe as tlwe
from c_lwe_snarks_tpu.ops import digits as dg
from c_lwe_snarks_tpu.ops import sampling
from c_lwe_snarks_tpu.oracle import lwe as olwe
from c_lwe_snarks_tpu.oracle.prg import AesCtrStream
from c_lwe_snarks_tpu.utils import params as params_mod

P = params_mod.Params(d=16, m=8, n=32)  # micro instance: fast CPU tests
Q = P.q_eff
SEED = bytes(range(40))
RNG = np.random.RandomState(7)


@pytest.fixture(scope="module")
def key():
    return sampling.PRGKey(SEED)


def oracle_stream(offset=0):
    s = AesCtrStream.from_seed(SEED)
    s.seek(offset)
    return s


def rand_sk():
    """Random sk as (python ints mod 2^704, digit tensor)."""
    ints = [int.from_bytes(RNG.bytes(88), "little") for _ in range(P.n)]
    return ints, jnp.asarray(dg.ints_to_digit_matrix(ints))


def digits_int(arr):
    return dg.digits_to_int(np.asarray(arr))


def test_expand_a_matches_oracle(key):
    # deliberately unaligned offset (1 ct's worth = CTR_CT % 16 != 0)
    off = P.ctr_ct
    a = np.asarray(jax.jit(
        lambda: sampling.expand_a(key, off, 3, P.n)
    )())
    o = oracle_stream(off)
    for c in range(3):
        a_ints = olwe.expand_a(o, P)
        for i in range(P.n):
            assert digits_int(a[c, i]) == a_ints[i] % Q


def test_encrypt_decrypt_roundtrip_and_bitexact(key):
    sk_ints, sk = rand_sk()
    msgs = RNG.randint(0, P.p, 4, dtype=np.uint64).astype(np.uint32)
    errs_int = [int.from_bytes(RNG.bytes(69), "little") for _ in range(4)]
    errs = jnp.asarray(
        np.stack([dg.int_to_digits(e % Q) for e in errs_int])
    )
    ct = jax.jit(
        lambda: tlwe.encrypt(key, 0, sk, jnp.asarray(msgs), errs, P)
    )()
    # bit-exact b against python-int arithmetic on oracle-expanded a
    o = oracle_stream(0)
    for c in range(4):
        a_ints = olwe.expand_a(o, P)
        want_b = (
            sum(a * s for a, s in zip(a_ints, sk_ints)) + P.p * errs_int[c] + int(msgs[c])
        ) % Q
        assert digits_int(np.asarray(ct)[c, P.n]) == want_b
    # decrypt
    m_out = np.asarray(jax.jit(lambda ct: tlwe.decrypt(ct, sk, P))(ct))
    assert np.array_equal(m_out, msgs)


def test_ct_export_import_roundtrip(key):
    """Compressed export -> import reproduces the full ciphertext
    (src/test_lwe.c:36-70)."""
    sk_ints, sk = rand_sk()
    msgs = jnp.asarray(RNG.randint(0, P.p, 2, dtype=np.uint64).astype(np.uint32))
    errs = jnp.zeros((2, 88), jnp.uint8)
    off = 3 * P.ctr_ct
    ct = jax.jit(lambda: tlwe.encrypt(key, off, sk, msgs, errs, P))()
    b92 = jax.jit(lambda ct: tlwe.ct_export(ct, P))(ct)
    assert b92.shape == (2, 92)
    assert np.all(np.asarray(b92)[:, 88:] == 0)
    ct2 = jax.jit(lambda b: tlwe.ct_import(key, off, b, P))(b92)
    assert np.array_equal(np.asarray(ct), np.asarray(ct2))


def test_ct_algebra_matches_python(key):
    xs = [int.from_bytes(RNG.bytes(88), "little") for _ in range(6)]
    ys = [int.from_bytes(RNG.bytes(88), "little") for _ in range(6)]
    c = int(RNG.randint(0, P.p, dtype=np.uint64))
    x = jnp.asarray(dg.ints_to_digit_matrix(xs)).reshape(2, 3, 88)
    y = jnp.asarray(dg.ints_to_digit_matrix(ys)).reshape(2, 3, 88)
    add = np.asarray(jax.jit(tlwe.ct_add)(x, y)).reshape(6, 88)
    mul = np.asarray(jax.jit(tlwe.ct_mul_ui)(x, jnp.uint32(c))).reshape(6, 88)
    for i in range(6):
        assert digits_int(add[i]) == (xs[i] + ys[i]) % Q
        assert digits_int(mul[i]) == (xs[i] * c) % Q


def test_smudge_matches_oracle_both_signs(key):
    sk_ints, sk = rand_sk()
    ct = jax.jit(
        lambda: tlwe.encrypt(
            key, 0, sk, jnp.asarray([123], np.uint32), jnp.zeros((1, 88), jnp.uint8), P
        )
    )()
    s_int = int.from_bytes(RNG.bytes(80), "little")
    s_dig = jnp.asarray(dg.int_to_digits(s_int))
    b0 = digits_int(np.asarray(ct)[0, P.n])
    for sign in (True, False):
        out = jax.jit(lambda ct, s: tlwe.smudge(ct, s, jnp.asarray(sign), P))(
            ct[0], s_dig
        )
        want = (b0 + (s_int if sign else -s_int) * P.p) % Q
        assert digits_int(np.asarray(out)[P.n]) == want
        # plaintext preserved (src/test_lwe.c:183-205)
        m = int(np.asarray(jax.jit(lambda o: tlwe.decrypt(o, sk, P))(out)))
        assert m == 123


def _random_compressed(count):
    bs = [int.from_bytes(RNG.bytes(88), "little") for _ in range(count)]
    b92 = np.zeros((count, 92), np.uint8)
    for i, b in enumerate(bs):
        b92[i, :88] = dg.int_to_digits(b)
    return bs, b92


def test_eval_poly_matches_oracle(key):
    d = P.d  # 16
    bs, b92 = _random_compressed(d)
    coeffs = RNG.randint(0, P.p, d, dtype=np.uint64).astype(np.uint32)
    off = P.ctr_as  # unaligned for odd d... ctr_as = ctr_ct*d

    out = jax.jit(
        lambda: tlwe.eval_poly(
            key, off, jnp.asarray(b92), jnp.asarray(coeffs), P, tile=4
        )
    )()
    o = oracle_stream(off)
    want = olwe.eval_poly(
        P, o, [bytes(b92[i].tolist()) for i in range(d)], [int(c) for c in coeffs], d
    )
    got = np.asarray(out)
    for i in range(P.n):
        assert digits_int(got[i]) == want.a[i]
    assert digits_int(got[P.n]) == want.b


def test_eval_poly_multi_matches_single(key):
    d = P.d
    _, b92 = _random_compressed(d)
    coeffs = RNG.randint(0, P.p, (3, d), dtype=np.uint64).astype(np.uint32)
    multi = np.asarray(
        jax.jit(
            lambda: tlwe.eval_poly_multi(
                key, 0, jnp.asarray(b92), jnp.asarray(coeffs), P, tile=8
            )
        )()
    )
    for k in range(3):
        single = np.asarray(
            jax.jit(
                lambda k=k: tlwe.eval_poly(
                    key, 0, jnp.asarray(b92), jnp.asarray(coeffs[k]), P, tile=16
                )
            )()
        )
        assert np.array_equal(multi[k], single)


def test_encrypt_section_tiled_matches_flat(key):
    sk_ints, sk = rand_sk()
    B = 8
    msgs = jnp.asarray(RNG.randint(0, P.p, B, dtype=np.uint64).astype(np.uint32))
    errs = jnp.asarray(
        np.stack([dg.int_to_digits(int.from_bytes(RNG.bytes(69), "little"), 88)
                  for _ in range(B)])
    )
    tiled = np.asarray(
        jax.jit(lambda: tlwe.encrypt_section(key, 0, sk, msgs, errs, P, tile=2))()
    )
    flat = np.asarray(jax.jit(lambda: tlwe.encrypt(key, 0, sk, msgs, errs, P))())
    assert np.array_equal(tiled, flat[:, P.n, :])
