"""Release-shape conformance vs the native host oracle.

Micro-shape tests (n=32, d=16 — test_lwe_tpu.py / test_snark_tpu.py)
cannot catch carry/int32-bound bugs that only appear at the release
contraction depth: one eval accumulator position sums d terms of
byte-products (worst case d * 255^2, within 2^31 only because the digit
layer normalizes per tile), and one ciphertext contracts n=1470 secret
digits.  These tests pin the TPU compute path against the native C
oracle (OpenSSL AES + GMP mpn, itself byte-checked vs the pure-python
reference in test_native.py) at the real n=1470 / deep-d shapes the
reference runs (src/lwe.h:14-17, src/test_lwe.c:105-181).

The d=2^15 full-release smoke regenerates ~4.4 GB of keystream on both
sides; it runs only on real hardware (CLS_TEST_PLATFORM=axon) or when
CLS_BIG_TESTS=1 opts in.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c_lwe_snarks_tpu import native
from c_lwe_snarks_tpu.models import lwe as tlwe
from c_lwe_snarks_tpu.ops import sampling
from c_lwe_snarks_tpu.utils import params as params_mod

pytestmark = [
    pytest.mark.skipif(
        not native.available(), reason="native hostlib unavailable"
    ),
    pytest.mark.slow,  # n=1470 shapes on the CPU test backend
]

SEED = bytes(range(17, 57))
NONCE = int.from_bytes(SEED[:8], "little")
AES_KEY = SEED[8:]


def _native_eval(P, section_offset, b88, coeffs):
    """native.eval_poly with the TPU-side [d, 88] rows padded to 92."""
    b92 = np.zeros((b88.shape[0], 92), np.uint8)
    b92[:, :88] = b88
    return native.eval_poly(
        AES_KEY, NONCE, section_offset, b92, coeffs, P.n
    )


# deep even d, one non-pow2; the d=2940 case regenerates ~400 MB of
# keystream per side, which the pure-jnp CPU cipher grinds through for
# the better part of an hour — real hardware (or explicit opt-in) only.
_DEEP_D = [512] + (
    [1470 * 2]
    if os.environ.get("CLS_TEST_PLATFORM", "cpu") != "cpu"
    or os.environ.get("CLS_BIG_TESTS") == "1"
    else []
)


@pytest.mark.parametrize("d", _DEEP_D)
def test_eval_poly_release_n(d):
    """eval_poly at n=1470 (release LWE dimension), deep degree axis."""
    P = params_mod.custom(d=d, m=8)
    key = sampling.PRGKey(SEED)
    rng = np.random.default_rng(d)
    b88 = rng.integers(0, 256, size=(d, 88), dtype=np.uint8)
    coeffs = rng.integers(0, P.p, size=(2, d), dtype=np.uint32)

    got = np.asarray(
        jax.jit(
            lambda b, c: tlwe.eval_poly_multi(key, P.ctr_s, b, c, P)
        )(jnp.asarray(b88), jnp.asarray(coeffs))
    )
    for k in range(2):
        ref = _native_eval(P, P.ctr_s, b88, coeffs[k])
        np.testing.assert_array_equal(got[k], ref, err_msg=f"poly {k}")


def test_eval_poly_worstcase_digits_release_n():
    """All-0xFF rows x max coefficients: the accumulator-bound worst case.

    Every digit product is 255 * 255 and every int32 accumulator position
    reaches its documented maximum — the case micro shapes never stress.
    """
    d = 512
    P = params_mod.custom(d=d, m=8)
    key = sampling.PRGKey(SEED)
    b88 = np.full((d, 88), 0xFF, np.uint8)
    coeffs = np.full((1, d), P.p - 1, np.uint32)
    got = np.asarray(
        jax.jit(
            lambda b, c: tlwe.eval_poly_multi(key, P.ctr_s, b, c, P)
        )(jnp.asarray(b88), jnp.asarray(coeffs))
    )
    ref = _native_eval(P, P.ctr_s, b88, coeffs[0])
    np.testing.assert_array_equal(got[0], ref)


@pytest.mark.skipif(
    os.environ.get("CLS_TEST_PLATFORM", "cpu") == "cpu"
    and os.environ.get("CLS_BIG_TESTS") != "1",
    reason="d=2^15 smoke needs real hardware (or CLS_BIG_TESTS=1)",
)
def test_eval_poly_full_release_smoke():
    """One polynomial at the full release shape d=2^15, n=1470."""
    P = params_mod.release()
    key = sampling.PRGKey(SEED)
    rng = np.random.default_rng(15)
    b88 = rng.integers(0, 256, size=(P.d, 88), dtype=np.uint8)
    coeffs = rng.integers(0, P.p, size=(1, P.d), dtype=np.uint32)
    got = np.asarray(
        jax.jit(
            lambda b, c: tlwe.eval_poly_multi(key, P.ctr_s, b, c, P)
        )(jnp.asarray(b88), jnp.asarray(coeffs))
    )
    ref = _native_eval(P, P.ctr_s, b88, coeffs[0])
    np.testing.assert_array_equal(got[0], ref)


def test_encrypt_section_release_n():
    """A few encryptions at n=1470 vs the keystream-level reconstruction.

    encrypt b = <a, sk> + p*e + m (mod 2^704, src/lwe.c:80-101) with the
    a-rows read straight off the native keystream — checks the TPU
    encrypt path's n=1470 contraction without the slow pure-int oracle.
    """
    count = 4
    P = params_mod.custom(d=16, m=8)  # n = 1470
    key = sampling.PRGKey(SEED)
    rng = np.random.default_rng(7)
    msgs = rng.integers(0, P.p, size=count, dtype=np.uint32)
    errs = rng.integers(0, 256, size=(count, 88), dtype=np.uint8)
    sk88 = rng.integers(0, 256, size=(P.n, 88), dtype=np.uint8)

    got = np.asarray(
        jax.jit(
            lambda s, m, e: tlwe.encrypt_section(key, P.ctr_s, s, m, e, P)
        )(jnp.asarray(sk88), jnp.asarray(msgs), jnp.asarray(errs))
    )

    q_eff = P.q_eff
    sk_ints = [int.from_bytes(sk88[j].tobytes(), "little") for j in range(P.n)]
    for i in range(count):
        ks = native.keystream(
            AES_KEY, NONCE, P.ctr_s + i * P.ctr_ct, P.ctr_ct
        )
        dot = 0
        for j in range(P.n):
            a_j = int.from_bytes(ks[92 * j : 92 * j + 88], "little")
            dot += a_j * sk_ints[j]
        e = int.from_bytes(errs[i].tobytes(), "little")
        b = (dot + P.p * e + int(msgs[i])) % q_eff
        ref = np.frombuffer(b.to_bytes(88, "little"), np.uint8)
        np.testing.assert_array_equal(got[i], ref, err_msg=f"ct {i}")
