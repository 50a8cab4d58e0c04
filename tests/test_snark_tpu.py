"""End-to-end conformance: TPU protocol vs host oracle, bit-exact.

Replays the oracle's exact entropy stream layout on device and checks
every intermediate artifact (SSP coeffs, trapdoor scalars, CRS b-rows,
all 5 proof ciphertexts digit-for-digit), then verification + rejection.
Mirrors src/test_snark.c's white-box strategy (SURVEY §4) with stronger
replay guarantees (the reference can't replay its getrandom draws).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c_lwe_snarks_tpu.models import lwe as tlwe
from c_lwe_snarks_tpu.models import snark as tsnark
from c_lwe_snarks_tpu.models import ssp as tssp
from c_lwe_snarks_tpu.ops import digits as dg
from c_lwe_snarks_tpu.ops import sampling
from c_lwe_snarks_tpu.oracle import snark as osnark
from c_lwe_snarks_tpu.oracle import ssp as ossp
from c_lwe_snarks_tpu.oracle.prg import EntropySource
from c_lwe_snarks_tpu.utils import params as params_mod

P = params_mod.Params(d=16, m=8, n=32)
CRS_SEED = bytes(range(40, 80))
ENT_SEED = bytes(range(40))


@pytest.fixture(scope="module")
def oracle_run():
    ent = EntropySource(ENT_SEED)
    wit, inst = ossp.random_ssp(P, ent)
    crs, vrs = osnark.setup(P, inst, ent, seed=CRS_SEED)
    pi = osnark.prover(P, crs, inst, wit, ent)
    assert osnark.verifier(P, inst, vrs, pi)
    return wit, inst, crs, vrs, pi


@pytest.fixture(scope="module")
def tpu_run():
    crs_key = sampling.PRGKey(CRS_SEED)
    ent_key = sampling.PRGKey(ENT_SEED)
    off_ssp = 0
    off_setup = tssp.entropy_bytes_random_ssp(P)
    off_prove = off_setup + tsnark.setup_entropy_bytes(P)

    @jax.jit
    def run():
        wits, inst = tssp.random_ssp(ent_key, off_ssp, P)
        crs, vrs = tsnark.setup(crs_key, ent_key, off_setup, inst, P)
        pi = tsnark.prover(crs_key, ent_key, off_prove, crs, inst, wits, P)
        ok = tsnark.verifier(vrs, inst, pi, P)
        return wits, inst, crs, vrs, pi, ok

    return run()


def test_ssp_matches_oracle(oracle_run, tpu_run):
    owit, oinst, *_ = oracle_run
    wits, inst, *_ = tpu_run
    wbits = [(owit >> i) & 1 for i in range(P.m)]
    assert [int(b) for b in np.asarray(wits)] == wbits
    t = np.asarray(inst.t)
    ot = oinst.t + [0] * (P.d - len(oinst.t))
    assert [int(x) for x in t] == ot
    v = np.asarray(inst.v)
    for i in range(P.m):
        ovi = oinst.v[i] + [0] * (P.d - len(oinst.v[i]))
        assert [int(x) for x in v[i]] == ovi


def test_vrs_matches_oracle(oracle_run, tpu_run):
    _, _, _, ovrs, _ = oracle_run
    _, _, _, vrs, _, _ = tpu_run
    assert int(vrs.alpha) == ovrs.alpha
    assert int(vrs.beta) == ovrs.beta
    assert int(vrs.s) == ovrs.s
    sk = np.asarray(vrs.sk)
    for i in range(P.n):
        assert dg.digits_to_int(sk[i]) == ovrs.sk[i] % (1 << 704)


def test_crs_matches_oracle(oracle_run, tpu_run):
    _, _, ocrs, _, _ = oracle_run
    _, _, crs, _, _, _ = tpu_run
    for name, rows, want in (
        ("s", crs.b_s, ocrs.s),
        ("as", crs.b_as, ocrs.as_),
        ("v", crs.b_v, ocrs.v),
    ):
        rows = np.asarray(rows)
        for i, wbytes in enumerate(want):
            assert dg.digits_to_int(rows[i]) == int.from_bytes(wbytes, "little"), (
                name, i)
    assert dg.digits_to_int(np.asarray(crs.b_t)) == int.from_bytes(ocrs.t, "little")


def test_proof_matches_oracle(oracle_run, tpu_run):
    *_, opi = oracle_run
    _, _, _, _, pi, _ = tpu_run
    pairs = [
        ("h", pi.h, opi.h), ("hat_h", pi.hat_h, opi.hat_h),
        ("hat_v", pi.hat_v, opi.hat_v), ("v_w", pi.v_w, opi.v_w),
        ("b_w", pi.b_w, opi.b_w),
    ]
    for name, ct, oct_ in pairs:
        ct = np.asarray(ct)
        for i in range(P.n):
            assert dg.digits_to_int(ct[i]) == oct_.a[i] % (1 << 704), (name, i)
        assert dg.digits_to_int(ct[P.n]) == oct_.b % (1 << 704), name


def test_verifier_accepts(tpu_run):
    *_, ok = tpu_run
    assert bool(ok)


def test_verifier_rejects_tampered_proof(tpu_run):
    wits, inst, crs, vrs, pi, _ = tpu_run
    bad_b = pi.h.at[P.n, 0].set(pi.h[P.n, 0] ^ 1)
    bad = tsnark.ProofDev(h=bad_b, hat_h=pi.hat_h, hat_v=pi.hat_v,
                          v_w=pi.v_w, b_w=pi.b_w)
    assert not bool(jax.jit(tsnark.verifier, static_argnums=3)(vrs, inst, bad, P))


def test_random_ssp_ragged_m_matches_oracle():
    """m % 8 != 0: the top m % 8 witness bits are ZERO (urandomb draws
    floor(m/8) bytes, src/entropy.c:11-26).  Round-3 judge repro: the
    clamped gather duplicated the last byte's bits at exactly the
    release m=21845; every prior conformance test used m % 8 == 0."""
    Pm = params_mod.Params(d=16, m=13, n=32)
    ent = EntropySource(ENT_SEED)
    owit, oinst = ossp.random_ssp(Pm, ent)
    ent_key = sampling.PRGKey(ENT_SEED)
    wits, inst = jax.jit(lambda: tssp.random_ssp(ent_key, 0, Pm))()
    assert [int(b) for b in np.asarray(wits)] == [
        (owit >> i) & 1 for i in range(Pm.m)
    ]
    assert int(np.asarray(wits)[-1]) == 0  # bit 12 lies past the 1-byte draw
    ot = oinst.t + [0] * (Pm.d - len(oinst.t))
    assert [int(x) for x in np.asarray(inst.t)] == ot
    for i in range(Pm.m):
        ovi = oinst.v[i] + [0] * (Pm.d - len(oinst.v[i]))
        assert [int(x) for x in np.asarray(inst.v)[i]] == ovi


def test_protocol_ragged_m_matches_oracle():
    """Full setup→prove→verify oracle-vs-TPU at m % 8 != 0: the zeroed
    tail witness bits propagate into t, w, b_w and the proof."""
    Pm = params_mod.Params(d=16, m=13, n=32)
    ent = EntropySource(ENT_SEED)
    owit, oinst = ossp.random_ssp(Pm, ent)
    ocrs, ovrs = osnark.setup(Pm, oinst, ent, seed=CRS_SEED)
    opi = osnark.prover(Pm, ocrs, oinst, owit, ent)
    assert osnark.verifier(Pm, oinst, ovrs, opi)

    crs_key = sampling.PRGKey(CRS_SEED)
    ent_key = sampling.PRGKey(ENT_SEED)
    off_setup = tssp.entropy_bytes_random_ssp(Pm)
    off_prove = off_setup + tsnark.setup_entropy_bytes(Pm)

    @jax.jit
    def run():
        wits, inst = tssp.random_ssp(ent_key, 0, Pm)
        crs, vrs = tsnark.setup(crs_key, ent_key, off_setup, inst, Pm)
        pi = tsnark.prover(crs_key, ent_key, off_prove, crs, inst, wits, Pm)
        return pi, tsnark.verifier(vrs, inst, pi, Pm)

    pi, ok = run()
    assert bool(ok)
    for name, oct_ in (("h", opi.h), ("hat_h", opi.hat_h),
                       ("hat_v", opi.hat_v), ("v_w", opi.v_w),
                       ("b_w", opi.b_w)):
        ct = np.asarray(getattr(pi, name))
        for i in range(Pm.n):
            assert dg.digits_to_int(ct[i]) == oct_.a[i] % (1 << 704), (name, i)
        assert dg.digits_to_int(ct[Pm.n]) == oct_.b % (1 << 704), name


def test_witness_bits_release_m():
    """Release m=21845 head/tail: witness_bits == the oracle's urandomb
    bit-for-bit, including the zeroed bits 21840-21844."""
    m = 21845
    ent = EntropySource(ENT_SEED)
    owit = ent.urandomb(m)
    ent_key = sampling.PRGKey(ENT_SEED)
    wb = m // 8
    wits = np.asarray(jax.jit(
        lambda: tssp.witness_bits(sampling.keystream_bytes(ent_key, 0, wb), m)
    )())
    obits = np.array([(owit >> i) & 1 for i in range(m)], np.uint8)
    np.testing.assert_array_equal(wits, obits)
    assert not wits[21840:].any()


def test_verifier_rejects_wrong_witness():
    crs_key = sampling.PRGKey(CRS_SEED)
    ent_key = sampling.PRGKey(ENT_SEED)
    off_setup = tssp.entropy_bytes_random_ssp(P)
    off_prove = off_setup + tsnark.setup_entropy_bytes(P)

    @jax.jit
    def run():
        wits, inst = tssp.random_ssp(ent_key, 0, P)
        crs, vrs = tsnark.setup(crs_key, ent_key, off_setup, inst, P)
        bad_wits = wits.at[0].set(1 - wits[0])
        pi = tsnark.prover(crs_key, ent_key, off_prove, crs, inst, bad_wits, P)
        return tsnark.verifier(vrs, inst, pi, P)

    assert not bool(run())


def test_test_error_limb_semantics_match_oracle():
    """Device threshold-count SIZ == oracle bit-length SIZ on boundaries.

    The reference compares GMP's signed limb count SIZ(ceil(-dot/p))
    against GAMMA_LOG_SMUDGING/8 = 80 (src/snark.c:237-241); the device
    derives it from 11 threshold comparisons (models/snark.py) and the
    oracle from the quotient's bit length (oracle/snark.py).  Pin the two
    formulations to each other exactly at every limb boundary.
    """
    p = P.p
    cases = [0, 1, p - 1, p, p + 1, (1 << 704) - 1]
    for j in range(11):
        t = p << (64 * j)
        cases += [t - 1, t, t + 1]
    cases = sorted({c for c in cases if c < (1 << 704)})

    thr = jnp.asarray(np.asarray(tsnark._test_error_thresholds(), np.uint8))
    rows = jnp.asarray(dg.ints_to_digit_matrix(cases))

    @jax.jit
    def device_siz(rows):
        ge = dg.digits_ge(rows[:, None, :], thr[None, :, :])
        return -jnp.sum(ge.astype(jnp.int32), axis=1)

    siz_dev = np.asarray(device_siz(rows))
    for i, dot in enumerate(cases):
        siz_orc = osnark.test_error_siz(dot, P)
        assert siz_dev[i] == siz_orc, (hex(dot), siz_dev[i], siz_orc)
        # both must agree with the reference's accept predicate
        assert (siz_orc < P.log_smudging // 8) == (
            siz_dev[i] < P.log_smudging // 8
        )
