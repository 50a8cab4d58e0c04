"""Full-protocol conformance at the reference's debug macro set.

The reference's ``make check`` validates the whole protocol at D=2^8,
M=2^6, N=1470 (src/lwe.h:18-23, src/test_snark.c:34-107).  This test
runs random_ssp -> setup -> prover -> verifier oracle-vs-TPU at exactly
that shape and checks the CRS rows and all five proof ciphertexts
digit-exactly.  Opt-in (CLS_BIG_TESTS=1): the device path at n=1470 is
minutes on the CPU test backend (seconds on a real chip; the same flow
is exercised at n=32 by test_snark_tpu.py every run).
"""

import os

import numpy as np
import pytest

import jax

from c_lwe_snarks_tpu.models import snark as tsnark
from c_lwe_snarks_tpu.models import ssp as tssp
from c_lwe_snarks_tpu.ops import digits as dg
from c_lwe_snarks_tpu.ops import sampling
from c_lwe_snarks_tpu.oracle import snark as osnark
from c_lwe_snarks_tpu.oracle import ssp as ossp
from c_lwe_snarks_tpu.oracle.prg import EntropySource
from c_lwe_snarks_tpu.utils import params as params_mod

pytestmark = [
    pytest.mark.skipif(
        not os.environ.get("CLS_BIG_TESTS"),
        reason="debug-macro-set conformance is minutes on the CPU backend; "
        "set CLS_BIG_TESTS=1 (runs in seconds on a real TPU)",
    ),
    pytest.mark.slow,
]

CRS_SEED = bytes(range(40, 80))
ENT_SEED = bytes(range(40))


def test_full_protocol_debug_macro_set():
    P = params_mod.toy()  # the debug macro set: d=256, m=64, n=1470
    assert (P.d, P.m, P.n) == (256, 64, 1470)

    ent = EntropySource(ENT_SEED)
    owit, oinst = ossp.random_ssp(P, ent)
    ocrs, ovrs = osnark.setup(P, oinst, ent, seed=CRS_SEED)
    opi = osnark.prover(P, ocrs, oinst, owit, ent)
    assert osnark.verifier(P, oinst, ovrs, opi)

    crs_key = sampling.PRGKey(CRS_SEED)
    ent_key = sampling.PRGKey(ENT_SEED)
    off_setup = tssp.entropy_bytes_random_ssp(P)
    off_prove = off_setup + tsnark.setup_entropy_bytes(P)

    @jax.jit
    def run():
        wits, inst = tssp.random_ssp(ent_key, 0, P)
        crs, vrs = tsnark.setup(crs_key, ent_key, off_setup, inst, P)
        pi = tsnark.prover(crs_key, ent_key, off_prove, crs, inst, wits, P)
        return wits, crs, pi, tsnark.verifier(vrs, inst, pi, P)

    wits, crs, pi, ok = jax.block_until_ready(run())
    assert bool(ok)

    assert [int(b) for b in np.asarray(wits)] == [
        (owit >> i) & 1 for i in range(P.m)
    ]
    for name, rows, want in (
        ("s", crs.b_s, ocrs.s),
        ("as", crs.b_as, ocrs.as_),
        ("v", crs.b_v, ocrs.v),
    ):
        rows = np.asarray(rows)
        for i, wbytes in enumerate(want):
            assert dg.digits_to_int(rows[i]) == int.from_bytes(
                wbytes, "little"
            ), (name, i)
    assert dg.digits_to_int(np.asarray(crs.b_t)) == int.from_bytes(
        ocrs.t, "little"
    )
    for name, oct_ in (
        ("h", opi.h), ("hat_h", opi.hat_h), ("hat_v", opi.hat_v),
        ("v_w", opi.v_w), ("b_w", opi.b_w),
    ):
        ct = np.asarray(getattr(pi, name))
        for i in range(P.n):
            assert dg.digits_to_int(ct[i]) == oct_.a[i] % (1 << 704), (name, i)
        assert dg.digits_to_int(ct[P.n]) == oct_.b % (1 << 704), name
