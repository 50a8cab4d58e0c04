"""Native host runtime vs the pure-python oracle: bit-exactness.

The native library is a host-side accelerator for the oracle; it must be
byte-identical on every surface before the oracle may use it.
"""

import numpy as np
import pytest

from c_lwe_snarks_tpu import native
from c_lwe_snarks_tpu.oracle import aes as oaes
from c_lwe_snarks_tpu.oracle import lwe as olwe
from c_lwe_snarks_tpu.oracle import prg as oprg
from c_lwe_snarks_tpu.utils import params as params_mod

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native hostlib unavailable"
)

KEY = bytes(range(32))
NONCE = 0x0123456789ABCDEF


def test_keystream_matches_pure():
    for off, n in [(0, 16), (5, 100), (16 * 1000 + 3, 5000), (1, 1)]:
        pure = oaes.ctr_keystream(KEY, NONCE, off // 16,
                                  -(-(off % 16 + n) // 16))
        pure = pure.tobytes()[off % 16 : off % 16 + n]
        assert native.keystream(KEY, NONCE, off, n) == pure


def test_eval_poly_matches_oracle():
    P = params_mod.Params(d=16, m=8, n=64)
    seed = bytes(range(40, 80))
    ent = oprg.EntropySource(bytes(range(40)))
    sk = olwe.key_gen(P, ent)
    prg = oprg.AesCtrStream.from_seed(seed)
    rows = []
    for i in range(P.d):
        ct = olwe.encrypt(P, prg, sk, (i * 7 + 1) % P.p, ent)
        rows.append(olwe.ct_export(P, ct))
    coeffs = [(i * 2654435761) % P.p for i in range(P.d)]

    prg2 = oprg.AesCtrStream.from_seed(seed)
    ref = olwe.eval_poly(P, prg2, rows, coeffs, P.d)
    ref_rows = np.zeros((P.n + 1, 88), np.uint8)
    for j, a in enumerate(ref.a):
        ref_rows[j] = np.frombuffer(
            int(a % P.q_eff).to_bytes(88, "little"), np.uint8
        )
    ref_rows[P.n] = np.frombuffer(ref.b.to_bytes(88, "little"), np.uint8)

    nonce = int.from_bytes(seed[:8], "little")
    got = native.eval_poly(
        seed[8:], nonce, 0,
        np.stack([np.frombuffer(r, np.uint8) for r in rows]),
        np.asarray(coeffs, np.uint32), P.n,
    )
    np.testing.assert_array_equal(got, ref_rows)
