"""Fused keystream->MAC kernel vs the two-stage scan path (bit-exact).

The fused Pallas kernel (ops/eval_fused.py) re-derives the per-block
counters column-major over ciphertext pairs; any error in that index
arithmetic, the even/odd coefficient select, or the recentred-matmul
corrections breaks digit exactness somewhere in [k, n+1, 88].  The scan
path is already conformance-tested against the host oracle
(tests/test_lwe_tpu.py), so equality here closes the chain.

Runs in Pallas interpret mode on CPU with lane_w=128 (d multiple of 256).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_lwe_snarks_tpu.models import lwe as tlwe
from c_lwe_snarks_tpu.ops import eval_fused, sampling
from c_lwe_snarks_tpu.utils import params as params_mod


def _fused(key, off, b_rows, coeffs, P, lane_w=128):
    acc_a = eval_fused.eval_mac_planes(
        key, off, coeffs, P.n, P.ctr_ct, lane_w=lane_w, interpret=True
    )
    k, d = coeffs.shape
    cb = tlwe.u32_to_bytes(coeffs)
    from c_lwe_snarks_tpu.ops import digits as dg

    acc_b = dg.u8_matmul(
        cb.transpose(1, 0, 2).reshape(d, 4 * k).T, b_rows[:, : dg.DIGITS]
    ).reshape(k, 4, dg.DIGITS).transpose(1, 0, 2)
    planes = jnp.concatenate([acc_a, acc_b[:, :, None, :]], axis=2)
    return dg.carry_fold(dg.combine_shift_planes(planes))


@pytest.mark.parametrize("off", [0, 32, 40])  # incl. a half-block (lead=8)
@pytest.mark.parametrize("k", [1, 2])
def test_fused_matches_scan(off, k):
    P = params_mod.custom(d=256, m=8, n=6)
    key = sampling.PRGKey(bytes(range(40)))
    rng = np.random.default_rng(7 + k)
    d = P.d
    b_rows = jnp.asarray(rng.integers(0, 256, size=(d, 88), dtype=np.uint8))
    coeffs = jnp.asarray(rng.integers(0, P.p, size=(k, d), dtype=np.uint32))

    want = jax.jit(
        lambda b, c: tlwe.eval_poly_multi(key, off, b, c, P, impl="scan")
    )(b_rows, coeffs)
    got = _fused(key, off, b_rows, coeffs, P)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_multi_row_chunks():
    """R > 1 row chunks exercise the grid accumulation (r > 0 adds)."""
    P = params_mod.custom(d=512, m=8, n=4)
    key = sampling.PRGKey(bytes(range(1, 41)))
    rng = np.random.default_rng(3)
    b_rows = jnp.asarray(rng.integers(0, 256, size=(P.d, 88), dtype=np.uint8))
    coeffs = jnp.asarray(rng.integers(0, P.p, size=(2, P.d), dtype=np.uint32))

    want = jax.jit(
        lambda b, c: tlwe.eval_poly_multi(key, 0, b, c, P, impl="scan")
    )(b_rows, coeffs)
    got = _fused(key, 0, b_rows, coeffs, P)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# --------------------------------------------------------------------------
# Fused keystream->encrypt kernel (setup loop) vs the scan path.
# --------------------------------------------------------------------------


def _fused_encrypt(key, off, sk, msgs, errs, P, lane_w=128):
    from c_lwe_snarks_tpu.ops import digits as dg
    from c_lwe_snarks_tpu.models.lwe import u32_to_digits

    dot = eval_fused.encrypt_b_fused(
        key, off, sk, msgs.shape[0], P.n, P.ctr_ct,
        lane_w=lane_w, interpret=True,
    )
    pe_planes = errs.astype(jnp.int32)[None] * jnp.asarray(
        [P.p & 0xFF, (P.p >> 8) & 0xFF, (P.p >> 16) & 0xFF, P.p >> 24],
        jnp.int32,
    ).reshape(4, 1, 1)
    pe = dg.combine_shift_planes(pe_planes)
    m = u32_to_digits(msgs).astype(jnp.int32)
    return dg.carry_fold(dot + pe + m)


@pytest.mark.parametrize("count,lead", [(300, 0), (257, 0), (300, 8), (255, 8)])
def test_fused_encrypt_matches_scan(count, lead):
    """Half-block section offsets (lead=8: the CTR_BV phase, src/snark.h:8-12),
    odd counts (dummy pair tail), and multi-row-chunk grids."""
    P = params_mod.custom(d=256, m=8, n=6)
    key = sampling.PRGKey(bytes(range(40)))
    rng = np.random.default_rng(11 + count + lead)
    sk = jnp.asarray(rng.integers(0, 256, size=(P.n, 88), dtype=np.uint8))
    msgs = jnp.asarray(rng.integers(0, P.p, size=count, dtype=np.uint32))
    errs = jnp.asarray(rng.integers(0, 256, size=(count, 88), dtype=np.uint8))
    off = 3 * 16 + lead

    want = jax.jit(
        lambda: tlwe.encrypt_section(key, off, sk, msgs, errs, P, impl="scan")
    )()
    got = _fused_encrypt(key, off, sk, msgs, errs, P)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_prover_onepass_matches_stagewise():
    """The one-kernel prover sweep (models/snark._prover_evals_onepass:
    5 block-sparse coefficient lanes over the contiguous CRS stream,
    delta folded in as a traced coefficient) == the stage-wise path
    (two k=2 evals + ct_import + b_v eval), digit for digit."""
    from c_lwe_snarks_tpu.models import snark as tsnark
    from c_lwe_snarks_tpu.models import ssp as tssp

    P = params_mod.custom(d=16, m=8, n=6)
    crs_key = sampling.PRGKey(bytes(range(40, 80)))
    ent_key = sampling.PRGKey(bytes(range(40)))
    off_setup = tssp.entropy_bytes_random_ssp(P)

    @jax.jit
    def build():
        wits, inst = tssp.random_ssp(ent_key, 0, P)
        crs, _ = tsnark.setup(crs_key, ent_key, off_setup, inst, P)
        return wits, crs

    wits, crs = build()
    rng = np.random.default_rng(31)
    w = jnp.asarray(rng.integers(0, P.p, size=P.d, dtype=np.uint32))
    h = jnp.asarray(rng.integers(0, P.p, size=P.d, dtype=np.uint32))
    v = jnp.asarray(rng.integers(0, P.p, size=P.d, dtype=np.uint32))
    delta = jnp.uint32(123456789)

    got = jax.jit(
        lambda w, h, v: tsnark._prover_evals_onepass(
            crs_key, crs, w, h, v, delta, wits, P, lane_w=8, interpret=True
        )
    )(w, h, v)

    @jax.jit
    def stagewise(w, h, v):
        ev_s = tlwe.eval_poly_multi(
            crs_key, P.ctr_s, crs.b_s, jnp.stack([w, h]), P, impl="scan")
        ev_as = tlwe.eval_poly_multi(
            crs_key, P.ctr_as, crs.b_as, jnp.stack([v, h]), P, impl="scan")
        ct_bt = tlwe.ct_import(crs_key, P.ctr_bt, crs.b_t[None], P)[0]
        bw = tlwe.ct_add(
            tlwe.ct_mul_ui(ct_bt, delta),
            tlwe.eval_poly_multi(
                crs_key, P.ctr_bv, tlwe.pad_digits(crs.b_v),
                wits[: P.m - 1].astype(jnp.uint32)[None], P, impl="scan",
            )[0],
        )
        return ev_s[0], ev_s[1], ev_as[0], ev_as[1], bw

    want = stagewise(w, h, v)
    for name, g, r in zip(("v_w", "h", "hat_v", "hat_h", "b_w"), got, want):
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(r), err_msg=name)
