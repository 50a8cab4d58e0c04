"""Sharded vs single-device bit-exactness on an 8-device virtual mesh.

The reference has no distributed mode (SURVEY §1); the contract here is
internal: every sharded primitive must equal its single-device TPU
counterpart digit-for-digit (which is itself oracle-conformant, see
test_snark_tpu.py).  Covers ragged shard counts and the full
setup→prove→verify pipeline with mesh sharding enabled.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c_lwe_snarks_tpu.models import lwe as tlwe
from c_lwe_snarks_tpu.models import snark as tsnark
from c_lwe_snarks_tpu.models import ssp as tssp
from c_lwe_snarks_tpu.ops import sampling
from c_lwe_snarks_tpu.parallel import mesh as pmesh
from c_lwe_snarks_tpu.utils import params as params_mod

P = params_mod.Params(d=16, m=8, n=32)
CRS_SEED = bytes(range(40, 80))
ENT_SEED = bytes(range(40))


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"
    return pmesh.make_mesh(8)


@pytest.fixture(scope="module")
def keys():
    return sampling.PRGKey(CRS_SEED), sampling.PRGKey(ENT_SEED)


def test_encrypt_section_sharded_matches(mesh8, keys):
    crs_key, ent_key = keys
    sk = jax.jit(lambda: tlwe.key_gen(ent_key, 0, P))()
    rng = np.random.default_rng(0)
    for count in (16, 7):  # even shards and a ragged tail
        msgs = jnp.asarray(rng.integers(0, P.p, size=count, dtype=np.uint32))
        errs = jnp.asarray(rng.integers(0, 256, size=(count, 88), dtype=np.uint8))
        ref = jax.jit(
            lambda m, e: tlwe.encrypt_section(crs_key, P.ctr_s, sk, m, e, P)
        )(msgs, errs)
        shd = jax.jit(
            lambda m, e: pmesh.encrypt_section_sharded(
                crs_key, P.ctr_s, sk, m, e, P, mesh8
            )
        )(msgs, errs)
        np.testing.assert_array_equal(np.asarray(shd), np.asarray(ref))


def test_eval_poly_multi_sharded_matches(mesh8, keys):
    crs_key, ent_key = keys
    sk = jax.jit(lambda: tlwe.key_gen(ent_key, 0, P))()
    rng = np.random.default_rng(1)
    msgs = jnp.asarray(rng.integers(0, P.p, size=P.d, dtype=np.uint32))
    errs = jnp.asarray(rng.integers(0, 256, size=(P.d, 88), dtype=np.uint8))
    b_rows = jax.jit(
        lambda m, e: tlwe.encrypt_section(crs_key, P.ctr_s, sk, m, e, P)
    )(msgs, errs)
    coeffs = jnp.asarray(rng.integers(0, P.p, size=(2, P.d), dtype=np.uint32))
    ref = jax.jit(
        lambda b, c: tlwe.eval_poly_multi(crs_key, P.ctr_s, b, c, P)
    )(b_rows, coeffs)
    shd = jax.jit(
        lambda b, c: pmesh.eval_poly_multi_sharded(
            crs_key, P.ctr_s, b, c, P, mesh8
        )
    )(b_rows, coeffs)
    np.testing.assert_array_equal(np.asarray(shd), np.asarray(ref))


def test_encrypt_section_sharded_odd_n(mesh8, keys):
    """Odd n: CTR_CT = 92n not ≡ 0 mod 8, so per-shard stream skips only
    stay equal to the section lead when chunks are multiples of 4 — a
    merely-even chunk silently read odd shards 8 bytes off (round-3
    advisor finding, confirmed regression)."""
    crs_key, ent_key = keys
    for n in (3, 5):
        Pn = params_mod.Params(d=16, m=8, n=n)
        sk = jax.jit(lambda: tlwe.key_gen(ent_key, 0, Pn))()
        rng = np.random.default_rng(7 + n)
        for count in (16, 7):
            msgs = jnp.asarray(rng.integers(0, Pn.p, size=count, dtype=np.uint32))
            errs = jnp.asarray(
                rng.integers(0, 256, size=(count, 88), dtype=np.uint8))
            ref = jax.jit(
                lambda m, e: tlwe.encrypt_section(crs_key, Pn.ctr_s, sk, m, e, Pn)
            )(msgs, errs)
            shd = jax.jit(
                lambda m, e: pmesh.encrypt_section_sharded(
                    crs_key, Pn.ctr_s, sk, m, e, Pn, mesh8
                )
            )(msgs, errs)
            np.testing.assert_array_equal(
                np.asarray(shd), np.asarray(ref), err_msg=f"n={n} count={count}")


def test_eval_poly_multi_sharded_odd_n(mesh8, keys):
    crs_key, ent_key = keys
    Pn = params_mod.Params(d=16, m=8, n=3)
    sk = jax.jit(lambda: tlwe.key_gen(ent_key, 0, Pn))()
    rng = np.random.default_rng(11)
    msgs = jnp.asarray(rng.integers(0, Pn.p, size=Pn.d, dtype=np.uint32))
    errs = jnp.asarray(rng.integers(0, 256, size=(Pn.d, 88), dtype=np.uint8))
    b_rows = jax.jit(
        lambda m, e: tlwe.encrypt_section(crs_key, Pn.ctr_s, sk, m, e, Pn)
    )(msgs, errs)
    coeffs = jnp.asarray(rng.integers(0, Pn.p, size=(2, Pn.d), dtype=np.uint32))
    ref = jax.jit(
        lambda b, c: tlwe.eval_poly_multi(crs_key, Pn.ctr_s, b, c, Pn)
    )(b_rows, coeffs)
    shd = jax.jit(
        lambda b, c: pmesh.eval_poly_multi_sharded(
            crs_key, Pn.ctr_s, b, c, Pn, mesh8
        )
    )(b_rows, coeffs)
    np.testing.assert_array_equal(np.asarray(shd), np.asarray(ref))


def test_sharded_fused_paths_interpret(mesh8, keys):
    """The use_fused branches of eval_poly_multi_sharded and
    encrypt_section_sharded (chunk rounding to the kernel grid +
    traced-offset plumbing into the fused Pallas kernels under
    shard_map), forced via impl="fused" in interpret mode — on TPU the
    same branches run compiled; off-TPU nothing else covers them."""
    crs_key, ent_key = keys
    Pn = params_mod.custom(d=256, m=8, n=6)
    sk = jax.jit(lambda: tlwe.key_gen(ent_key, 0, Pn))()
    rng = np.random.default_rng(23)
    # lead 0 and the half-block lead 8 (the CTR_BV phase)
    for off in (0, 40):
        msgs = jnp.asarray(rng.integers(0, Pn.p, size=Pn.d, dtype=np.uint32))
        errs = jnp.asarray(rng.integers(0, 256, size=(Pn.d, 88), dtype=np.uint8))
        b_rows = jax.jit(
            lambda m, e: tlwe.encrypt_section(crs_key, off, sk, m, e, Pn,
                                              impl="scan")
        )(msgs, errs)
        coeffs = jnp.asarray(
            rng.integers(0, Pn.p, size=(2, Pn.d), dtype=np.uint32))
        ref = jax.jit(
            lambda b, c: tlwe.eval_poly_multi(crs_key, off, b, c, Pn,
                                              impl="scan")
        )(b_rows, coeffs)
        shd = jax.jit(
            lambda b, c: pmesh.eval_poly_multi_sharded(
                crs_key, off, b, c, Pn, mesh8,
                impl="fused", lane_w=16, interpret=True, check_vma=False,
            )
        )(b_rows, coeffs)
        np.testing.assert_array_equal(
            np.asarray(shd), np.asarray(ref), err_msg=f"eval off={off}")

        shd_b = jax.jit(
            lambda m, e: pmesh.encrypt_section_sharded(
                crs_key, off, sk, m, e, Pn, mesh8,
                impl="fused", lane_w=16, interpret=True, check_vma=False,
            )
        )(msgs, errs)
        np.testing.assert_array_equal(
            np.asarray(shd_b), np.asarray(b_rows), err_msg=f"enc off={off}")


def test_random_ssp_sharded_matches(mesh8, keys):
    _, ent_key = keys
    # even split (m=8), a non-multiple-of-8 witness width (m=13: the top
    # m % 8 bits are zero by the urandomb floor-byte rule), and ragged
    # rows-per-shard (m=24 -> chunk 3, and the b-side consumers see
    # m-1=23); d stays even for block alignment.
    for m in (8, 13, 24):
        Pm = params_mod.Params(d=16, m=m, n=32)
        wits_r, inst_r = jax.jit(lambda: tssp.random_ssp(ent_key, 0, Pm))()
        wits_s, inst_s = jax.jit(
            lambda: pmesh.random_ssp_sharded(ent_key, 0, Pm, mesh8)
        )()
        np.testing.assert_array_equal(np.asarray(wits_s), np.asarray(wits_r))
        np.testing.assert_array_equal(np.asarray(inst_s.t), np.asarray(inst_r.t))
        np.testing.assert_array_equal(np.asarray(inst_s.v), np.asarray(inst_r.v))


def test_v_at_s_sharded_matches(mesh8):
    from c_lwe_snarks_tpu.ops import modp

    rng = np.random.default_rng(2)
    for m in (8, 13):  # even and ragged row counts
        v = jnp.asarray(rng.integers(0, P.p, size=(m, P.d), dtype=np.uint32))
        s = jnp.uint32(0x12345678)
        powers = modp.powers_mod_p(s, P.d)
        ref = jax.jit(
            lambda v, pw: modp.sum_mod_p(modp.mulmod_p(v, pw[None, :]), axis=-1)
        )(v, powers)
        shd = jax.jit(lambda v, pw: pmesh.v_at_s_sharded(v, pw, mesh8))(v, powers)
        np.testing.assert_array_equal(np.asarray(shd), np.asarray(ref))


@pytest.mark.slow  # two full-pipeline compiles (~4 min); the fast gate
# keeps the per-section sharded bit-exactness tests + the driver dryrun
def test_full_pipeline_sharded_matches(mesh8, keys):
    crs_key, ent_key = keys
    off_setup = tssp.entropy_bytes_random_ssp(P)
    off_prove = off_setup + tsnark.setup_entropy_bytes(P)

    def run(mesh):
        if mesh is None:
            wits, inst = tssp.random_ssp(ent_key, 0, P)
        else:
            wits, inst = pmesh.random_ssp_sharded(ent_key, 0, P, mesh)
        crs, vrs = tsnark.setup(crs_key, ent_key, off_setup, inst, P, mesh=mesh)
        pi = tsnark.prover(
            crs_key, ent_key, off_prove, crs, inst, wits, P, mesh=mesh
        )
        ok = tsnark.verifier(vrs, inst, pi, P)
        return crs, pi, ok

    crs_r, pi_r, ok_r = jax.jit(lambda: run(None))()
    crs_s, pi_s, ok_s = jax.jit(lambda: run(mesh8))()
    assert bool(ok_r) and bool(ok_s)
    for name in ("b_s", "b_as", "b_t", "b_v"):
        np.testing.assert_array_equal(
            np.asarray(getattr(crs_s, name)), np.asarray(getattr(crs_r, name)),
            err_msg=name,
        )
    np.testing.assert_array_equal(
        np.asarray(pi_s.stack()), np.asarray(pi_r.stack())
    )
