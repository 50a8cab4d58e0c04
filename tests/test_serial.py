"""Persistence formats: roundtrips + reload-and-verify.

The CRS byte format is the reference's compressed form (seed + 92-byte
b-rows, src/lwe.c:115-126, src/snark.h:31-37); the SSP buffer is the
reference's flat layout (src/ssp.h:6-9).  The strongest check: a proof
verifies against a CRS/VRS that went through bytes and back.
"""

import numpy as np
import pytest

import jax

from c_lwe_snarks_tpu.models import snark as tsnark
from c_lwe_snarks_tpu.models import ssp as tssp
from c_lwe_snarks_tpu.ops import sampling
from c_lwe_snarks_tpu.utils import obs, serial
from c_lwe_snarks_tpu.utils import params as params_mod

# n=64: the byte formats are n-agnostic (arrays scale, logic doesn't),
# and release-n byte-exactness is pinned by test_release_shapes + the
# debug-macro conformance; the default n=1470 made this module ~320 s of
# XLA-CPU compile+execute in the fast gate for no added coverage.
P = params_mod.custom(d=32, m=16, n=64)
CRS_SEED = bytes(range(40, 80))
ENT_SEED = bytes(range(40))


@pytest.fixture(scope="module")
def protocol_run():
    crs_key = sampling.PRGKey(CRS_SEED)
    ent_key = sampling.PRGKey(ENT_SEED)
    off_setup = tssp.entropy_bytes_random_ssp(P)
    off_prove = off_setup + tsnark.setup_entropy_bytes(P)

    @jax.jit
    def run():
        wits, inst = tssp.random_ssp(ent_key, 0, P)
        crs, vrs = tsnark.setup(crs_key, ent_key, off_setup, inst, P)
        pi = tsnark.prover(crs_key, ent_key, off_prove, crs, inst, wits, P)
        return wits, inst, crs, vrs, pi

    return run()


def test_crs_roundtrip(protocol_run):
    _, _, crs, _, _ = protocol_run
    blob = serial.crs_to_bytes(crs, P)
    assert len(blob) == 40 + 92 * (2 * P.d + 1 + (P.m - 1))
    crs2 = serial.crs_from_bytes(blob, P)
    assert crs2.seed == crs.seed
    for name in ("b_s", "b_as", "b_t", "b_v"):
        np.testing.assert_array_equal(
            np.asarray(getattr(crs2, name)), np.asarray(getattr(crs, name))
        )


def test_ssp_buffer_roundtrip(protocol_run):
    _, inst, _, _, _ = protocol_run
    buf = serial.ssp_to_buffer(inst, P)
    assert len(buf) == 8 * P.d * (P.m + 1)  # src/ssp.h:6-9 live layout
    inst2 = serial.ssp_from_buffer(buf, P)
    np.testing.assert_array_equal(np.asarray(inst2.t), np.asarray(inst.t))
    np.testing.assert_array_equal(np.asarray(inst2.v), np.asarray(inst.v))


def test_reloaded_artifacts_verify(protocol_run, tmp_path):
    wits, inst, crs, vrs, pi = protocol_run
    for name, blob in [
        ("crs", serial.crs_to_bytes(crs, P)),
        ("vrs", serial.vrs_to_bytes(vrs, P)),
        ("proof", serial.proof_to_bytes(pi, P)),
        ("ssp", serial.ssp_to_buffer(inst, P)),
    ]:
        serial.save(str(tmp_path / f"{name}.bin"), blob)
    vrs2 = serial.vrs_from_bytes(serial.load(str(tmp_path / "vrs.bin")), P)
    pi2 = serial.proof_from_bytes(serial.load(str(tmp_path / "proof.bin")), P)
    inst2 = serial.ssp_from_buffer(serial.load(str(tmp_path / "ssp.bin")), P)
    ok = jax.jit(lambda v, i, p: tsnark.verifier(v, i, p, P))(vrs2, inst2, pi2)
    assert bool(ok)
    # tampered reload must reject
    bad = bytearray(serial.proof_to_bytes(pi, P))
    bad[0] ^= 1
    pi_bad = serial.proof_from_bytes(bytes(bad), P)
    assert not bool(
        jax.jit(lambda v, i, p: tsnark.verifier(v, i, p, P))(vrs2, inst2, pi_bad)
    )


def test_decrypt_probes(protocol_run):
    _, inst, crs, vrs, pi = protocol_run
    checks = obs.probe_crs(crs, vrs, P)
    assert all(bool(v) for v in checks.values()), checks
    pchecks = obs.probe_proof(pi, vrs, P)
    assert bool(pchecks["pke_h"])


def test_decrypt_probe_range(protocol_run):
    """Batched range probe: one import/decrypt batch covers the section."""
    _, _, crs, vrs, _ = protocol_run
    checks = jax.jit(
        lambda c, v: obs.probe_crs_range(c, v, P, lo=0, count=P.d)
    )(crs, vrs)
    assert all(bool(v) for v in checks.values()), checks
    # probing an interior window keeps the chain/correlation invariants
    inner = obs.probe_crs_range(crs, vrs, P, lo=3, count=P.d - 3)
    assert all(bool(v) for v in inner.values()), inner


def test_ssp_stream_matches_blob(protocol_run, tmp_path):
    """ssp_write_stream/ssp_read_stream == the whole-blob formats."""
    _, inst, _, _, _ = protocol_run
    path = str(tmp_path / "ssp.bin")
    serial.ssp_write_stream(path, inst, P, rows_per_chunk=5)  # ragged chunks
    assert serial.load(path) == serial.ssp_to_buffer(inst, P)
    inst2 = serial.ssp_read_stream(path, P, rows_per_chunk=3)
    np.testing.assert_array_equal(np.asarray(inst2.t), np.asarray(inst.t))
    np.testing.assert_array_equal(np.asarray(inst2.v), np.asarray(inst.v))


def test_crs_stream_matches_blob(protocol_run, tmp_path):
    """crs_write_stream == crs_to_bytes; row table slices correctly."""
    _, _, crs, _, _ = protocol_run
    path = str(tmp_path / "crs.bin")
    serial.crs_write_stream(path, crs, P, rows_per_chunk=7)
    blob = serial.crs_to_bytes(crs, P)
    assert serial.load(path) == blob

    seed, table = serial.crs_row_table(path, P)
    assert seed == bytes(crs.seed)
    assert table.shape == (P.crs_num_cts, P.ct_bytes)
    np.testing.assert_array_equal(
        np.asarray(table[: P.d, :88]), np.asarray(crs.b_s)
    )
    np.testing.assert_array_equal(
        np.asarray(table[2 * P.d, :88]), np.asarray(crs.b_t)
    )
    np.testing.assert_array_equal(
        np.asarray(table[2 * P.d + 1 :, :88]), np.asarray(crs.b_v)
    )

    # single-process local slice covers the whole table from row 0
    seed2, lo, rows = serial.crs_local_slice(path, P)
    assert seed2 == seed and lo == 0
    assert rows.shape == (P.crs_num_cts, 88)
