"""Real multi-process DCN execution (greenfield; SURVEY §5 backend bullet).

Spawns N jax.distributed CPU processes (localhost coordinator, 2 virtual
devices each, N in {2, 4}) running the full sharded pipeline over the
2N-device global mesh, and asserts bit-equality of the CRS rows and the
proof against a single-process run — the only pre-pod way to catch
DCN-layer bugs such as initializing the backend before
jax.distributed.initialize.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from c_lwe_snarks_tpu.models import snark as tsnark
from c_lwe_snarks_tpu.models import ssp as tssp
from c_lwe_snarks_tpu.ops import sampling
from c_lwe_snarks_tpu.utils import params as params_mod
from c_lwe_snarks_tpu.utils import serial

pytestmark = pytest.mark.slow  # spawns a 2-process jax.distributed launch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("nproc", [2, 4])
def test_multi_process_pipeline_matches_single_process(tmp_path, nproc):
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        # scrub harness/test platform overrides; the worker sets its own
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "CLS_TEST_PLATFORM")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nproc), str(port), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for i in range(nproc)
    ]
    outs = []
    try:
        for pr in procs:
            out, _ = pr.communicate(timeout=780)
            outs.append(out.decode(errors="replace"))
    finally:
        for pr in procs:  # kill exact PIDs, never by pattern
            if pr.poll() is None:
                pr.kill()
    for i, pr in enumerate(procs):
        assert pr.returncode == 0, f"worker {i} failed:\n{outs[i]}"

    # single-process reference at identical seeds/params (host 8-dev CPU)
    P = params_mod.custom(d=16, m=8)
    crs_key = sampling.PRGKey(bytes(range(40, 80)))
    ent_key = sampling.PRGKey(bytes(range(40)))
    off_setup = tssp.entropy_bytes_random_ssp(P)
    off_prove = off_setup + tsnark.setup_entropy_bytes(P)

    @jax.jit
    def run():
        wits, inst = tssp.random_ssp(ent_key, 0, P)
        crs, vrs = tsnark.setup(crs_key, ent_key, off_setup, inst, P)
        pi = tsnark.prover(crs_key, ent_key, off_prove, crs, inst, wits, P)
        return crs, pi, tsnark.verifier(vrs, inst, pi, P)

    crs, pi, ok = run()
    assert bool(ok)

    with open(tmp_path / "verified.txt") as f:
        assert f.read() == "True"

    # write half: the CRS file stitched from per-host section slices must
    # equal the single-process serialization byte for byte
    with open(tmp_path / "crs.bin", "rb") as f:
        assert f.read() == serial.crs_to_bytes(crs, P)

    # read half: the per-host crs_local_slice reads tile the row table
    table = np.frombuffer(
        serial.crs_to_bytes(crs, P)[40:], dtype=np.uint8
    ).reshape(P.crs_num_cts, P.ct_bytes)[:, :88]
    slices = [
        np.load(tmp_path / f"crs_local_slice_{i}.npy") for i in range(nproc)
    ]
    np.testing.assert_array_equal(np.concatenate(slices), table)

    with open(tmp_path / "proof.bin", "rb") as f:
        assert f.read() == serial.proof_to_bytes(pi, P)
