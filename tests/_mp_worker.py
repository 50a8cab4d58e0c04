"""Multi-process DCN worker: one controller of an N-process CPU launch.

Run by tests/test_multiprocess.py as ``python tests/_mp_worker.py
<process_id> <num_processes> <coordinator_port> <outdir>``.  Each process
owns 2 virtual CPU devices; the script initializes jax.distributed FIRST
(before any backend-touching call — the bug class this test exists to
catch), builds the global mesh, runs the full sharded pipeline
(random_ssp -> setup -> prover -> verifier) and writes:

* ``b_s_slice_<pid>.npy`` — this host's contiguous rows of the CRS b_s
  section, read from its addressable shards (exercises the
  local_shard_bounds IO contract);
* ``proof.bin`` + ``verified.txt`` (process 0 only; the proof is
  replicated, so any process could write it).

The parent compares everything against a single-process run.
"""

import os
import sys


def main() -> None:
    proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]

    # The dev environment pre-imports jax (sitecustomize) with a tunneled
    # TPU platform, so env vars are latched already — force the virtual
    # CPU platform through jax.config BEFORE the backend initializes.
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from c_lwe_snarks_tpu.parallel import multihost

    # The load-bearing call: must succeed before any jax device API.
    multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=proc_id,
    )

    import numpy as np

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == proc_id

    from c_lwe_snarks_tpu.models import snark as tsnark
    from c_lwe_snarks_tpu.models import ssp as tssp
    from c_lwe_snarks_tpu.ops import sampling
    from c_lwe_snarks_tpu.utils import params as params_mod
    from c_lwe_snarks_tpu.utils import serial

    P = params_mod.custom(d=16, m=8)
    crs_key = sampling.PRGKey(bytes(range(40, 80)))
    ent_key = sampling.PRGKey(bytes(range(40)))
    off_setup = tssp.entropy_bytes_random_ssp(P)
    off_prove = off_setup + tsnark.setup_entropy_bytes(P)
    mesh = multihost.global_mesh()
    assert mesh.size == 2 * nproc, mesh

    @jax.jit
    def run():
        wits, inst = tssp.random_ssp(ent_key, 0, P)
        crs, vrs = tsnark.setup(crs_key, ent_key, off_setup, inst, P, mesh=mesh)
        pi = tsnark.prover(crs_key, ent_key, off_prove, crs, inst, wits, P, mesh=mesh)
        return crs, pi, tsnark.verifier(vrs, inst, pi, P)

    crs, pi, ok = run()
    jax.block_until_ready(ok)

    # Host-local slice of the sharded b_s rows, in device order — the
    # multihost IO pattern (each host writes only its addressable chunk).
    lo, hi = multihost.local_shard_bounds(P.d)
    shards = sorted(crs.b_s.addressable_shards, key=lambda s: s.index[0].start)
    local = np.concatenate([np.asarray(s.data) for s in shards])
    assert local.shape[0] == hi - lo, (local.shape, lo, hi)
    np.save(os.path.join(outdir, f"b_s_slice_{proc_id}.npy"), local)

    if proc_id == 0:
        # the proof and the verdict are replicated on every process
        with open(os.path.join(outdir, "proof.bin"), "wb") as f:
            f.write(serial.proof_to_bytes(pi, P))
        with open(os.path.join(outdir, "verified.txt"), "w") as f:
            f.write(str(bool(ok)))
    print(f"[worker {proc_id}] done, verified={bool(ok)}", flush=True)


if __name__ == "__main__":
    main()
