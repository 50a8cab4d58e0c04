"""Multi-process DCN worker: one controller of an N-process CPU launch.

Run by tests/test_multiprocess.py as ``python tests/_mp_worker.py
<process_id> <num_processes> <coordinator_port> <outdir>``.  Each process
owns 2 virtual CPU devices; the script initializes jax.distributed FIRST
(before any backend-touching call — the bug class this test exists to
catch), builds the global mesh, runs the full sharded pipeline
(random_ssp -> setup -> prover -> verifier) and writes:

* ``crs_rows_<pid>.npz`` — this host's contiguous rows of each CRS
  section (serial.crs_local_section_rows, the write half of multihost
  CRS IO), stitched by process 0 into ``crs.bin``;
* ``crs_local_slice_<pid>.npy`` — this host's row range of the stitched
  file read back through serial.crs_local_slice (the read half);
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

    # -- write half of multihost CRS IO: each process persists only its
    # addressable section rows (serial.crs_local_section_rows), and the
    # stitched file must equal the single-process crs_to_bytes.
    secs = serial.crs_local_section_rows(crs, P)
    np.savez(
        os.path.join(outdir, f"crs_rows_{proc_id}.npz"),
        **{f"{k}_start": np.int64(v[0]) for k, v in secs.items()},
        **{f"{k}_rows": v[1] for k, v in secs.items()},
    )

    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("crs_slices_written")
    crs_path = os.path.join(outdir, "crs.bin")
    if proc_id == 0:
        # stitch seed || s || as || t || v from every host's slice file
        parts: dict = {k: {} for k in ("s", "as", "v")}
        for pid in range(nproc):
            z = np.load(os.path.join(outdir, f"crs_rows_{pid}.npz"))
            for k in parts:
                parts[k][int(z[f"{k}_start"])] = z[f"{k}_rows"]
        with open(crs_path, "wb") as f:
            f.write(bytes(crs.seed))
            for k in ("s", "as"):
                for start in sorted(parts[k]):
                    f.write(parts[k][start].tobytes())
            f.write(secs["t"][1].tobytes())
            for start in sorted(parts["v"]):
                f.write(parts["v"][start].tobytes())
    multihost_utils.sync_global_devices("crs_file_stitched")

    # -- read half: host-sliced memmap load (serial.crs_local_slice) under
    # a live multi-process run — the path a real deployment loads with.
    seed, lo_r, rows = serial.crs_local_slice(crs_path, P)
    assert seed == bytes(crs.seed)
    exp_lo, exp_hi = multihost.local_shard_bounds(P.crs_num_cts)
    assert (lo_r, lo_r + rows.shape[0]) == (exp_lo, exp_hi), (lo_r, rows.shape)
    np.save(os.path.join(outdir, f"crs_local_slice_{proc_id}.npy"), rows)

    if proc_id == 0:
        # the proof and the verdict are replicated on every process
        with open(os.path.join(outdir, "proof.bin"), "wb") as f:
            f.write(serial.proof_to_bytes(pi, P))
        with open(os.path.join(outdir, "verified.txt"), "w") as f:
            f.write(str(bool(ok)))
    print(f"[worker {proc_id}] done, verified={bool(ok)}", flush=True)


if __name__ == "__main__":
    main()
