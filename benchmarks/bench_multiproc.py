"""Cross-process scaling bench: sharded setup/eval over a DCN-spanning mesh.

Launches ``--nproc`` jax.distributed CPU processes (localhost coordinator)
with ``--devices-per-proc`` virtual devices each and times the sharded
encrypt_section / eval_poly_multi (parallel/mesh.py) on the GLOBAL mesh.
The eval's psum reduces partial MAC accumulators across every device, so
with nproc >= 2 the collective demonstrably crosses the process boundary
(DCN path) — the pre-pod stand-in for the BASELINE.md multi-host north
star.  The reference is single-process C (SURVEY §1); no reference number
exists to match.

On this 2-core host the processes share one socket, so walls measure
correctness + collective overhead, not hardware scaling (the recorded
artifact says so).  On a real multi-host deployment run it unchanged with
real accelerators per process.

Usage: python -m benchmarks.bench_multiproc [--nproc 2]
       [--devices-per-proc 4] [--d 512] [--n 64] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def worker(args) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices_per_proc)

    from c_lwe_snarks_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.nproc,
        process_id=args.proc_id,
    )

    import jax.numpy as jnp
    import numpy as np

    from c_lwe_snarks_tpu.ops import sampling
    from c_lwe_snarks_tpu.utils import params as params_mod
    from . import block, setup_cache

    setup_cache()
    assert jax.process_count() == args.nproc
    mesh = multihost.global_mesh()
    assert mesh.size == args.nproc * args.devices_per_proc, mesh

    from c_lwe_snarks_tpu.parallel import mesh as pmesh

    P = params_mod.custom(d=args.d, m=64, n=args.n)
    key = sampling.PRGKey(bytes(range(40, 80)))
    rng = np.random.default_rng(0)
    sk = jnp.asarray(rng.integers(0, 256, size=(P.n, 88), dtype=np.uint8))
    msgs = jnp.asarray(rng.integers(0, P.p, size=P.d, dtype=np.uint32))
    errs = jnp.asarray(rng.integers(0, 256, size=(P.d, 88), dtype=np.uint8))
    b_rows = jnp.asarray(rng.integers(0, 256, size=(P.d, 88), dtype=np.uint8))
    coeffs = jnp.asarray(rng.integers(0, P.p, size=(2, P.d), dtype=np.uint32))

    def timed(fn, *a):
        block(fn(*a))  # compile + warm
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            block(fn(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_setup = timed(
        jax.jit(
            lambda m, e: pmesh.encrypt_section_sharded(
                key, P.ctr_s, sk, m, e, P, mesh
            )
        ),
        msgs, errs,
    )
    # eval: per-shard partial MACs + ONE psum over the global device axis
    # — with nproc >= 2 that collective crosses the process boundary.
    t_eval = timed(
        jax.jit(
            lambda b, c: pmesh.eval_poly_multi_sharded(
                key, P.ctr_s, b, c, P, mesh
            )
        ),
        b_rows, coeffs,
    )
    if args.proc_id == 0:
        print(json.dumps({
            "workload": {"d": P.d, "m": P.m, "n": P.n},
            "processes": args.nproc,
            "devices_per_process": args.devices_per_proc,
            "global_devices": mesh.size,
            "psum_crosses_process_boundary": args.nproc >= 2,
            "host_note": "single-socket CPU emulation: walls measure "
                         "correctness + collective overhead, not scaling",
            "setup_s": round(t_setup, 4),
            "eval_s": round(t_eval, 4),
            "eval_terms_per_sec": round(2 * P.d / t_eval, 1),
        }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--proc-id", type=int, default=-1)
    ap.add_argument("--port", type=int, default=0)
    args = ap.parse_args()

    if args.proc_id >= 0:
        worker(args)
        return

    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "CLS_TEST_PLATFORM")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "benchmarks.bench_multiproc",
             "--proc-id", str(i), "--port", str(port),
             "--nproc", str(args.nproc),
             "--devices-per-proc", str(args.devices_per_proc),
             "--d", str(args.d), "--n", str(args.n), "--reps", str(args.reps)],
            stdout=subprocess.PIPE if i == 0 else subprocess.DEVNULL,
            stderr=sys.stderr.fileno(),
            env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(args.nproc)
    ]
    try:
        out, _ = procs[0].communicate(timeout=900)
        for pr in procs[1:]:
            pr.wait(timeout=900)
    finally:
        for pr in procs:  # kill exact PIDs, never by pattern
            if pr.poll() is None:
                pr.kill()
    rcs = [pr.returncode for pr in procs]
    assert all(rc == 0 for rc in rcs), rcs
    sys.stdout.write(out.decode())


if __name__ == "__main__":
    main()
