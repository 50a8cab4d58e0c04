"""Scaling sweep: sharded setup + prover eval across 1..N devices.

Runs ``encrypt_section_sharded`` and ``eval_poly_multi_sharded``
(parallel/mesh.py) on 1, 2, 4, ..., N-device meshes at a fixed global
workload (strong scaling) and reports per-mesh walls, per-chip rates,
and parallel efficiency vs the 1-device run.  The reference is
single-threaded C with no distributed mode (SURVEY §1), so there is no
reference number to match — the target is the BASELINE.md north star of
>= 80% efficiency at 1 -> N real chips.

On a single-chip or CPU environment the sweep runs on XLA's virtual
host devices: that validates the sharded graphs end-to-end and measures
collective/padding overhead, but the "chips" share one socket, so
efficiency numbers are a lower bound, not a hardware measurement (say
so in anything you record).  On a real pod slice run it unchanged.

Usage: python -m benchmarks.bench_scaling [--devices 8] [--d 1024]
       [--n 256] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--virtual-cpu", action="store_true",
        help="force the sweep onto virtual CPU devices without probing",
    )
    args = ap.parse_args()

    # Fall back to a virtual CPU platform only when the ambient backend
    # can't supply the requested device count (on a real pod slice the
    # sweep must stay on TPU so the fused Pallas paths are measured).
    # Probing jax.devices() in-process would initialize and lock in the
    # ambient backend before we could override it, so probe in a child.
    import subprocess

    force_cpu = args.virtual_cpu
    if not force_cpu:
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.default_backend(), len(jax.devices()))"],
                capture_output=True, text=True, timeout=120,
            )
            out = probe.stdout.strip().split()
        except (subprocess.TimeoutExpired, OSError):
            out = []  # hung/failed probe (e.g. TPU runtime lock) -> CPU
        ambient = (out[0], int(out[1])) if len(out) == 2 else ("cpu", 0)
        print(f"[scaling] ambient backend: {ambient}", file=sys.stderr)
        force_cpu = ambient[0] == "cpu" or ambient[1] < args.devices

    import jax

    if force_cpu:
        for opt, val in (
            ("jax_platforms", "cpu"),
            ("jax_num_cpu_devices", args.devices),
        ):
            try:
                jax.config.update(opt, val)
            except RuntimeError:
                break  # backend already initialized; hope it's big enough

    import jax.numpy as jnp
    import numpy as np

    from c_lwe_snarks_tpu.models import lwe as tlwe
    from c_lwe_snarks_tpu.ops import sampling
    from c_lwe_snarks_tpu.parallel import mesh as pmesh
    from c_lwe_snarks_tpu.utils import params as params_mod
    from . import block, setup_cache

    setup_cache()
    ndev = len(jax.devices())
    assert ndev >= args.devices, (ndev, args.devices)
    platform = jax.devices()[0].platform
    print(f"[scaling] platform={platform} devices={ndev}", file=sys.stderr)
    virtual = platform == "cpu"

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

    sweep = []
    nshards = 1
    while nshards <= args.devices:
        mesh = pmesh.make_mesh(nshards)
        t_setup = timed(
            jax.jit(
                lambda m, e: pmesh.encrypt_section_sharded(
                    key, P.ctr_s, sk, m, e, P, mesh
                )
            ),
            msgs, errs,
        )
        t_eval = timed(
            jax.jit(
                lambda b, c: pmesh.eval_poly_multi_sharded(
                    key, P.ctr_s, b, c, P, mesh
                )
            ),
            b_rows, coeffs,
        )
        row = {
            "devices": nshards,
            "setup_s": round(t_setup, 4),
            "setup_enc_per_sec": round(P.d / t_setup, 1),
            "eval_s": round(t_eval, 4),
            "eval_terms_per_sec": round(2 * P.d / t_eval, 1),
        }
        sweep.append(row)
        print(f"[scaling] {row}", file=sys.stderr)
        nshards *= 2

    base = sweep[0]
    for row in sweep:
        n = row["devices"]
        row["setup_efficiency"] = round(
            base["setup_s"] / (row["setup_s"] * n), 3
        )
        row["eval_efficiency"] = round(
            base["eval_s"] / (row["eval_s"] * n), 3
        )

    print(json.dumps({
        "workload": {"d": P.d, "m": P.m, "n": P.n},
        "platform": platform,
        "virtual_devices": virtual,
        "sweep": sweep,
    }))


if __name__ == "__main__":
    main()
