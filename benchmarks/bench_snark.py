"""Full-protocol wall times (reference src/benchmark_snark.c:56-82).

random_ssp -> setup -> prover -> verifier at the chosen parameter
profile, timing each stage and asserting the proof verifies (the
reference exits nonzero on verification failure, :94-96).

Usage: python -m benchmarks.bench_snark [--profile release|toy]
       [--d D --m M] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax

from c_lwe_snarks_tpu.models import snark as tsnark
from c_lwe_snarks_tpu.models import ssp as tssp
from c_lwe_snarks_tpu.ops import sampling
from c_lwe_snarks_tpu.utils import params as params_mod


def run(P, reps: int = 2, mesh=None) -> dict:
    from . import block, setup_cache

    setup_cache()
    crs_key = sampling.PRGKey(bytes(range(40, 80)))
    ent_key = sampling.PRGKey(bytes(range(40)))
    off_setup = tssp.entropy_bytes_random_ssp(P)
    off_prove = off_setup + tsnark.setup_entropy_bytes(P)

    gen = jax.jit(lambda: tssp.random_ssp(ent_key, 0, P))
    setup = jax.jit(
        lambda inst: tsnark.setup(crs_key, ent_key, off_setup, inst, P, mesh=mesh)
    )
    prove = jax.jit(
        lambda crs, inst, wits: tsnark.prover(
            crs_key, ent_key, off_prove, crs, inst, wits, P, mesh=mesh
        )
    )
    verify = jax.jit(lambda vrs, inst, pi: tsnark.verifier(vrs, inst, pi, P))

    stages = {}

    def timed(name, fn, *args):
        block(fn(*args))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = block(fn(*args))
            ts.append(time.perf_counter() - t0)
        stages[name] = min(ts)
        print(f"{name}: {min(ts):.3f}s", file=sys.stderr)
        return out

    wits, inst = timed("random_ssp", gen)
    crs, vrs = timed("setup", setup, inst)
    pi = timed("prover", prove, crs, inst, wits)
    ok = timed("verifier", verify, vrs, inst, pi)
    assert bool(ok), "proof did not verify"

    return {
        "d": P.d, "m": P.m, "n": P.n, **stages,
        "constraints_per_sec": P.m / stages["prover"],
        "setup_encryptions_per_sec": (2 * P.d + P.m) / stages["setup"],
        "verified": bool(ok),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="toy", choices=["toy", "release"])
    ap.add_argument("--d", type=int)
    ap.add_argument("--m", type=int)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    if args.d and args.m:
        P = params_mod.custom(d=args.d, m=args.m)
    else:
        P = getattr(params_mod, args.profile)()
    print(json.dumps(run(P, args.reps)))
