"""One eval_poly over D release-scale terms (reference src/benchmark_eval.c).

The reference mmaps D compressed ciphertexts from disk and times a single
homomorphic evaluation; here the compressed rows are device-resident and
the a-expansion keystream is regenerated on the fly (never materialized),
which is the TPU redesign of the same workload.

Usage: python -m benchmarks.bench_eval [--d 32768] [--k 1] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from c_lwe_snarks_tpu.models import lwe as tlwe
from c_lwe_snarks_tpu.ops import sampling
from c_lwe_snarks_tpu.utils import params as params_mod

from . import setup_cache
from .stats import mean_3sigma


def run(d: int = 1 << 15, k: int = 1, reps: int = 5) -> dict:
    setup_cache()
    P = params_mod.custom(d=d, m=64)
    key = sampling.PRGKey(bytes(range(40, 80)))
    rng = np.random.default_rng(0)
    b_rows = jnp.asarray(rng.integers(0, 256, size=(d, 88), dtype=np.uint8))
    coeffs = jnp.asarray(rng.integers(0, P.p, size=(k, d), dtype=np.uint32))

    fn = jax.jit(lambda b, c: tlwe.eval_poly_multi(key, P.ctr_s, b, c, P))
    jax.block_until_ready(fn(b_rows, coeffs))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(b_rows, coeffs))
        ts.append(time.perf_counter() - t0)
    mu, s3 = mean_3sigma(ts)
    out = {
        "d": d, "k": k,
        "eval_poly_s": mu, "eval_poly_3sigma": s3,
        "terms_per_sec": k * d / mu,
        "keystream_gb_per_sec": d * P.ctr_ct / mu / 1e9,
    }
    print(f"eval_poly d={d} k={k}: {mu:.3f}s "
          f"({out['terms_per_sec']:.0f} terms/s, "
          f"{out['keystream_gb_per_sec']:.2f} GB/s keystream)", file=sys.stderr)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=1 << 15)
    ap.add_argument("--k", type=int, default=1)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    print(json.dumps(run(args.d, args.k, args.reps)))
