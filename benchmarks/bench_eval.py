"""One eval_poly over D release-scale terms (reference src/benchmark_eval.c).

The reference mmaps D compressed ciphertexts from disk (MADV_SEQUENTIAL,
src/benchmark_eval.c:44-66) and times a single homomorphic evaluation;
here the compressed rows are device-resident and the a-expansion
keystream is regenerated on the fly (never materialized), which is the
TPU redesign of the same workload.  ``--from-file`` adds the file-backed
analog: the section is written with serial.crs_write_stream, the b-rows
are read back through the crs_row_table memmap, and the timed path covers
file read + host->device transfer + evaluation.

Usage: python -m benchmarks.bench_eval [--d 32768] [--k 1] [--reps 5]
       [--from-file]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

from c_lwe_snarks_tpu.models import lwe as tlwe
from c_lwe_snarks_tpu.ops import sampling
from c_lwe_snarks_tpu.utils import params as params_mod

from . import setup_cache
from .stats import mean_3sigma


def run(
    d: int = 1 << 15, k: int = 1, reps: int = 5, from_file: bool = False
) -> dict:
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

    if from_file:
        out.update(_run_from_file(P, key, coeffs, fn, rng, reps))
    return out


def _run_from_file(P, key, coeffs, fn, rng, reps: int) -> dict:
    """File-backed eval (src/benchmark_eval.c:44-66 analog).

    A synthetic CRS file holds the section rows in the stored 92-byte
    format; each timed rep re-reads the s-section rows off the memmap,
    ships them to the device, and evaluates — persistence-under-load.
    """
    from c_lwe_snarks_tpu.models import snark as tsnark
    from c_lwe_snarks_tpu.utils import serial

    d, m = P.d, P.m
    crs = tsnark.CRSDev(
        seed=key.seed,
        b_s=jnp.asarray(rng.integers(0, 256, size=(d, 88), dtype=np.uint8)),
        b_as=jnp.asarray(rng.integers(0, 256, size=(d, 88), dtype=np.uint8)),
        b_t=jnp.asarray(rng.integers(0, 256, size=(88,), dtype=np.uint8)),
        b_v=jnp.asarray(rng.integers(0, 256, size=(m - 1, 88), dtype=np.uint8)),
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "crs.bin")
        serial.crs_write_stream(path, crs, P)
        fsize = os.path.getsize(path)

        def eval_from_file():
            _, table = serial.crs_row_table(path, P)
            rows = jnp.asarray(np.asarray(table[:d, :88]))  # s-section
            return fn(rows, coeffs)

        jax.block_until_ready(eval_from_file())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(eval_from_file())
            ts.append(time.perf_counter() - t0)
    mu, s3 = mean_3sigma(ts)
    k = coeffs.shape[0]
    res = {
        "file_bytes": fsize,
        "eval_from_file_s": mu, "eval_from_file_3sigma": s3,
        "terms_per_sec_from_file": k * d / mu,
    }
    print(f"eval_poly from file ({fsize/1e6:.1f} MB CRS): {mu:.3f}s "
          f"({res['terms_per_sec_from_file']:.0f} terms/s incl. IO)",
          file=sys.stderr)
    return res


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=1 << 15)
    ap.add_argument("--k", type=int, default=1)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--from-file", action="store_true")
    args = ap.parse_args()
    print(json.dumps(run(args.d, args.k, args.reps, args.from_file)))
