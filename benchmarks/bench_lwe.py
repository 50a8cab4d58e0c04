"""Per-op encrypt/decrypt timing (reference src/benchmark_lwe.c:28-39).

The reference times 10^4 single encrypt/decrypt calls; a TPU is a batch
machine, so this reports both the batched rate (the framework's real
operating point) and the amortized per-op seconds the reference printed.

Usage: python -m benchmarks.bench_lwe [--batch 4096] [--reps 5]
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


def run(batch: int = 4096, reps: int = 5, params=None) -> dict:
    setup_cache()
    P = params or params_mod.release()
    crs_key = sampling.PRGKey(bytes(range(40, 80)))
    ent_key = sampling.PRGKey(bytes(range(40)))
    rng = np.random.default_rng(0)
    msgs = jnp.asarray(rng.integers(0, P.p, size=batch, dtype=np.uint32))
    errs = jnp.asarray(rng.integers(0, 256, size=(batch, 88), dtype=np.uint8))

    sk = jax.jit(lambda: tlwe.key_gen(ent_key, 0, P))()

    enc = jax.jit(
        lambda m, e: tlwe.encrypt_section(crs_key, 0, sk, m, e, P)
    )
    full = jax.jit(lambda m, e: tlwe.encrypt(crs_key, 0, sk, m, e, P))
    dec = jax.jit(lambda c: tlwe.decrypt(c, sk, P))

    b = jax.block_until_ready(enc(msgs, errs))
    cts = jax.block_until_ready(full(msgs, errs))
    jax.block_until_ready(dec(cts))

    def med(fn, *args):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        return mean_3sigma(ts)

    enc_mu, enc_s3 = med(enc, msgs, errs)
    dec_mu, dec_s3 = med(dec, cts)
    out = {
        "batch": batch,
        "encryption_s_per_op": enc_mu / batch,
        "encryption_3sigma": enc_s3 / batch,
        "encryptions_per_sec": batch / enc_mu,
        "decryption_s_per_op": dec_mu / batch,
        "decryption_3sigma": dec_s3 / batch,
        "decryptions_per_sec": batch / dec_mu,
    }
    print(f"encryption {out['encryption_s_per_op']:.3e} s/op "
          f"({out['encryptions_per_sec']:.0f}/s batched)", file=sys.stderr)
    print(f"decryption {out['decryption_s_per_op']:.3e} s/op "
          f"({out['decryptions_per_sec']:.0f}/s batched)", file=sys.stderr)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    print(json.dumps(run(args.batch, args.reps)))
