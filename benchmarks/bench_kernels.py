"""Kernel-level breakdown of the prover hot path (roofline accounting).

Times each stage of eval_poly's per-tile work in isolation at release
shapes (d=2^15, n=1470) so the composite wall time can be attributed:

* ``keystream``   — the Pallas AES kernel alone (words out, HBM write).
* ``expand``      — keystream words -> uint8 digit tensor (shift/mask).
* ``mac``         — the [4k, T] x [T, (n+1)*88] int8 MXU matmul over
                    pre-materialized digit slabs (+ plane combine/fold).
* ``eval_fused``  — the real eval_poly_multi (all of the above fused in
                    one scan).
* ``enc kernel``  — the bare fused keystream->encrypt Pallas kernel
                    (setup's <sk, a>), then the full encrypt_section;
                    the difference is the XLA epilogue cost.
* ``ntt h-stage`` — the prover's replicated CRT-NTT stage:
                    h = (v^2 - 1) / t at degree d.

Usage: python -m benchmarks.bench_kernels [--d 32768] [--reps 5]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from c_lwe_snarks_tpu.models import lwe as tlwe
from c_lwe_snarks_tpu.ops import sampling
from c_lwe_snarks_tpu.utils import params as params_mod


def _time(fn, *args, reps: int = 5) -> float:
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main() -> None:
    from . import setup_cache

    setup_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=1 << 15)
    ap.add_argument("--k", type=int, default=2, help="fused polynomials")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tile", type=int, default=256)
    args = ap.parse_args()

    P = params_mod.custom(d=args.d, m=64)
    key = sampling.PRGKey(bytes(range(40, 80)))
    rng = np.random.default_rng(0)
    d, n, k, tile = args.d, P.n, args.k, args.tile
    b_rows = jnp.asarray(rng.integers(0, 256, size=(d, 88), dtype=np.uint8))
    coeffs = jnp.asarray(rng.integers(0, P.p, size=(k, d), dtype=np.uint32))

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind}); d={d} n={n} k={k} tile={tile}")

    # --- stage shapes: one eval pass consumes d*ctr_ct keystream bytes ----
    total_bytes = d * P.ctr_ct
    nblocks = total_bytes // 16
    print(f"keystream per pass: {total_bytes/1e9:.2f} GB ({nblocks/1e6:.1f} M blocks)")

    # 1. keystream kernel alone (words out)
    ks_fn = jax.jit(lambda: sampling.keystream_words(key, (0, 0), nblocks))
    t_ks = _time(lambda: ks_fn(), reps=args.reps)
    print(f"keystream  : {t_ks:.3f}s  -> {total_bytes/t_ks/1e9:.2f} GB/s")

    # 2. expand_a for one tile batch (words -> u8 digits), scaled
    tb = tile * P.ctr_ct  # bytes per tile
    ex_fn = jax.jit(lambda: sampling.expand_a(key, 0, tile, n))
    t_ex = _time(lambda: ex_fn(), reps=args.reps) * (d // tile)
    print(f"expand_a   : {t_ex:.3f}s (scaled from one {tb/1e6:.0f} MB tile; "
          f"includes its keystream)")

    # 3. MAC matmul alone over a pre-materialized tile, scaled
    x = jnp.asarray(
        rng.integers(0, 256, size=(tile, (n + 1) * 88), dtype=np.uint8)
    )
    cb = jnp.asarray(rng.integers(0, 256, size=(4 * k, tile), dtype=np.uint8))
    from c_lwe_snarks_tpu.ops import digits as dg

    mac_fn = jax.jit(lambda cb_, x_: dg.u8_matmul(cb_, x_))
    t_mac = _time(mac_fn, cb, x, reps=args.reps) * (d // tile)
    print(f"mac matmul : {t_mac:.3f}s (scaled)")

    # 4. the fused eval (the real thing)
    ev_fn = jax.jit(
        lambda b, c: tlwe.eval_poly_multi(key, 0, b, c, P, tile=tile)
    )
    t_ev = _time(ev_fn, b_rows, coeffs, reps=args.reps)
    print(f"eval fused : {t_ev:.3f}s  -> {2 * d / t_ev:.0f} terms/s "
          f"(k={k} fused; keystream {total_bytes/t_ev/1e9:.2f} GB/s effective)")

    # 5. the fused encrypt kernel (setup's hot path, src/snark.c:75-110):
    #    first the bare <sk, a> Pallas kernel, then the full
    #    encrypt_section (kernel + p*e + m epilogue + carry fold) — the
    #    difference is the XLA epilogue cost the kernel can't see.
    sk = jnp.asarray(rng.integers(0, 256, size=(n, 88), dtype=np.uint8))
    msgs = jnp.asarray(rng.integers(0, P.p, size=d, dtype=np.uint32))
    errs = jnp.asarray(rng.integers(0, 256, size=(d, 88), dtype=np.uint8))
    from c_lwe_snarks_tpu.ops import eval_fused

    if sampling._default_backend() == "pallas":
        dot_fn = jax.jit(
            lambda: eval_fused.encrypt_b_fused(key, 0, sk, d, n, P.ctr_ct)
        )
        t_dot = _time(lambda: dot_fn(), reps=args.reps)
        print(f"enc kernel : {t_dot:.3f}s  -> {d / t_dot:.0f} enc/s "
              f"(keystream {total_bytes/t_dot/1e9:.2f} GB/s effective)")
    enc_fn = jax.jit(
        lambda m, e: tlwe.encrypt_section(key, 0, sk, m, e, P)
    )
    t_enc = _time(enc_fn, msgs, errs, reps=args.reps)
    print(f"enc full   : {t_enc:.3f}s  -> {d / t_enc:.0f} enc/s "
          f"(keystream {total_bytes/t_enc/1e9:.2f} GB/s effective)")

    # 6. the prover's CRT-NTT stage: h = (v^2 - 1) / t at degree d
    #    (src/snark.c:166-169; the only prover stage not keystream-bound).
    from c_lwe_snarks_tpu.ops import ntt

    tpoly = jnp.asarray(rng.integers(0, P.p, size=d, dtype=np.uint32))
    vpoly = jnp.asarray(rng.integers(0, P.p, size=d, dtype=np.uint32))

    def h_stage(v, t):
        v_sq = ntt.poly_mul_mod_p(v, v)
        from c_lwe_snarks_tpu.ops import modp
        num = v_sq.at[0].set(modp.submod_p(v_sq[0], jnp.uint32(1)))
        return ntt.poly_div_exact_mod_p(num, t, d)

    ntt_fn = jax.jit(h_stage)
    t_ntt = _time(ntt_fn, vpoly, tpoly, reps=args.reps)
    print(f"ntt h-stage: {t_ntt:.3f}s  (v^2 mul + exact div, deg {d})")


if __name__ == "__main__":
    main()
