"""Headline benchmark: prover eval_poly throughput at release parameters.

Measures the SNARK prover's dominant primitive — homomorphic polynomial
evaluation over an encrypted CRS (reference src/lwe.c:176-186; ~all
prover cycles, SURVEY §3.2) — as ciphertext-terms/sec on the current
JAX device, at the reference's release workload shape (d=2^15, n=1470,
92-byte ciphertexts, keystream regenerated on the fly).  One prover call
is 4d term-MACs (two fused 2-polynomial passes).

vs_baseline: ratio against the single-threaded C-reference-equivalent
hot loop measured on this host (native/ref_baseline/eval_poly_ref.c:
OpenSSL AES-256-CTR keystream + GMP mpn_addmul_1, the reference's exact
per-term work).  The reference itself publishes no numbers (BASELINE.md);
if the native baseline cannot be built, a recorded measurement of it on
the dev host is used.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import os
import subprocess
import sys
import time

# Recorded eval_poly_ref output on the dev host (2026-08-18), used only
# if the native baseline can't be built/run here.
FALLBACK_REF_TERMS_PER_SEC = 17500.0

D_BENCH = 1 << 15  # release GAMMA_D (reference src/lwe.h:14)
REPS = 5


def ref_terms_per_sec() -> tuple[float, str]:
    """(terms/s, source): source is "measured" when the native baseline
    ran live on this host, "recorded" when the canned dev-host constant
    had to be used (so JSON consumers can tell them apart)."""
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "native", "ref_baseline")
    exe = os.path.join(here, "eval_poly_ref")
    src = os.path.join(here, "eval_poly_ref.c")
    try:
        if not os.path.exists(exe):
            subprocess.run(
                ["gcc", "-O3", "-march=native", src, "-o", exe,
                 "-l:libgmp.so.10", "-l:libcrypto.so.3"],
                check=True, capture_output=True, timeout=120,
            )
        out = subprocess.run(
            [exe, "4096"], check=True, capture_output=True, timeout=300,
        ).stdout.decode()
        return float(out.strip().split("=")[1]), "measured"
    except Exception as e:  # noqa: BLE001 — baseline is best-effort
        print(f"[bench] native baseline unavailable ({e}); "
              f"using recorded {FALLBACK_REF_TERMS_PER_SEC}", file=sys.stderr)
        return FALLBACK_REF_TERMS_PER_SEC, "recorded"


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks import setup_cache

    setup_cache()  # release kernels take minutes to compile; reuse across runs

    from c_lwe_snarks_tpu.models import lwe as tlwe
    from c_lwe_snarks_tpu.ops import sampling
    from c_lwe_snarks_tpu.utils import params as params_mod

    dev = jax.devices()[0]
    print(f"[bench] device: {dev.platform} ({dev.device_kind})", file=sys.stderr)

    P = params_mod.custom(d=D_BENCH, m=64)
    key = sampling.PRGKey(bytes(range(40, 80)))
    rng = np.random.default_rng(0)
    b_rows = jnp.asarray(rng.integers(0, 256, size=(P.d, 88), dtype=np.uint8))
    coeffs = jnp.asarray(rng.integers(0, P.p, size=(2, P.d), dtype=np.uint32))

    @jax.jit
    def prover_evals(b, c):
        # the prover's two fused passes: (w,h) over CTR_S, (v,h) over CTR_AS
        ev_s = tlwe.eval_poly_multi(key, P.ctr_s, b, c, P)
        ev_as = tlwe.eval_poly_multi(key, P.ctr_as, b, c, P)
        return ev_s, ev_as

    t0 = time.perf_counter()
    jax.block_until_ready(prover_evals(b_rows, coeffs))
    print(f"[bench] compile+first run: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(prover_evals(b_rows, coeffs))
        times.append(time.perf_counter() - t0)
    t = sorted(times)[len(times) // 2]
    terms = 4 * P.d  # 2 passes x 2 fused polynomials x d terms
    tps = terms / t
    ks_gbps = 2 * P.d * P.ctr_ct / t / 1e9
    print(f"[bench] reps: {[f'{x:.3f}' for x in times]} -> median {t:.3f}s; "
          f"keystream {ks_gbps:.2f} GB/s", file=sys.stderr)

    ref, ref_source = ref_terms_per_sec()
    print(json.dumps({
        "metric": "prover_eval_terms_per_sec",
        "value": round(tps, 1),
        "unit": "ciphertext-terms/s (d=2^15, n=1470, 4d terms/proof)",
        "vs_baseline": round(tps / ref, 3),
        "baseline_source": ref_source,
    }))


if __name__ == "__main__":
    main()
