"""Observability: timers, profiler hooks, and the decrypt-probe.

The reference's only instrumentation is gettimeofday macros (timeit.h)
and printf; its de-facto debugging mechanism is the designated-verifier
decrypt-probe — decrypting intermediate ciphertexts mid-protocol and
checking algebraic invariants mod p (src/test_snark.c:40-70).  This
module provides both, plus jax.profiler tracing.
"""

from __future__ import annotations

import contextlib
import sys
import time

import jax
import jax.numpy as jnp

from ..models import lwe as tlwe
from ..models import snark as tsnark
from ..ops import modp, sampling
from .params import Params


@contextlib.contextmanager
def timeit(name: str, *, out=None, file=sys.stderr):
    """Wall-clock a block (timeit.h:4-19); blocks on device completion.

    Appends (name, seconds) to ``out`` if given."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if out is not None:
        out.append((name, dt))
    print(f"[timeit] {name}: {dt:.6f}s", file=file)


@contextlib.contextmanager
def profile(logdir: str = "/tmp/cls_tpu_profile"):
    """jax.profiler trace around a block (view with tensorboard/xprof)."""
    with jax.profiler.trace(logdir):
        yield
    print(f"[profile] trace written to {logdir}", file=sys.stderr)


# --------------------------------------------------------------------------
# Decrypt-probes (designated-verifier observability, src/test_snark.c:40-70)
# --------------------------------------------------------------------------


def probe_compressed(
    crs_key: sampling.PRGKey,
    section_offset,
    b_rows: jnp.ndarray,
    sk: jnp.ndarray,
    params: Params,
) -> jnp.ndarray:
    """Decrypt compressed CRS rows: uint32 [count] plaintexts mod p.

    Mirrors the reference probe pattern: rng_seek to the section offset,
    ct_import, regev_decrypt (src/test_snark.c:44-49)."""
    cts = tlwe.ct_import(crs_key, section_offset, b_rows, params)
    return tlwe.decrypt(cts, sk, params)


def probe_crs(crs: tsnark.CRSDev, vrs: tsnark.VRSDev, params: Params) -> dict:
    """Decrypt the head/tail of each CRS section and check invariants.

    Returns a dict of bool scalars: Dec(s[0]) == 1, Dec(as[0]) == alpha,
    and the alpha-correlation Dec(as[i]) == alpha * Dec(s[i]) at the
    first/last indices (src/test_snark.c:48-60)."""
    key = sampling.PRGKey(crs.seed)
    d = params.d
    idx = jnp.asarray([0, 1, d - 1])
    rows_s = tlwe.pad_digits(crs.b_s[idx])
    rows_as = tlwe.pad_digits(crs.b_as[idx])
    # per-row import at exact stream offsets (rng_seek analog)
    dec_s = jnp.stack([
        probe_compressed(key, params.ctr_s + int(i) * params.ctr_ct,
                         rows_s[j][None], vrs.sk, params)[0]
        for j, i in enumerate((0, 1, d - 1))
    ])
    dec_as = jnp.stack([
        probe_compressed(key, params.ctr_as + int(i) * params.ctr_ct,
                         rows_as[j][None], vrs.sk, params)[0]
        for j, i in enumerate((0, 1, d - 1))
    ])
    return {
        "s0_is_one": dec_s[0] == jnp.uint32(1),
        "as0_is_alpha": dec_as[0] == vrs.alpha,
        "alpha_correlated_1": modp.mulmod_p(vrs.alpha, dec_s[1]) == dec_as[1],
        "alpha_correlated_last": modp.mulmod_p(vrs.alpha, dec_s[2]) == dec_as[2],
        "s1_is_s": dec_s[1] == vrs.s,
        "s_power_last": modp.powmod_p(vrs.s, d - 1) == dec_s[2],
    }


def probe_proof(
    pi: tsnark.ProofDev, vrs: tsnark.VRSDev, params: Params
) -> dict:
    """Decrypt proof terms and check alpha*h_s == hat_h_s (src/test_snark.c:81-89)."""
    dec = tlwe.decrypt(pi.stack(), vrs.sk, params)
    return {
        "h": dec[0], "hat_h": dec[1], "hat_v": dec[2], "v_w": dec[3],
        "b_w": dec[4],
        "pke_h": modp.mulmod_p(vrs.alpha, dec[0]) == dec[1],
    }


def probe_crs_range(
    crs: tsnark.CRSDev,
    vrs: tsnark.VRSDev,
    params: Params,
    *,
    lo: int = 0,
    count: int | None = None,
) -> dict:
    """Batched in-pipeline CRS invariant check over a contiguous range.

    The 3-point probe_crs mirrors the reference's spot checks
    (src/test_snark.c:40-70); this is the scalable form: ONE ct_import +
    decrypt batch per section covers ``count`` consecutive terms
    [lo, lo+count), then the invariants vectorize —
    Dec(as[i]) == alpha * Dec(s[i]) for every probed i, and the
    geometric chain Dec(s[i+1]) == s * Dec(s[i]).  All device-side; no
    per-index host loop, so it can run over the whole CRS if asked.
    """
    if count is None:
        count = min(params.d - lo, 256)
    key = sampling.PRGKey(crs.seed)
    rows_s = tlwe.pad_digits(crs.b_s[lo : lo + count])
    rows_as = tlwe.pad_digits(crs.b_as[lo : lo + count])
    dec_s = probe_compressed(
        key, params.ctr_s + lo * params.ctr_ct, rows_s, vrs.sk, params
    )
    dec_as = probe_compressed(
        key, params.ctr_as + lo * params.ctr_ct, rows_as, vrs.sk, params
    )
    chain = modp.mulmod_p(vrs.s, dec_s[:-1]) == dec_s[1:]
    out = {
        "alpha_correlated_all": jnp.all(
            modp.mulmod_p(vrs.alpha, dec_s) == dec_as
        ),
        "s_chain_all": jnp.all(chain),
    }
    if lo == 0:
        out["s0_is_one"] = dec_s[0] == jnp.uint32(1)
        out["as0_is_alpha"] = dec_as[0] == vrs.alpha
    return out
