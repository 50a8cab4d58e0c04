"""Benchmark runners mirroring the reference's three benchmark binaries.

| runner        | reference                  | metric                          |
|---------------|----------------------------|---------------------------------|
| bench_lwe     | src/benchmark_lwe.c:28-39  | encrypt / decrypt seconds per op|
| bench_eval    | src/benchmark_eval.c:69-74 | one eval_poly over D terms      |
| bench_snark   | src/benchmark_snark.c:56-82| setup / prover / verifier wall  |
| stats         | stat.py:7-8                | mean / 3-sigma aggregation      |

Each runner prints machine-readable ``name=value`` lines (seconds) plus a
JSON summary; `bench.py` at the repo root remains the one-line headline
metric for the driver.
"""

import os as _os


def setup_cache() -> None:
    """Persistent XLA compilation cache (release-profile programs take
    minutes to compile; reruns must not pay that again)."""
    import jax

    here = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", _os.path.join(here, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def block(tree):
    """Block until every array leaf of a pytree is ready; returns the tree.

    One `jax.block_until_ready` call over the tree, NOT a per-leaf
    `.block_until_ready()` loop: on the tunneled TPU runtime each leaf
    sync is a separate host round-trip (~25 ms after a long program), so
    the loop inflated every multi-output wall by leaves x 25 ms (measured
    0.507 s vs 0.399 s for the same 5-output eval).
    """
    import jax

    return jax.block_until_ready(tree)
