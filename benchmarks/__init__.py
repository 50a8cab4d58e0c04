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
