"""Mean/3-sigma aggregation over benchmark samples (reference stat.py:7-8).

The reference pipes per-op timings into a numpy one-liner; this is the
same contract as a function plus a stdin-compatible CLI:
``python -m benchmarks.stats < timings.txt``.
"""

from __future__ import annotations

import sys

import numpy as np


def mean_3sigma(samples) -> tuple[float, float]:
    v = np.asarray(list(samples), dtype=np.float64)
    return float(v.mean()), float(3.0 * v.std())


def main() -> None:
    vals = [float(x) for x in sys.stdin.read().split()]
    mu, s3 = mean_3sigma(vals)
    print(f"{mu} {s3}")


if __name__ == "__main__":
    main()
