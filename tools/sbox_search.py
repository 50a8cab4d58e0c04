"""Offline search for the minimal-gate S-box circuit.

Scans gf_tower.enumerate_variants() x greedy tie-break seeds and prints
the best (N, nu, root, seed) to freeze into ops/sbox_opt.py's _BEST.
Run: python tools/sbox_search.py [restarts]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from c_lwe_snarks_tpu.ops import sbox_opt  # noqa: E402

if __name__ == "__main__":
    restarts = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    t0 = time.time()
    count, params = sbox_opt.search_best(restarts=restarts, verbose=True)
    print(f"BEST: {count} gates, {params} ({time.time() - t0:.0f}s)")
