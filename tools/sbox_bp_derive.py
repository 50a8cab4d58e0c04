"""Derive a Boyar-Peralta-class AES S-box circuit (~113 gates).

The BP forward S-box (Boyar-Peralta 2011, "A depth-16 circuit for the
AES S-box") is structured as top-linear (23 XOR) -> shared nonlinear
middle (30 XOR + 32 AND) -> bottom-linear (~26 XOR + 4 XNOR).  The top
and middle sections are hardcoded here from the published structure; the
bottom LINEAR layer is *derived* by solving, over GF(2), for each output
bit as an affine combination of the 18 middle products z0..z17 — so any
transcription slip in the bottom layer is impossible, and a slip in the
top/middle makes the solve fail loudly (the z's then don't span the
outputs).

Also solves for S(x) ^ 0x63 (the affine constant folded into the round
keys, which MixColumns preserves: MC of an all-c state is all-c), which
makes the bottom layer constant-free if the solve's constant column
vanishes.

Run: python tools/sbox_bp_derive.py
Prints the solved bottom matrix + constants and verifies exhaustively.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from c_lwe_snarks_tpu.oracle import aes as host_aes

MASK = (1 << 256) - 1


def bitsliced_inputs():
    """planes[k] = 256-bit mask of inputs whose bit k is set (LSB first)."""
    planes = [0] * 8
    for j in range(256):
        for k in range(8):
            if (j >> k) & 1:
                planes[k] |= 1 << j
    return planes


def middle(U):
    """U[0..7] = BP's U0..U7 (U0 most significant).  Returns (y, t, z)."""
    U0, U1, U2, U3, U4, U5, U6, U7 = U
    y = {}
    y[14] = U3 ^ U5
    y[13] = U0 ^ U6
    y[9] = U0 ^ U3
    y[8] = U0 ^ U5
    t0 = U1 ^ U2
    y[1] = t0 ^ U7
    y[4] = y[1] ^ U3
    y[12] = y[13] ^ y[14]
    y[2] = y[1] ^ U0
    y[5] = y[1] ^ U6
    y[3] = y[5] ^ y[8]
    t1 = U4 ^ y[12]
    y[15] = t1 ^ U5
    y[20] = t1 ^ U1
    y[6] = y[15] ^ U7
    y[10] = y[15] ^ t0
    y[11] = y[20] ^ y[9]
    y[7] = U7 ^ y[11]
    y[17] = y[10] ^ y[11]
    y[19] = y[10] ^ y[8]
    y[16] = t0 ^ y[11]
    y[21] = y[13] ^ y[16]
    y[18] = U0 ^ y[16]

    t2 = y[12] & y[15]
    t3 = y[3] & y[6]
    t4 = t3 ^ t2
    t5 = y[4] & U7
    t6 = t5 ^ t2
    t7 = y[13] & y[16]
    t8 = y[5] & y[1]
    t9 = t8 ^ t7
    t10 = y[2] & y[7]
    t11 = t10 ^ t7
    t12 = y[9] & y[11]
    t13 = y[14] & y[17]
    t14 = t13 ^ t12
    t15 = y[8] & y[10]
    t16 = t15 ^ t12
    t17 = t4 ^ t14
    t18 = t6 ^ t16
    t19 = t9 ^ t14
    t20 = t11 ^ t16
    t21 = t17 ^ y[20]
    t22 = t18 ^ y[19]
    t23 = t19 ^ y[21]
    t24 = t20 ^ y[18]
    t25 = t21 ^ t22
    t26 = t21 & t23
    t27 = t24 ^ t26
    t28 = t25 & t27
    t29 = t28 ^ t22
    t30 = t23 ^ t24
    t31 = t22 ^ t26
    t32 = t31 & t30
    t33 = t32 ^ t24
    t34 = t23 ^ t33
    t35 = t27 ^ t33
    t36 = t24 & t35
    t37 = t36 ^ t34
    t38 = t27 ^ t36
    t39 = t29 & t38
    t40 = t25 ^ t39
    t41 = t40 ^ t37
    t42 = t29 ^ t33
    t43 = t29 ^ t40
    t44 = t33 ^ t37
    t45 = t42 ^ t41
    z = [
        t44 & y[15],   # z0
        t37 & y[6],    # z1
        t33 & U7,      # z2
        t43 & y[16],   # z3
        t40 & y[1],    # z4
        t29 & y[7],    # z5
        t42 & y[11],   # z6
        t45 & y[17],   # z7
        t41 & y[10],   # z8
        t44 & y[12],   # z9
        t37 & y[3],    # z10
        t33 & y[4],    # z11
        t43 & y[13],   # z12
        t40 & y[5],    # z13
        t29 & y[2],    # z14
        t42 & y[9],    # z15
        t45 & y[14],   # z16
        t41 & y[8],    # z17
    ]
    return y, z


def solve_gf2(cols, target):
    """Solve target = xor of a subset of cols (each a 256-bit int) + const.

    cols: list of 256-bit ints.  Returns (selected indices, const) or
    None.  Gaussian elimination over GF(2) with the 256 sample rows.
    """
    ncols = len(cols)
    # Column-space reduction keyed on highest set bit: find a subset S
    # with xor_{i in S} col_i (+ const * all-ones) == target.
    work = [(cols[i], 1 << i) for i in range(ncols)] + [(MASK, 1 << ncols)]
    red = {}
    for val, sel in work:
        v, s = val, sel
        while v:
            h = v.bit_length() - 1
            if h in red:
                v ^= red[h][0]
                s ^= red[h][1]
            else:
                red[h] = (v, s)
                break
    v, s = target, 0
    while v:
        h = v.bit_length() - 1
        if h not in red:
            return None
        v ^= red[h][0]
        s ^= red[h][1]
    idxs = [i for i in range(ncols) if (s >> i) & 1]
    const = (s >> ncols) & 1
    return idxs, const


def main():
    planes = bitsliced_inputs()
    sb = host_aes.sbox()
    out_planes = [0] * 8
    for j in range(256):
        for k in range(8):
            if (sb[j] >> k) & 1:
                out_planes[k] |= 1 << j

    for order in ("msb", "lsb"):
        if order == "msb":
            U = [planes[7 - i] for i in range(8)]  # U0 = MSB
        else:
            U = planes[:]
        try:
            y, z = middle(U)
        except Exception as e:
            print(order, "middle failed:", e)
            continue
        ok = True
        sols = []
        for k in range(8):
            # S_k: BP S0 = MSB -> out plane 7-k for msb order
            tgt = out_planes[7 - k] if order == "msb" else out_planes[k]
            sol = solve_gf2(z, tgt)
            sols.append(sol)
            if sol is None:
                ok = False
        print(f"order={order}: solvable={ok}")
        if ok:
            nconst = sum(c for _, c in sols)
            print(f"  constants (S(x)): {[c for _, c in sols]}")
            for k, (idxs, c) in enumerate(sols):
                print(f"  S{k} = {'~' if c else ''} z{idxs}")
            # folded variant: S(x) ^ 0x63
            print("  folded S^0x63 constants:",
                  [(c ^ ((0x63 >> (7 - k)) & 1)) for k, (_, c) in enumerate(sols)])
            return


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# Bottom-layer SLP minimization (offline search; winner frozen in
# ops/sbox_bp.py).
# ---------------------------------------------------------------------------

BOTTOM = [  # solved above: S_k (MSB-first BP order) as z-index sets
    [3, 4, 6, 7, 9, 10, 15, 16],
    [0, 1, 6, 7, 9, 10, 15, 16],
    [0, 2, 6, 8, 12, 14, 15, 17],
    [0, 1, 3, 4, 9, 10, 15, 16],
    [1, 2, 4, 5, 9, 10, 15, 16],
    [0, 2, 3, 4, 7, 8, 10, 11, 12, 14, 15, 16],
    [4, 5, 7, 8, 12, 13, 15, 16],
    [0, 2, 3, 5, 12, 13, 15, 16],
]


def greedy_cost(seed=None, eps=0.0):
    import numpy as np
    rng = None if seed is None else np.random.default_rng(seed)
    sets = [set(s) for s in BOTTOM]
    pairs = 0
    nxt = 100
    while True:
        counts = {}
        for s in sets:
            ss = sorted(s)
            for i in range(len(ss)):
                for j in range(i + 1, len(ss)):
                    p = (ss[i], ss[j])
                    counts[p] = counts.get(p, 0) + 1
        if not counts or max(counts.values()) < 2:
            break
        n = max(counts.values())
        if rng is None:
            best = max(counts.items(), key=lambda kv: kv[1])[0]
        else:
            lo = n - 1 if (eps and n > 2 and rng.random() < eps) else n
            tied = sorted(p for p, c in counts.items() if c >= lo)
            best = tied[int(rng.integers(len(tied)))]
        a, b = best
        pairs += 1
        for s in sets:
            if a in s and b in s:
                s.discard(a)
                s.discard(b)
                s.add(nxt)
        nxt += 1
    return pairs + sum(len(s) - 1 for s in sets)


def search_bottom():
    best = (1 << 30, None)
    for seed in range(200):
        for eps in (0.0, 0.15, 0.3):
            c = greedy_cost(seed, eps)
            if c < best[0]:
                best = (c, (seed, eps))
    print("deterministic:", greedy_cost(None))
    print("best:", best)


if __name__ == "__main__" and "--bottom" in sys.argv:
    search_bottom()


def bp_slp(targets, nin=18, restarts=40, verbose=False):
    """Boyar-Peralta SLP heuristic with exact distances over GF(2)^nin.

    dist[] over the whole 2^nin space is one vectorized BFS per round;
    a candidate new base element v scores sum_t min(d(t), d(t^v)+1),
    tie-break by maximizing the norm of the new distance vector (the
    published heuristic), further ties broken at random per restart.
    Returns (n_xors, pair_program) where pair_program is a list of
    (i, j) indices into base-so-far (0..nin-1 = inputs).
    """
    import numpy as np

    tmask = [sum(1 << i for i in t) for t in targets]

    def dist_table(base):
        INF = 127
        d = np.full(1 << nin, INF, np.int8)
        d[0] = 0
        frontier = [0]
        dist = 0
        reached = np.zeros(1 << nin, bool)
        reached[0] = True
        cur = np.array([0], np.int64)
        while cur.size:
            dist += 1
            nxt = (cur[:, None] ^ np.array(base, np.int64)[None, :]).ravel()
            nxt = np.unique(nxt)
            nxt = nxt[~reached[nxt]]
            reached[nxt] = True
            d[nxt] = dist
            cur = nxt
        return d

    best_overall = (1 << 30, None, None)
    for r in range(restarts):
        rng = np.random.default_rng(r)
        base = [1 << i for i in range(nin)]
        prog = []
        # terminate when every target IS a base element (dist 1): every
        # added base element is one emitted XOR, so |prog| is the cost.
        while True:
            d = dist_table(base)
            if all(d[m] <= 1 for m in tmask):
                break
            nb = len(base)
            barr = np.array(base, np.int64)
            tarr = np.array(tmask, np.int64)
            dt = d[tarr].astype(np.int32)
            best = None
            for i in range(nb):
                vs = barr[i] ^ barr[i + 1:]
                for jj, v in enumerate(vs):
                    if v == 0 or d[v] == 1:
                        continue  # zero or already in the base
                    nd = np.minimum(dt, d[tarr ^ v].astype(np.int32) + 1)
                    score = int(nd.sum())
                    norm = int((nd.astype(np.int64) ** 2).sum())
                    key = (score, -norm)
                    if best is None or key < best[0] or (
                        key == best[0] and rng.random() < 0.5
                    ):
                        best = (key, (i, i + 1 + jj, int(v)))
            i, j, v = best[1]
            prog.append((i, j))
            base.append(v)
        total = len(prog)
        if total < best_overall[0]:
            best_overall = (total, list(prog), list(base))
            if verbose:
                print(f"restart {r}: {total} xors")
    return best_overall


if __name__ == "__main__" and "--slp" in sys.argv:
    n, prog, base = bp_slp([set(b) for b in BOTTOM], verbose=True)
    print("bp heuristic bottom xors:", n)
    print("program (pairs of base indices; base 0..17 = z0..z17):")
    print(prog)
    tmask = [sum(1 << i for i in t) for t in BOTTOM]
    print("target base indices:", [base.index(m) for m in tmask])
