"""Composite-field (tower) AES S-box circuit for bitsliced evaluation.

The x^254 addition-chain S-box costs ~780 gates per 8-plane set; the
classic tower-field decomposition GF(2^8) ≅ GF(((2^2)^2)^2) (Canright-
style) computes the inverse in ~130 gates plus two 8x8 GF(2) basis
changes (~60 XORs).  Everything here is *derived*, not transcribed:

* tower bases: GF(4) = GF(2)[w]/(w^2+w+1); GF(16) = GF(4)[z]/(z^2+z+N);
  GF(256) = GF(16)[y]/(y^2+y+nu), with N, nu found by irreducibility
  search at import time;
* the isomorphism to the AES field is found by locating a root of the
  Rijndael polynomial in the tower field and mapping powers;
* the whole construction self-checks exhaustively (all 256 inputs)
  against the generated-table oracle at import time.

Gate formulas (2-bit elements a = a0 + a1*w):
  mul2:  p0=a0b0, p1=a1b1, p2=(a0^a1)(b0^b1); out = (p0^p1, p2^p0)
  sq2 == inv2: (a0^a1, a1)
  scale-by-w: (a1, a0^a1)
GF(16) (a*z + b), z^2 = z + N:  Karatsuba 3x mul2; inverse via
  delta = a^2*N + ab + b^2,  inv = (a*d) z + ((a+b)*d),  d = delta^-1.
GF(256) (A*y + B), y^2 = y + nu: same shape one level up.
"""

from __future__ import annotations

import numpy as np

from ..oracle import aes as host_aes

# ---------------------------------------------------------------------------
# Host-side tower arithmetic on small ints (bit i of GF(4): a0 + a1 w).
# ---------------------------------------------------------------------------


def _mul2(a: int, b: int) -> int:
    a0, a1 = a & 1, a >> 1
    b0, b1 = b & 1, b >> 1
    p0, p1, p2 = a0 & b0, a1 & b1, (a0 ^ a1) & (b0 ^ b1)
    return (p0 ^ p1) | ((p2 ^ p0) << 1)


def _sq2(a: int) -> int:  # also the inverse in GF(4)
    a0, a1 = a & 1, a >> 1
    return (a0 ^ a1) | (a1 << 1)


def _mul4(a: int, b: int, N: int) -> int:
    ah, al = a >> 2, a & 3
    bh, bl = b >> 2, b & 3
    e = _mul2(ah, bh)
    f = _mul2(al, bl)
    g = _mul2(ah ^ al, bh ^ bl)
    hi = g ^ f
    lo = _mul2(e, N) ^ f
    return (hi << 2) | lo


def _sq4(a: int, N: int) -> int:
    return _mul4(a, a, N)


def _inv4(a: int, N: int) -> int:
    ah, al = a >> 2, a & 3
    delta = _mul2(_sq2(ah), N) ^ _mul2(ah, al) ^ _sq2(al)
    d = _sq2(delta)  # inverse in GF(4)
    return (_mul2(ah, d) << 2) | _mul2(ah ^ al, d)


def _mul8(a: int, b: int, N: int, nu: int) -> int:
    ah, al = a >> 4, a & 15
    bh, bl = b >> 4, b & 15
    e = _mul4(ah, bh, N)
    f = _mul4(al, bl, N)
    g = _mul4(ah ^ al, bh ^ bl, N)
    hi = g ^ f
    lo = _mul4(e, nu, N) ^ f
    return (hi << 4) | lo


def _inv8(a: int, N: int, nu: int) -> int:
    ah, al = a >> 4, a & 15
    delta = _mul4(_sq4(ah, N), nu, N) ^ _mul4(ah, al, N) ^ _sq4(al, N)
    d = _inv4(delta, N)
    return (_mul4(ah, d, N) << 4) | _mul4(ah ^ al, d, N)


def _find_params():
    # N in GF(4)\{0,1} with z^2+z+N irreducible (no root in GF(4))
    for N in (2, 3):
        if all(_mul2(z, z) ^ z != N for z in range(4)):
            break
    else:  # pragma: no cover
        raise AssertionError("no irreducible N")
    # nu in GF(16) with y^2+y+nu irreducible over GF(16)
    for nu in range(1, 16):
        if all(_mul4(y, y, N) ^ y != nu for y in range(16)):
            break
    else:  # pragma: no cover
        raise AssertionError("no irreducible nu")
    return N, nu


def enumerate_variants():
    """All valid tower constructions (N, nu, root) — the search space for
    the S-box gate-count optimizer (ops/sbox_opt.py).

    N ranges over GF(4) elements making z^2+z+N irreducible, nu over
    GF(16) elements making y^2+y+nu irreducible over GF(16), and root
    over the 8 conjugate embeddings of the Rijndael field into the tower.
    Each choice yields different basis-change matrices M_IN / M_OUT with
    different XOR-circuit costs; the tower inversion core is isomorphic
    across all of them.
    """
    out = []
    for N in (2, 3):
        if any(_mul2(z, z) ^ z == N for z in range(4)):
            continue
        for nu in range(1, 16):
            if any(_mul4(y, y, N) ^ y == nu for y in range(16)):
                continue
            for r in _find_roots(N, nu):
                out.append((N, nu, r))
    return out


def _find_roots(N: int, nu: int):
    """All roots of the Rijndael polynomial in the tower field."""
    roots = []
    for r in range(2, 256):
        pw = [1]
        for _ in range(8):
            pw.append(_mul8(pw[-1], r, N, nu))
        if pw[8] ^ pw[4] ^ pw[3] ^ pw[1] ^ 1 == 0:
            roots.append(r)
    return roots


def _root_matrix(N: int, nu: int, r: int) -> np.ndarray:
    """to_tower matrix for root r: column i = r^i in tower coordinates."""
    pw = [1]
    for _ in range(7):
        pw.append(_mul8(pw[-1], r, N, nu))
    M = np.zeros((8, 8), dtype=np.uint8)
    for i in range(8):
        for k in range(8):
            M[k, i] = (pw[i] >> k) & 1
    return M


def _find_isomorphism(N: int, nu: int):
    """First root of the Rijndael polynomial in the tower -> basis map."""
    roots = _find_roots(N, nu)
    if not roots:  # pragma: no cover
        raise AssertionError("no root found")
    return _root_matrix(N, nu, roots[0])


def _gf2_inv(M: np.ndarray) -> np.ndarray:
    n = M.shape[0]
    A = np.concatenate([M.copy(), np.eye(n, dtype=np.uint8)], axis=1)
    for col in range(n):
        piv = next(r for r in range(col, n) if A[r, col])
        A[[col, piv]] = A[[piv, col]]
        for r in range(n):
            if r != col and A[r, col]:
                A[r] ^= A[col]
    return A[:, n:]


def build_matrices(N: int, nu: int, r: int):
    """(M_IN, M_OUT) for one tower variant, exhaustively self-checked.

    M_IN maps AES bits to tower coordinates; M_OUT composes the inverse
    map with the AES affine layer, so S(x) = M_OUT @ inv8(M_IN @ x) ^ 0x63.
    """
    M = _root_matrix(N, nu, r)
    Minv = _gf2_inv(M)
    # affine: s_i = b_i ^ b_{(i+4)%8} ^ b_{(i+5)%8} ^ b_{(i+6)%8} ^ b_{(i+7)%8}
    AFF = np.zeros((8, 8), dtype=np.uint8)
    for i in range(8):
        for d in (0, 4, 5, 6, 7):
            AFF[i, (i + d) % 8] ^= 1
    M_out = (AFF @ Minv) % 2

    def apply(mat, v):
        out = 0
        for k in range(8):
            bit = 0
            for i in range(8):
                bit ^= mat[k, i] & (v >> i)
            out |= (bit & 1) << k
        return out

    # exhaustive self-check of the whole pipeline against the table oracle
    sb = host_aes.sbox()
    for x in range(256):
        s = apply(M_out, _inv8(apply(M, x), N, nu)) ^ 0x63
        if s != sb[x]:  # pragma: no cover
            raise AssertionError(f"tower sbox mismatch at {x}: {s} != {sb[x]}")
    return M.astype(np.uint8), M_out.astype(np.uint8)


def _build():
    N, nu = _find_params()
    M, M_out = build_matrices(N, nu, _find_roots(N, nu)[0])
    return N, nu, M, M_out


_N, _NU, _M_IN, _M_OUT = _build()


# ---------------------------------------------------------------------------
# Bitsliced circuit (mechanical transcription of the host formulas onto
# lists of identically-shaped uint32 arrays; index = bit).
# ---------------------------------------------------------------------------


def _bmul2(a, b):
    p0 = a[0] & b[0]
    p1 = a[1] & b[1]
    p2 = (a[0] ^ a[1]) & (b[0] ^ b[1])
    return [p0 ^ p1, p2 ^ p0]


def _bsq2(a):
    return [a[0] ^ a[1], a[1]]


def _bscale2(a, c: int):
    """Multiply by the GF(4) constant c (c in {1, 2=w, 3=w+1})."""
    if c == 1:
        return a
    if c == 2:  # w * (a0 + a1 w) = a1 + (a0 ^ a1) w
        return [a[1], a[0] ^ a[1]]
    if c == 3:  # (w+1) * a = a + w*a
        return [a[0] ^ a[1], a[0]]
    raise ValueError(c)


def _bmul4(a, b, N=None):
    N = _N if N is None else N
    ah, al = a[2:], a[:2]
    bh, bl = b[2:], b[:2]
    e = _bmul2(ah, bh)
    f = _bmul2(al, bl)
    g = _bmul2([ah[0] ^ al[0], ah[1] ^ al[1]], [bh[0] ^ bl[0], bh[1] ^ bl[1]])
    hi = [g[0] ^ f[0], g[1] ^ f[1]]
    en = _bscale2(e, N)
    lo = [en[0] ^ f[0], en[1] ^ f[1]]
    return lo + hi


def _bsq4(a, N=None):
    N = _N if N is None else N
    ah, al = a[2:], a[:2]
    # (ah z + al)^2 = ah^2 z^2 + al^2 = ah^2 z + (ah^2 N + al^2)
    sh = _bsq2(ah)
    sl = _bsq2(al)
    shn = _bscale2(sh, N)
    return [shn[0] ^ sl[0], shn[1] ^ sl[1]] + sh


def _bscale4(a, c: int, N=None):
    """Multiply by a GF(16) constant via two mul2-by-constant column ops."""
    N = _N if N is None else N
    ch, cl = c >> 2, c & 3
    ah, al = a[2:], a[:2]
    # (ah z + al)(ch z + cl) = (ah cl + al ch + ah ch) z + (ah ch N + al cl)
    def cmul(x, k):
        if k == 0:
            return None
        return _bscale2(x, k)

    hh = cmul(ah, ch)
    hl = cmul(ah, cl)
    lh = cmul(al, ch)
    ll = cmul(al, cl)

    def x2(p, q):
        if p is None:
            return q
        if q is None:
            return p
        return [p[0] ^ q[0], p[1] ^ q[1]]

    hi = x2(x2(hl, lh), hh)
    hhn = None if hh is None else _bscale2(hh, N)
    lo = x2(hhn, ll)
    z = None
    if hi is None or lo is None:
        zero = a[0] ^ a[0]
        z = [zero, zero]
    return (lo if lo is not None else z) + (hi if hi is not None else z)


def _binv4(a, N=None):
    N = _N if N is None else N
    ah, al = a[2:], a[:2]
    t = _bmul2(ah, al)
    d0 = _bscale2(_bsq2(ah), N)
    d1 = _bsq2(al)
    delta = [d0[0] ^ t[0] ^ d1[0], d0[1] ^ t[1] ^ d1[1]]
    d = _bsq2(delta)
    hi = _bmul2(ah, d)
    lo = _bmul2([ah[0] ^ al[0], ah[1] ^ al[1]], d)
    return lo + hi


def _binv8(a, N=None, nu=None):
    N = _N if N is None else N
    nu = _NU if nu is None else nu
    ah, al = a[4:], a[:4]
    t = _bmul4(ah, al, N)
    d0 = _bscale4(_bsq4(ah, N), nu, N)
    d1 = _bsq4(al, N)
    delta = [d0[k] ^ t[k] ^ d1[k] for k in range(4)]
    d = _binv4(delta, N)
    hi = _bmul4(ah, d, N)
    lo = _bmul4([ah[k] ^ al[k] for k in range(4)], d, N)
    return lo + hi


def _bmatrix(M: np.ndarray, x):
    out = []
    for k in range(8):
        acc = None
        for i in range(8):
            if M[k, i]:
                acc = x[i] if acc is None else acc ^ x[i]
        assert acc is not None
        out.append(acc)
    return out


def sbox_tower_bits(x, variant=None):
    """Bitsliced AES S-box via the tower field (~190 gates).

    x: list of 8 identically-shaped uint32 arrays (LSB first).
    variant: optional (N, nu, M_IN, M_OUT) from build_matrices — lets the
    gate optimizer search over tower constructions.
    """
    if variant is None:
        N, nu, M_in, M_out = _N, _NU, _M_IN, _M_OUT
    else:
        N, nu, M_in, M_out = variant
    t = _bmatrix(M_in, x)
    inv = _binv8(t, N, nu)
    s = _bmatrix(M_out, inv)
    out = []
    for i in range(8):
        v = s[i]
        if (0x63 >> i) & 1:
            v = v ^ np.uint32(0xFFFFFFFF)
        out.append(v)
    return out
