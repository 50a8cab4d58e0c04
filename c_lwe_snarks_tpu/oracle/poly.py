"""Host oracle for Z_p polynomial arithmetic (FLINT nmod_poly stand-in).

Coefficient vectors are numpy uint64/int lists mod p = 2^32 - 5.  Oracle
simplicity beats speed here (toy params only); the production path is
``c_lwe_snarks_tpu.ops.ntt``.  Semantics mirror the FLINT call sites:

* ``poly_import``/``poly_export``: flat uint64-LE coefficient buffers,
  values reduced mod p on import like nmod_poly_set_coeff_ui
  (src/ssp.c:18-34).
* ``poly_div`` is FLINT's nmod_poly_div = quotient of euclidean division
  (exact for valid witnesses: v^2 - 1 = h*t, src/snark.c:166-169).
"""

from __future__ import annotations

import numpy as np

P = (1 << 32) - 5


def normalize(coeffs: list[int]) -> list[int]:
    c = [int(x) % P for x in coeffs]
    while c and c[-1] == 0:
        c.pop()
    return c


def poly_add(a: list[int], b: list[int]) -> list[int]:
    n = max(len(a), len(b))
    return normalize([(a[i] if i < len(a) else 0) + (b[i] if i < len(b) else 0) for i in range(n)])


def poly_sub(a: list[int], b: list[int]) -> list[int]:
    n = max(len(a), len(b))
    return normalize([(a[i] if i < len(a) else 0) - (b[i] if i < len(b) else 0) for i in range(n)])


def poly_scalar_mul(a: list[int], c: int) -> list[int]:
    return normalize([x * c for x in a])


def poly_mul(a: list[int], b: list[int]) -> list[int]:
    if not a or not b:
        return []
    out = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        if x:
            for j, y in enumerate(b):
                out[i + j] += x * y
    return normalize(out)


def poly_div(a: list[int], b: list[int]) -> list[int]:
    """Quotient of a / b over Z_p (monic-or-not b)."""
    a = normalize(a)
    b = normalize(b)
    assert b, "division by zero polynomial"
    inv_lead = pow(b[-1], P - 2, P)
    rem = list(a)
    q = [0] * max(0, len(a) - len(b) + 1)
    for k in range(len(a) - len(b), -1, -1):
        coef = rem[k + len(b) - 1] * inv_lead % P
        q[k] = coef
        if coef:
            for j in range(len(b)):
                rem[k + j] = (rem[k + j] - coef * b[j]) % P
    return normalize(q)


def poly_eval(a: list[int], x: int) -> int:
    """Horner evaluation mod p (nmod_poly_evaluate_nmod)."""
    acc = 0
    for c in reversed(a):
        acc = (acc * x + c) % P
    return acc


def poly_export(coeffs: list[int], d: int) -> bytes:
    """d uint64-LE coefficients (src/ssp.c:18-26)."""
    arr = np.zeros(d, dtype=np.uint64)
    arr[: len(coeffs)] = np.array(coeffs[:d], dtype=np.uint64)
    return arr.tobytes()


def poly_import(buf: bytes, d: int) -> list[int]:
    """Read d uint64-LE words, reduce mod p (src/ssp.c:28-34)."""
    arr = np.frombuffer(buf[: 8 * d], dtype=np.uint64)
    return normalize([int(x) % P for x in arr])
