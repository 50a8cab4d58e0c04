"""Host oracle for the Regev-LWE layer (python-int arithmetic).

Bit-exact model of src/lwe.c with the documented deviations:

* ``modq`` == reduction mod 2**704 (the reference macro's *effective*
  semantics, src/lwe.h:107-118 / SURVEY §2 quirk 1).  We reduce properly
  even when intermediate values go negative (smudging can make the
  reference's b-component a negative unreduced integer with probability
  ~2^-32; see DEVIATIONS.md).
* Encryption noise is always non-negative: the reference computes
  ``c[N] = e*p`` *before* flipping e's sign, so the flip is dead code
  (src/lwe.c:85-87 / quirk 2).  We reproduce the PRG-byte consumption of
  the dead sign draw so downstream entropy consumption matches.
* Only the a-vector draws from the seeded CRS stream; errors/keys/smudging
  come from an ``EntropySource`` (quirk 3).

A ciphertext is ``(a, b)`` with ``a`` a length-n list of 736-bit ints and
``b = <sk, a> + p*e + m  mod 2**704``.  The compressed form stores only
``b`` as 92 LE bytes (top 4 always zero) — src/lwe.c:115-126.
"""

from __future__ import annotations

import dataclasses

from ..utils.params import Params
from .prg import AesCtrStream, EntropySource


@dataclasses.dataclass
class Ciphertext:
    a: list[int]  # length n, each < 2**logq
    b: int  # < 2**q_eff_bits


def modq(x: int, params: Params) -> int:
    # q_eff is 2^704, so reduction is a mask; Python's & on negative ints
    # yields the non-negative residue, matching proper mod semantics.
    return x & (params.q_eff - 1)


def key_gen(params: Params, entropy: EntropySource) -> list[int]:
    """sk = n uniform logq-bit values (src/lwe.c:30-34)."""
    return [entropy.urandomb(params.logq) for _ in range(params.n)]


def errdist_uniform(params: Params, entropy: EntropySource) -> int:
    """e uniform in [0, 2^(log_sigma+3)) (src/lwe.c:60-63)."""
    return entropy.urandomb(params.log_sigma + 3)


def expand_a(prg: AesCtrStream, params: Params) -> list[int]:
    """n full-width samples from the seeded stream (one ciphertext's worth).

    One batched read of n * logq_bytes keystream bytes (= CTR_CT), split
    little-endian — byte-identical to n sequential mpz2_urandomb calls.
    """
    nb = params.logq_bytes
    buf = prg.gen(nb * params.n)
    return [
        int.from_bytes(buf[i * nb : (i + 1) * nb], "little") for i in range(params.n)
    ]


def encrypt(
    params: Params,
    prg: AesCtrStream,
    sk: list[int],
    m: int,
    entropy: EntropySource,
) -> Ciphertext:
    """regev_encrypt2 (src/lwe.c:78-97)."""
    assert 0 <= m < params.p
    e = errdist_uniform(params, entropy)
    b = e * params.p
    entropy.random_sign()  # dead sign flip: consumes entropy, no effect
    a = expand_a(prg, params)
    b += sum(ai * ski for ai, ski in zip(a, sk))
    b = modq(b, params)
    b = modq(b + m, params)
    return Ciphertext(a=a, b=b)


def decrypt(params: Params, sk: list[int], ct: Ciphertext) -> int:
    """regev_decrypt (src/lwe.c:105-111): (b - <a, sk> mod 2^704) mod p."""
    dot = modq(sum(ai * ski for ai, ski in zip(ct.a, sk)), params)
    return (ct.b - dot) % params.p


def smudge(params: Params, ct: Ciphertext, entropy: EntropySource) -> None:
    """ct_smudge (src/lwe.c:65-76): b += ±(uniform log_smudging bits)*p."""
    s = entropy.urandomb(params.log_smudging)
    s *= entropy.random_sign()
    ct.b = modq(ct.b + s * params.p, params)


def ct_export(params: Params, ct: Ciphertext) -> bytes:
    """ct_export (src/lwe.c:115-119): only b, 92 LE bytes."""
    return ct.b.to_bytes(params.ct_bytes, "little")


def ct_import(params: Params, prg: AesCtrStream, buf: bytes) -> Ciphertext:
    """ct_import (src/lwe.c:122-126): re-expand a from the stream."""
    a = expand_a(prg, params)
    return Ciphertext(a=a, b=int.from_bytes(buf, "little"))


def ct_zero(params: Params) -> Ciphertext:
    return Ciphertext(a=[0] * params.n, b=0)


def ct_addmul_ui(params: Params, rop: Ciphertext, ct: Ciphertext, c: int) -> None:
    """rop += c * ct coordinate-wise mod 2^704 (src/lwe.c:141-149)."""
    assert 0 <= c < params.p
    for i in range(params.n):
        rop.a[i] = modq(rop.a[i] + ct.a[i] * c, params)
    rop.b = modq(rop.b + ct.b * c, params)


def ct_mul_ui(params: Params, ct: Ciphertext, c: int) -> Ciphertext:
    assert 0 <= c < params.p
    return Ciphertext(
        a=[modq(ai * c, params) for ai in ct.a],
        b=modq(ct.b * c, params),
    )


def ct_add(params: Params, x: Ciphertext, y: Ciphertext) -> Ciphertext:
    return Ciphertext(
        a=[modq(a + b, params) for a, b in zip(x.a, y.a)],
        b=modq(x.b + y.b, params),
    )


def eval_poly(
    params: Params,
    prg: AesCtrStream,
    compressed: list[bytes],
    coeffs: list[int],
    d: int,
) -> Ciphertext:
    """Homomorphic polynomial evaluation (src/lwe.c:176-186).

    rop = sum_i coeff_i * ct_i where ct_i is re-expanded from the stream.
    The stream must already be positioned at the section start.
    """
    from .. import native

    if (
        d > 0
        and params.ct_bytes == 92
        and params.logq_bytes == 92
        and native.available()
    ):
        # Native hot loop (native/hostlib): bit-exact vs the pure path
        # (tests/test_native.py) and ~20x faster — keeps release-scale
        # oracle conformance runs feasible.  Consumes the same d*CTR_CT
        # stream bytes; the stream position advances to match.
        import numpy as np

        b_rows = np.zeros((d, 92), np.uint8)
        for i in range(min(d, len(compressed))):
            b_rows[i] = np.frombuffer(compressed[i], np.uint8)
        cf = np.zeros(d, np.uint32)
        k = min(len(coeffs), d)
        cf[:k] = coeffs[:k]
        out = native.eval_poly(prg.key, prg.nonce, prg.pos, b_rows, cf, params.n)
        prg.seek(prg.pos + d * params.ctr_ct)
        rows = [
            int.from_bytes(out[j].tobytes(), "little")
            for j in range(params.n + 1)
        ]
        return Ciphertext(a=rows[: params.n], b=rows[params.n])

    rop = ct_zero(params)
    for i in range(d):
        ct = ct_import(params, prg, compressed[i])
        ct_addmul_ui(params, rop, ct, coeffs[i] if i < len(coeffs) else 0)
    return rop
