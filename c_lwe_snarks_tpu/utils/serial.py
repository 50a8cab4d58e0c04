"""Persistence: byte formats for CRS / VRS / proof / SSP instances.

The reference's serialization layer is ct_export/ct_import — only the
92-byte b-component is stored, the a-vector is re-expanded from the CRS
seed (src/lwe.c:115-126) — plus mmap-backed ciphertext files in
benchmark_eval (src/benchmark_eval.c:44-66) and the commented-out
CRS/SSP persistence in benchmark_snark (src/benchmark_snark.c:34-53).
This module states those as explicit formats:

* CRS file = 40-byte seed || s-section (d x 92) || as-section (d x 92)
  || t (92) || v-section ((m-1) x 92), LE bytes — 1471x compression;
  loading re-derives everything else from counter arithmetic.
* VRS (designated-verifier trapdoor, src/snark.h:23-29) = alpha, beta, s
  as 8-byte LE words || sk (n x 92).
* Proof = 5 full ciphertexts h, h^, v^, v_w, b_w (src/snark.h:14-20),
  each (n+1) x 92 LE bytes (proof ciphertexts are linear combinations,
  not PRG-fresh, so their a-parts cannot be compressed).
* SSP buffer: byte-compatible with the reference's flat layout
  (src/ssp.h:6-9): t(x) at offset 0, v_i(x) at 8*d*(i+1); each
  polynomial d uint64-LE coefficients; total 8*d*(m+1) bytes (the
  reference's SSP_SIZE carries +2 polynomials of dead slack).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..models import lwe as tlwe
from ..models import snark as tsnark
from ..models import ssp as tssp
from .params import Params


def _rows92(rows: jnp.ndarray, params: Params) -> np.ndarray:
    """uint8 [..., 88] device rows -> [..., 92] numpy (stored format)."""
    r = np.asarray(rows, dtype=np.uint8)
    pad = params.ct_bytes - r.shape[-1]
    if pad:
        r = np.pad(r, [(0, 0)] * (r.ndim - 1) + [(0, pad)])
    return r


# --------------------------------------------------------------------------
# CRS
# --------------------------------------------------------------------------


def crs_to_bytes(crs: tsnark.CRSDev, params: Params) -> bytes:
    parts = [bytes(crs.seed)]
    for rows in (crs.b_s, crs.b_as, crs.b_t[None], crs.b_v):
        parts.append(_rows92(rows, params).tobytes())
    return b"".join(parts)


def crs_from_bytes(buf: bytes, params: Params) -> tsnark.CRSDev:
    d, m, cb = params.d, params.m, params.ct_bytes
    expect = 40 + cb * (2 * d + 1 + (m - 1))
    assert len(buf) == expect, (len(buf), expect)
    seed = buf[:40]
    arr = np.frombuffer(buf[40:], dtype=np.uint8).reshape(-1, cb)
    b_s = jnp.asarray(arr[:d, :88])
    b_as = jnp.asarray(arr[d : 2 * d, :88])
    b_t = jnp.asarray(arr[2 * d, :88])
    b_v = jnp.asarray(arr[2 * d + 1 :, :88])
    return tsnark.CRSDev(seed=seed, b_s=b_s, b_as=b_as, b_t=b_t, b_v=b_v)


# --------------------------------------------------------------------------
# VRS (trapdoor) — keep this file designated-verifier-private.
# --------------------------------------------------------------------------


def vrs_to_bytes(vrs: tsnark.VRSDev, params: Params) -> bytes:
    scalars = b"".join(
        int(np.asarray(x, dtype=np.uint64)).to_bytes(8, "little")
        for x in (vrs.alpha, vrs.beta, vrs.s)
    )
    return scalars + _rows92(vrs.sk, params).tobytes()


def vrs_from_bytes(buf: bytes, params: Params) -> tsnark.VRSDev:
    n, cb = params.n, params.ct_bytes
    assert len(buf) == 24 + n * cb, (len(buf), 24 + n * cb)
    alpha, beta, s = (
        jnp.uint32(int.from_bytes(buf[8 * i : 8 * i + 8], "little"))
        for i in range(3)
    )
    sk = np.frombuffer(buf[24:], dtype=np.uint8).reshape(n, cb)[:, :88]
    return tsnark.VRSDev(alpha=alpha, beta=beta, s=s, sk=jnp.asarray(sk))


# --------------------------------------------------------------------------
# Proof
# --------------------------------------------------------------------------


def proof_to_bytes(pi: tsnark.ProofDev, params: Params) -> bytes:
    return _rows92(pi.stack(), params).tobytes()


def proof_from_bytes(buf: bytes, params: Params) -> tsnark.ProofDev:
    n, cb = params.n, params.ct_bytes
    expect = 5 * (n + 1) * cb
    assert len(buf) == expect, (len(buf), expect)
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(5, n + 1, cb)[..., :88]
    cts = jnp.asarray(arr)
    return tsnark.ProofDev(
        h=cts[0], hat_h=cts[1], hat_v=cts[2], v_w=cts[3], b_w=cts[4]
    )


# --------------------------------------------------------------------------
# SSP flat buffer (reference src/ssp.h:6-9 layout)
# --------------------------------------------------------------------------


def ssp_to_buffer(ssp: tssp.SSPDev, params: Params) -> bytes:
    """t then v_0..v_{m-1}, each d uint64-LE coefficients (< p)."""
    t = np.asarray(ssp.t, dtype=np.uint64)
    v = np.asarray(ssp.v, dtype=np.uint64)
    return t.tobytes() + v.tobytes()


def ssp_from_buffer(buf: bytes, params: Params) -> tssp.SSPDev:
    d, m = params.d, params.m
    assert len(buf) == 8 * d * (m + 1), (len(buf), 8 * d * (m + 1))
    words = np.frombuffer(buf, dtype="<u8").reshape(m + 1, d)
    assert (words < params.p).all(), "coefficients must be reduced mod p"
    arr = words.astype(np.uint32)
    return tssp.SSPDev(t=jnp.asarray(arr[0]), v=jnp.asarray(arr[1:]))


# --------------------------------------------------------------------------
# File helpers
# --------------------------------------------------------------------------


def save(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()
