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
# Streaming / mmap IO — release-scale files without whole-blob staging.
#
# The release SSP buffer is 8 * 2^15 * 21846 = 5.33 GiB and the uint32
# device form another 2.67 GiB; `ssp_to_buffer` + `save` would hold both
# at once.  The reference side-steps this with mmap (benchmark_eval.c:
# 44-66 maps the ciphertext file read-only); these writers/readers stream
# fixed-size row chunks instead, so peak extra memory is one chunk.
# --------------------------------------------------------------------------


def ssp_write_stream(
    path: str, ssp: tssp.SSPDev, params: Params, *, rows_per_chunk: int = 256
) -> None:
    """Write the reference flat SSP layout (src/ssp.h:6-9) chunk-wise.

    Byte-identical to ``save(path, ssp_to_buffer(...))``; each chunk pulls
    rows_per_chunk polynomial rows off the device, widens to uint64-LE,
    writes, and drops them.
    """
    with open(path, "wb") as f:
        f.write(np.asarray(ssp.t, dtype=np.uint64).tobytes())
        m = int(ssp.v.shape[0])
        for lo in range(0, m, rows_per_chunk):
            rows = np.asarray(ssp.v[lo : lo + rows_per_chunk], dtype=np.uint64)
            f.write(rows.tobytes())


def ssp_read_stream(
    path: str, params: Params, *, rows_per_chunk: int = 256
) -> tssp.SSPDev:
    """Load an SSP buffer via np.memmap: no whole-file byte copy.

    The uint64 file words are validated (< p) and narrowed to the uint32
    device form chunk-wise off the mapping; peak host memory is the
    uint32 array plus one chunk.
    """
    d, m = params.d, params.m
    words = np.memmap(path, dtype="<u8", mode="r", shape=(m + 1, d))
    v = np.empty((m, d), dtype=np.uint32)
    t = None
    for lo in range(0, m + 1, rows_per_chunk):
        chunk = np.asarray(words[lo : lo + rows_per_chunk])
        assert (chunk < params.p).all(), "coefficients must be reduced mod p"
        narrow = chunk.astype(np.uint32)
        if lo == 0:
            t, narrow = narrow[0], narrow[1:]
            v[:narrow.shape[0]] = narrow
        else:
            v[lo - 1 : lo - 1 + narrow.shape[0]] = narrow
    return tssp.SSPDev(t=jnp.asarray(t), v=jnp.asarray(v))


def crs_write_stream(
    path: str, crs: tsnark.CRSDev, params: Params, *, rows_per_chunk: int = 4096
) -> None:
    """Write the CRS file (seed || 92-byte row table) chunk-wise."""
    with open(path, "wb") as f:
        f.write(bytes(crs.seed))
        for rows in (crs.b_s, crs.b_as, crs.b_t[None], crs.b_v):
            n = int(rows.shape[0])
            for lo in range(0, n, rows_per_chunk):
                f.write(_rows92(rows[lo : lo + rows_per_chunk], params).tobytes())


def crs_row_table(path: str, params: Params) -> tuple[bytes, np.ndarray]:
    """(seed, read-only memmap [crs_num_cts, 92]) over a CRS file.

    The row table's section layout matches crs_from_bytes: rows [0, d) are
    b_s, [d, 2d) b_as, row 2d is b_t, [2d+1, ...) b_v.  Slicing the
    mapping reads only the touched pages — the host-sliced load path for
    multi-host runs (parallel/multihost.local_shard_bounds picks each
    host's row range).
    """
    with open(path, "rb") as f:
        seed = f.read(40)
    rows = np.memmap(
        path, dtype=np.uint8, mode="r", offset=40,
        shape=(params.crs_num_cts, params.ct_bytes),
    )
    return seed, rows


def crs_local_section_rows(
    crs: tsnark.CRSDev, params: Params
) -> dict[str, tuple[int, np.ndarray]]:
    """Per-section CRS rows owned by THIS process, stored 92-byte form.

    The write half of multihost CRS IO (the read half is
    ``crs_local_slice``): under a multi-controller launch each section is
    1-D row-sharded, so a process's addressable shards are contiguous
    rows in device order — each host writes only its own rows and the
    stitched file equals ``crs_to_bytes`` (tests/test_multiprocess.py).
    Returns {"s"|"as"|"v": (row_start, uint8 [rows, 92]), "t": (0, [1, 92])}
    ("t" is replicated; callers pick one writer).
    """
    out: dict[str, tuple[int, np.ndarray]] = {}
    for name, arr in (("s", crs.b_s), ("as", crs.b_as), ("v", crs.b_v)):
        by_start: dict[int, np.ndarray] = {}
        for s in arr.addressable_shards:
            start = s.index[0].start or 0
            if start not in by_start:  # replicated shards duplicate rows
                by_start[start] = np.asarray(s.data, dtype=np.uint8)
        starts = sorted(by_start)
        row_start, expect = starts[0], starts[0]
        for st in starts:
            assert st == expect, (name, starts)  # contiguous in device order
            expect += by_start[st].shape[0]
        rows = np.concatenate([by_start[st] for st in starts])
        out[name] = (row_start, _rows92(jnp.asarray(rows), params))
    out["t"] = (0, _rows92(crs.b_t[None], params))
    return out


def crs_local_slice(
    path: str, params: Params
) -> tuple[bytes, int, np.ndarray]:
    """(seed, row_start, rows[start:end, :88]) — this host's CRS rows.

    Chunking rule == parallel/multihost.local_shard_bounds over the full
    2d+1+(m-1) row table; each host touches only its own pages.
    """
    from ..parallel import multihost

    seed, table = crs_row_table(path, params)
    lo, hi = multihost.local_shard_bounds(params.crs_num_cts)
    return seed, lo, np.asarray(table[lo:hi, :88])


# --------------------------------------------------------------------------
# File helpers
# --------------------------------------------------------------------------


def save(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()
