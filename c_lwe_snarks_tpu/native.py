"""ctypes bindings for the native host runtime (native/hostlib).

The TPU compute path never uses this; it accelerates the *host* side —
the bit-exact oracle's keystream and eval_poly hot loops (~20x over
python ints), making release-scale oracle conformance checks feasible.
Builds on first use with gcc against the installed runtime libraries;
falls back cleanly (``available() -> False``) if that fails.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIBDIR = os.path.join(os.path.dirname(_HERE), "native", "hostlib")
_LIB = os.path.join(_LIBDIR, "libcls_host.so")


@functools.cache
def _lib():
    if not os.path.exists(_LIB):
        try:
            subprocess.run(
                ["sh", os.path.join(_LIBDIR, "build.sh")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.cls_keystream.restype = ctypes.c_int
    lib.cls_keystream.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_void_p,
    ]
    lib.cls_eval_poly.restype = ctypes.c_int
    lib.cls_eval_poly.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_void_p,
        ctypes.c_size_t, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p,
    ]
    return lib


def available() -> bool:
    return _lib() is not None


def keystream(key: bytes, nonce: int, byte_offset: int, nbytes: int) -> bytes:
    """Reference-layout AES-256-CTR stream bytes (src/aes.c:104-144)."""
    lib = _lib()
    assert lib is not None and len(key) == 32
    out = np.empty(nbytes, dtype=np.uint8)
    rc = lib.cls_keystream(key, nonce, byte_offset, nbytes,
                           out.ctypes.data_as(ctypes.c_void_p))
    assert rc == 0, rc
    return out.tobytes()


def eval_poly(
    key: bytes, nonce: int, section_offset: int,
    b_rows: np.ndarray, coeffs: np.ndarray, n: int,
) -> np.ndarray:
    """Hot-loop eval_poly (src/lwe.c:176-186) on the host: uint8 [n+1, 88].

    b_rows: uint8 [d, 92] compressed rows; coeffs: uint32 [d].
    """
    lib = _lib()
    assert lib is not None
    b_rows = np.ascontiguousarray(b_rows, dtype=np.uint8)
    coeffs = np.ascontiguousarray(coeffs, dtype=np.uint32)
    d = b_rows.shape[0]
    assert coeffs.shape == (d,) and b_rows.shape[1] == 92
    out = np.zeros((n + 1) * 96, dtype=np.uint8)
    rc = lib.cls_eval_poly(
        key, nonce, section_offset,
        b_rows.ctypes.data_as(ctypes.c_void_p), b_rows.strides[0],
        coeffs.ctypes.data_as(ctypes.c_void_p), d, n,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    assert rc == 0, rc
    return out.reshape(n + 1, 96)[:, :88]
