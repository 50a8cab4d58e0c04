"""Bit-slicing utilities: SWAR 32x32 bit-matrix transposes in jnp.

The TPU has no AES-NI and no efficient byte gathers, so AES runs as a
*bitsliced* boolean circuit on uint32 lanes: each of the 128 state bit
positions is a plane of uint32 words, each word carrying that bit for 32
independent blocks.  Converting between block-major bytes and bit planes
is a 32x32 binary-matrix transpose, done branch-free with the classic
mask/shift/xor network (5 stages) vectorized over a trailing batch axis.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# python-int literals (not device arrays) so Pallas kernels can close over
# them without capturing constants
_MASKS = {
    16: 0x0000FFFF,
    8: 0x00FF00FF,
    4: 0x0F0F0F0F,
    2: 0x33333333,
    1: 0x55555555,
}


def transpose32(a: jnp.ndarray) -> jnp.ndarray:
    """Transpose a 32x32 bit matrix, vectorized over trailing axes.

    a: uint32 [32, ...] where bit j of a[i] is matrix entry M[i, j].
    Returns uint32 [32, ...] where bit i of out[j] is M[i, j].
    """
    assert a.shape[0] == 32 and a.dtype == jnp.uint32
    # LSB-first convention (bit index == column index): swap the
    # off-diagonal blocks — row k's HIGH-column bits with row (k+j)'s
    # LOW-column bits — recursively for j = 16, 8, 4, 2, 1.
    for j in (16, 8, 4, 2, 1):
        m = np.uint32(_MASKS[j])
        a4 = a.reshape((32 // (2 * j), 2, j) + a.shape[1:])
        lo, hi = a4[:, 0], a4[:, 1]
        t = ((lo >> j) ^ hi) & m
        lo = lo ^ (t << j)
        hi = hi ^ t
        a = jnp.stack([lo, hi], axis=1).reshape(a.shape)
    return a


def bytes_to_planes(words: jnp.ndarray) -> jnp.ndarray:
    """Pack per-block uint32 words into bit planes.

    words: uint32 [32, ...] — words[b] is a uint32 belonging to block b of
    a 32-block group.  Returns planes uint32 [32, ...]: planes[k] has bit
    b = bit k of block b's word.  (Same 32x32 transpose both directions.)
    """
    return transpose32(words)


def planes_to_bytes(planes: jnp.ndarray) -> jnp.ndarray:
    """Inverse of bytes_to_planes (transpose32 is an involution here)."""
    return transpose32(planes)
