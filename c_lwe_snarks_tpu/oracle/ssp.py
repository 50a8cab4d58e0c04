"""Host oracle for the SSP instance layer (src/ssp.{h,c}).

An SSP instance is a flat byte buffer of (m+1) degree-<d polynomials over
Z_p: t(x) at offset 0, v_i(x) at ``8*d*(i+1)`` (src/ssp.h:6-9).  We keep
that exact layout for interop/golden tests, but expose a structured view.

``random_ssp`` (src/ssp.c:37-77): samples an m-bit input, m random
polynomials v_0..v_{m-1}, and sets t = v_0 + sum_{input bit i-1} v_i - 1,
so v = t + 1 satisfies the SSP relation v^2 ≡ 1 (mod t) by construction.
The reference has no circuit frontend; this is the only instance source.
"""

from __future__ import annotations

import dataclasses

from ..utils.params import Params
from . import poly
from .prg import EntropySource


@dataclasses.dataclass
class SSP:
    t: list[int]
    v: list[list[int]]  # v[0..m-1]

    def to_buffer(self, params: Params) -> bytes:
        out = bytearray()
        out += poly.poly_export(self.t, params.d)
        for vi in self.v:
            out += poly.poly_export(vi, params.d)
        return bytes(out)

    @classmethod
    def from_buffer(cls, buf: bytes, params: Params) -> "SSP":
        d = params.d
        t = poly.poly_import(buf[0 : 8 * d], d)
        v = [
            poly.poly_import(buf[8 * d * (i + 1) : 8 * d * (i + 2)], d)
            for i in range(params.m)
        ]
        return cls(t=t, v=v)


def random_ssp(params: Params, entropy: EntropySource) -> tuple[int, SSP]:
    """Returns (input_bits_as_int, ssp).  Matches src/ssp.c:37-77.

    Entropy draw order: input (m bits), a discarded pad to the next
    16-byte boundary (this framework's layout definition — the reference
    draws from getrandom with no layout, src/ssp.c:56,62; alignment lets
    shards regenerate polynomial slices by counter arithmetic), then
    8*d bytes per v_i in order.
    """
    witness = entropy.urandomb(params.m)
    pad = (-(params.m // 8)) % 16
    if pad:
        entropy.getrandom(pad)  # discarded alignment draw
    v = []
    t: list[int] = []
    for i in range(params.m):
        buf = entropy.getrandom(8 * params.d)
        vi = poly.poly_import(buf, params.d)
        v.append(vi)
        if i == 0 or (witness >> (i - 1)) & 1:
            t = poly.poly_add(t, vi)
    t = poly.poly_sub(t, [1])
    return witness, SSP(t=t, v=v)
