"""Host oracle for the seeded PRG stream and integer sampling.

Bit-exact model of the reference's entropy layer:

* ``AesCtrStream`` == ``struct aesctr`` + ``rng_t`` (src/aes.h:21-30,
  src/entropy.h:36): an AES-256-CTR byte stream with a 16-byte remainder
  buffer, O(1) ``seek`` (src/entropy.c:46-56), and the keystream being a
  pure function of (key, nonce, byte offset) — the chunking-invariance
  contract of src/test_entropy.c:111-137.
* ``urandomb`` == ``mpz2_urandomb`` (src/entropy.c:11-26): consume
  ``nbits // 8`` keystream bytes, interpret little-endian, mask to nbits.
  For non-byte-aligned widths the reference reads *uninitialized memory*
  for the top bits (SURVEY §2 quirk 5); we define those bits as zero
  (deviation documented in DEVIATIONS.md — no seeded-path call sites are
  affected, all are byte aligned).
* A seed is 8 nonce bytes followed by 32 key bytes (src/entropy.c:58-61,
  src/entropy.h:34-35).
"""

from __future__ import annotations

import numpy as np

from . import aes


class AesCtrStream:
    """AES-256-CTR byte stream matching src/aes.c:104-144.

    The reference keeps (ctr, 16-byte remainder buffer) state; that is
    equivalent to a single absolute byte offset because the keystream is a
    pure function of (key, nonce, offset) — the contract proven by
    src/test_entropy.c's chunking-invariance and seek tests.  We state it
    that way and prefetch AES blocks in large batches for speed.
    """

    _CHUNK_BLOCKS = 8192  # prefetch granularity (128 KiB)

    def __init__(self, key: bytes, nonce: int):
        assert len(key) == 32
        self.key = key
        self.nonce = nonce
        self.pos = 0  # absolute byte offset in the keystream
        self._buf = b""
        self._buf_start = 0  # byte offset of _buf[0]

    @classmethod
    def from_seed(cls, seed: bytes) -> "AesCtrStream":
        """rng_init: seed = nonce (8B LE) || key (32B)  (src/entropy.c:58-61)."""
        assert len(seed) == 40
        nonce = int.from_bytes(seed[:8], "little")
        return cls(seed[8:], nonce)

    def _fill(self, start: int, end: int) -> None:
        """Ensure _buf covers byte range [start, end)."""
        first_block = start // 16
        nblocks = max((end + 15) // 16 - first_block, self._CHUNK_BLOCKS)
        from .. import native as _native

        if _native.available():
            # native host runtime (bit-exact, tested vs the pure path)
            self._buf = _native.keystream(
                self.key, self.nonce, first_block * 16, nblocks * 16
            )
        else:
            ks = aes.ctr_keystream(self.key, self.nonce, first_block, nblocks)
            self._buf = ks.tobytes()
        self._buf_start = first_block * 16

    def gen(self, count: int) -> bytes:
        start, end = self.pos, self.pos + count
        if start < self._buf_start or end > self._buf_start + len(self._buf):
            self._fill(start, end)
        off = start - self._buf_start
        self.pos = end
        return self._buf[off : off + count]

    def seek(self, count: int) -> None:
        """rng_seek (src/entropy.c:46-56): position at absolute byte offset."""
        self.pos = count

    # -- integer sampling ---------------------------------------------------
    def urandomb(self, nbits: int) -> int:
        """mpz2_urandomb: nbits//8 LE bytes from the stream, masked to nbits."""
        nbytes = nbits // 8
        val = int.from_bytes(self.gen(nbytes), "little")
        return val & ((1 << nbits) - 1)

    def urandomb_vec(self, nbits: int, count: int) -> list[int]:
        return [self.urandomb(nbits) for _ in range(count)]


class EntropySource:
    """Replaces the reference's getrandom(2) call sites with a seedable stream.

    The reference draws keys, errors, trapdoor scalars, smudging and SSP
    coefficients from *system* entropy (SURVEY §2 quirk 3), which makes
    setup/prove non-reproducible even with a fixed CRS seed.  We route all
    of it through one domain-separated seeded stream (strict superset:
    pass ``system=True`` for getrandom-equivalent behavior).
    """

    def __init__(self, seed: bytes | None = None, *, domain: int = 0):
        if seed is None:
            import os

            seed = os.urandom(40)
        base = bytearray(seed)
        # domain-separate by xoring into the nonce
        nonce = int.from_bytes(base[:8], "little") ^ domain
        self.stream = AesCtrStream(bytes(base[8:40]), nonce)

    def getrandom(self, nbytes: int) -> bytes:
        return self.stream.gen(nbytes)

    def urandomb(self, nbits: int) -> int:
        """mpz2_urandomb2 semantics (clean non-byte-aligned definition)."""
        nbytes = nbits // 8
        val = int.from_bytes(self.getrandom(nbytes), "little")
        return val & ((1 << nbits) - 1)

    def rand_modp(self, p: int) -> int:
        """rand_modp (src/lwe.h:97-103): uniform-ish uint64 mod p."""
        return int.from_bytes(self.getrandom(8), "little") % p

    def random_sign(self) -> int:
        """mpz_randomsgn (src/lwe.c:52-58): one byte, low bit decides."""
        return -1 if self.getrandom(1)[0] & 1 else 1
