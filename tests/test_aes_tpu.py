"""Conformance tests: TPU bitsliced AES-CTR vs the host oracle."""

import numpy as np
import pytest

from c_lwe_snarks_tpu.oracle import aes as host_aes
from c_lwe_snarks_tpu.ops import aes_pallas, aes_tpu, gf_tower
from c_lwe_snarks_tpu.ops.bitslice import transpose32

SEED = bytes(range(40))
KEY32 = SEED[8:]
NONCE = int.from_bytes(SEED[:8], "little")


def test_transpose32_roundtrip_and_semantics():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    words = rng.randint(0, 1 << 32, (32, 3), dtype=np.uint64).astype(np.uint32)
    out = np.asarray(jax.jit(transpose32)(jnp.asarray(words)))
    for i in range(32):
        for j in range(0, 32, 7):
            assert ((int(out[j, 1]) >> i) & 1) == ((int(words[i, 1]) >> j) & 1)
    back = np.asarray(jax.jit(transpose32)(jnp.asarray(out)))
    assert np.array_equal(back, words)


def test_tower_sbox_exhaustive():
    """All 256 inputs through the bitsliced tower circuit == table oracle."""
    planes = np.zeros((8, 8), dtype=np.uint32)
    for v in range(256):
        w, b = v // 32, v % 32
        for k in range(8):
            planes[k, w] |= np.uint32((v >> k) & 1) << np.uint32(b)
    out = np.stack(gf_tower.sbox_tower_bits([planes[k] for k in range(8)]))
    got = np.zeros(256, dtype=np.uint8)
    for v in range(256):
        w, b = v // 32, v % 32
        for k in range(8):
            got[v] |= ((int(out[k, w]) >> b) & 1) << k
    assert np.array_equal(got, host_aes.sbox())


def test_chain_sbox_exhaustive():
    """The x^254 addition-chain circuit (jnp path) matches the table too."""
    planes = np.zeros((8, 8), dtype=np.uint32)
    for v in range(256):
        w, b = v // 32, v % 32
        for k in range(8):
            planes[k, w] |= np.uint32((v >> k) & 1) << np.uint32(b)
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda ps: jnp.stack(aes_tpu._sbox_bits([ps[k] for k in range(8)])))
    out = np.asarray(f(jnp.asarray(planes)))
    got = np.zeros(256, dtype=np.uint8)
    for v in range(256):
        w, b = v // 32, v % 32
        for k in range(8):
            got[v] |= ((int(out[k, w]) >> b) & 1) << k
    assert np.array_equal(got, host_aes.sbox())


def test_jnp_keystream_matches_oracle():
    import jax

    key = aes_tpu.make_key(SEED)
    ks = np.asarray(jax.jit(lambda: aes_tpu.keystream_blocks(key, 777, 64))())
    ref = host_aes.ctr_keystream(KEY32, NONCE, 777, 64).reshape(64, 16)
    assert np.array_equal(ks, ref)


@pytest.fixture(scope="module")
def pallas_key():
    return aes_pallas.make_key_pallas(SEED)


def test_pallas_keystream_matches_oracle(pallas_key):
    ks = np.asarray(
        aes_pallas.keystream_blocks(pallas_key, 12345, 96, tile_w=8, interpret=True)
    )
    ref = host_aes.ctr_keystream(KEY32, NONCE, 12345, 96).reshape(96, 16)
    assert np.array_equal(ks, ref)


def test_pallas_keystream_counter_carry(pallas_key):
    start = (1 << 32) - 16
    ks = np.asarray(
        aes_pallas.keystream_blocks(pallas_key, start, 32, tile_w=1, interpret=True)
    )
    ref = host_aes.ctr_keystream(KEY32, NONCE, start, 32).reshape(32, 16)
    assert np.array_equal(ks, ref)


def test_pallas_keystream_fold_p_matches_oracle(pallas_key):
    """Fused in-kernel u64→mod-p fold == folding the oracle's raw stream.

    Covers a non-tile-multiple npairs (tail slice) and a traced counter
    tuple (the gen_v_scan call pattern)."""
    start, npairs = 4096, 8 * 64 * 3 + 17  # 3 full tiles (tile_w=8) + tail
    got = np.asarray(
        aes_pallas.keystream_fold_p(
            pallas_key, start, npairs, tile_w=8, interpret=True
        )
    )
    nblocks = -(-npairs // 2)
    raw = host_aes.ctr_keystream(KEY32, NONCE, start, nblocks).reshape(-1)
    w = raw.reshape(-1, 4).astype(np.uint64)
    u64 = (w[:, 0] | (w[:, 1] << 8) | (w[:, 2] << 16) | (w[:, 3] << 24)).reshape(
        -1, 2
    )
    ref = ((u64[:, 1] << np.uint64(32)) | u64[:, 0]) % np.uint64((1 << 32) - 5)
    assert np.array_equal(got, ref[:npairs].astype(np.uint32))


def test_sampling_fold_p_backends_agree(pallas_key):
    """sampling.keystream_fold_p: jnp fallback == pallas kernel (odd npairs,
    counter-tuple start as used by the ssp scan)."""
    from c_lwe_snarks_tpu.ops import sampling

    key = sampling.PRGKey(SEED)
    ctr = (jnp_u32(123), jnp_u32(0))
    jnp_out = np.asarray(sampling.keystream_fold_p(key, ctr, 513, backend="jnp"))
    pl_out = np.asarray(
        aes_pallas.keystream_fold_p(pallas_key, ctr, 513, tile_w=4, interpret=True)
    )
    assert np.array_equal(jnp_out, pl_out)


def jnp_u32(x):
    import jax.numpy as jnp

    return jnp.uint32(x)


def test_pallas_keystream_bytes_section_offsets(pallas_key):
    """Byte-granular slicing at a block-aligned section base (like CTR_AS)."""
    off, n = 16 * 1000, 92 * 37
    kb = np.asarray(
        aes_pallas.keystream_bytes(pallas_key, off, n, tile_w=8, interpret=True)
    )
    ref = host_aes.ctr_keystream(KEY32, NONCE, 1000, (n + 15) // 16).reshape(-1)[:n]
    assert np.array_equal(kb, ref)
