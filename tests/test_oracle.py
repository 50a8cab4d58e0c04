"""Oracle self-consistency tests (mirrors the reference's test programs).

These pin the host oracle to external truth (FIPS-197, OpenSSL) and to the
reference's behavioural contracts (src/test_aes.c, src/test_entropy.c,
src/test_lwe.c, src/test_ssp.c, src/test_snark.c).  The TPU layers are
then tested against this oracle.
"""

import numpy as np
import pytest

from c_lwe_snarks_tpu.oracle import aes, lwe, poly, snark, ssp
from c_lwe_snarks_tpu.oracle.prg import AesCtrStream, EntropySource

SEED = bytes(range(40))


# ---------------------------------------------------------------- AES


def test_aes256_fips197_vector():
    key = bytes(range(32))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = aes.encrypt_blocks(
        np.frombuffer(pt, dtype=np.uint8).reshape(1, 16), aes.key_expansion(key)
    )
    assert bytes(ct.reshape(-1)).hex() == "8ea2b7ca516745bfeafc49904b496089"


def test_generated_sbox_known_entries():
    sb = aes.sbox()
    assert sb[0x00] == 0x63 and sb[0x01] == 0x7C and sb[0x53] == 0xED
    assert sb[0xFF] == 0x16


def test_openssl_and_numpy_keystreams_agree():
    a = aes.ctr_keystream(bytes(range(32)), 0x0123456789ABCDEF, 5, 64)
    b = aes.ctr_keystream_numpy(bytes(range(32)), 0x0123456789ABCDEF, 5, 64)
    assert np.array_equal(a, b)


def test_prg_blocks_nonzero_nonrepeating():
    # src/test_aes.c:18-24
    s = AesCtrStream.from_seed(SEED)
    blocks = [s.gen(16) for _ in range(8)]
    assert all(b != bytes(16) for b in blocks)
    assert len(set(blocks)) == len(blocks)


# ---------------------------------------------------------------- entropy


def test_prg_determinism_across_widths():
    # src/test_entropy.c test_deterministic: same seed -> same values
    for nbits in (8, 64, 128, 704, 736, 640):
        a = AesCtrStream.from_seed(SEED).urandomb(nbits)
        b = AesCtrStream.from_seed(SEED).urandomb(nbits)
        assert a == b
        assert a < (1 << nbits)


def test_prg_chunking_invariance():
    # src/test_entropy.c test_accumulate: one big read == many small reads
    one = AesCtrStream.from_seed(SEED).gen(92 * 37)
    s = AesCtrStream.from_seed(SEED)
    many = b"".join(s.gen(92) for _ in range(37))
    assert one == many


def test_prg_seek():
    # src/test_entropy.c test_seek: seek(k) == generate-and-discard k
    for off in (512, 513, 16, 1, 135240):
        s1 = AesCtrStream.from_seed(SEED)
        s1.gen(off)
        s2 = AesCtrStream.from_seed(SEED)
        s2.seek(off)
        assert s1.gen(100) == s2.gen(100)


def test_prg_vector_determinism():
    # 400 x 700-bit vector draw (src/test_entropy.c:81-108)
    a = AesCtrStream.from_seed(SEED).urandomb_vec(704, 40)
    b = AesCtrStream.from_seed(SEED).urandomb_vec(704, 40)
    assert a == b


# ---------------------------------------------------------------- lwe


def test_encrypt_decrypt_roundtrip(tiny):
    # src/test_lwe.c test_correctness
    ent = EntropySource(seed=SEED)
    sk = lwe.key_gen(tiny, ent)
    prg = AesCtrStream.from_seed(SEED)
    for i in range(10):
        m = ent.rand_modp(tiny.p)
        ct = lwe.encrypt(tiny, prg, sk, m, ent)
        assert lwe.decrypt(tiny, sk, ct) == m


def test_ct_import_export_roundtrip(tiny):
    # src/test_lwe.c test_import_export: compressed form + synced PRG
    # reproduces the full ciphertext exactly.
    ent = EntropySource(seed=SEED)
    sk = lwe.key_gen(tiny, ent)
    prg = AesCtrStream.from_seed(SEED)
    ct = lwe.encrypt(tiny, prg, sk, 1234, ent)
    buf = lwe.ct_export(tiny, ct)
    assert len(buf) == tiny.ct_bytes
    assert buf[-4:] == bytes(4)  # effective modulus 2^704 -> top 4 B zero
    prg2 = AesCtrStream.from_seed(SEED)
    ct2 = lwe.ct_import(tiny, prg2, buf)
    assert ct2.a == ct.a and ct2.b == ct.b


def test_eval_poly_homomorphism(tiny):
    # src/test_lwe.c test_eval: Dec(eval(cts, coeffs)) == sum m_i c_i mod p
    ent = EntropySource(seed=SEED)
    sk = lwe.key_gen(tiny, ent)
    prg = AesCtrStream.from_seed(SEED)
    d = 20
    msgs = [ent.rand_modp(tiny.p) for _ in range(d)]
    comp = []
    for m in msgs:
        ct = lwe.encrypt(tiny, prg, sk, m, ent)
        comp.append(lwe.ct_export(tiny, ct))
    coeffs = [ent.rand_modp(tiny.p) for _ in range(d)]
    prg2 = AesCtrStream.from_seed(SEED)
    acc = lwe.eval_poly(tiny, prg2, comp, coeffs, d)
    expect = sum(m * c for m, c in zip(msgs, coeffs)) % tiny.p
    assert lwe.decrypt(tiny, sk, acc) == expect


def test_smudging_preserves_plaintext(tiny):
    # src/test_lwe.c test_smudging
    ent = EntropySource(seed=SEED)
    sk = lwe.key_gen(tiny, ent)
    prg = AesCtrStream.from_seed(SEED)
    ct = lwe.encrypt(tiny, prg, sk, 999, ent)
    for _ in range(4):
        lwe.smudge(tiny, ct, ent)
        assert 0 <= ct.b < tiny.q_eff
    assert lwe.decrypt(tiny, sk, ct) == 999


# ---------------------------------------------------------------- poly/ssp


def test_poly_mul_div_roundtrip():
    rng = np.random.RandomState(0)
    a = [int(x) for x in rng.randint(0, poly.P, 33)]
    b = [int(x) for x in rng.randint(0, poly.P, 17)]
    prod = poly.poly_mul(a, b)
    assert poly.poly_div(prod, b) == poly.normalize(a)
    x = 123456789
    assert poly.poly_eval(prod, x) == (
        poly.poly_eval(a, x) * poly.poly_eval(b, x) % poly.P
    )


def test_poly_buffer_roundtrip(tiny):
    # src/test_ssp.c:15-34
    rng = np.random.RandomState(1)
    a = [int(x) for x in rng.randint(0, poly.P, tiny.d)]
    buf = poly.poly_export(a, tiny.d)
    assert poly.poly_import(buf, tiny.d) == poly.normalize(a)


def test_random_ssp_satisfies_relation(tiny):
    # src/test_ssp.c test_ssp: v = v0 + sum_{witness} v_i satisfies
    # v^2 - 1 ≡ 0 (mod t)
    ent = EntropySource(seed=SEED)
    wit, inst = ssp.random_ssp(tiny, ent)
    v = inst.v[0]
    for i in range(1, tiny.m):
        if (wit >> (i - 1)) & 1:
            v = poly.poly_add(v, inst.v[i])
    num = poly.poly_sub(poly.poly_mul(v, v), [1])
    h = poly.poly_div(num, inst.t)
    assert poly.poly_sub(num, poly.poly_mul(h, inst.t)) == []  # exact division


def test_ssp_buffer_layout_roundtrip(tiny):
    ent = EntropySource(seed=SEED)
    _, inst = ssp.random_ssp(tiny, ent)
    buf = inst.to_buffer(tiny)
    assert len(buf) == 8 * tiny.d * (tiny.m + 1)
    inst2 = ssp.SSP.from_buffer(buf, tiny)
    assert inst2.t == inst.t and inst2.v == inst.v


# ---------------------------------------------------------------- snark


@pytest.fixture(scope="module")
def snark_run(tiny):
    ent = EntropySource(seed=SEED)
    wit, inst = ssp.random_ssp(tiny, ent)
    crs, vrs = snark.setup(tiny, inst, ent, seed=bytes(40))
    pi = snark.prover(tiny, crs, inst, wit, ent)
    return tiny, inst, wit, crs, vrs, pi


def test_snark_crs_probes(snark_run):
    # src/test_snark.c:40-70 white-box decrypt probes
    prm, inst, wit, crs, vrs, pi = snark_run
    prg = AesCtrStream.from_seed(crs.seed)
    prg.seek(prm.ctr_s)
    ct_s = lwe.ct_import(prm, prg, crs.s[0])
    prg.seek(prm.ctr_as)
    ct_as = lwe.ct_import(prm, prg, crs.as_[0])
    assert lwe.decrypt(prm, vrs.sk, ct_s) == 1
    assert lwe.decrypt(prm, vrs.sk, ct_as) == vrs.alpha
    for idx in (1, prm.d - 1):
        prg.seek(prm.ctr_s + prm.ctr_ct * idx)
        s_i = lwe.decrypt(prm, vrs.sk, lwe.ct_import(prm, prg, crs.s[idx]))
        prg.seek(prm.ctr_as + prm.ctr_ct * idx)
        as_i = lwe.decrypt(prm, vrs.sk, lwe.ct_import(prm, prg, crs.as_[idx]))
        assert s_i * vrs.alpha % prm.p == as_i


def test_snark_proof_probes(snark_run):
    # src/test_snark.c:81-89
    prm, inst, wit, crs, vrs, pi = snark_run
    h_s = lwe.decrypt(prm, vrs.sk, pi.h)
    hat_h_s = lwe.decrypt(prm, vrs.sk, pi.hat_h)
    assert h_s * vrs.alpha % prm.p == hat_h_s


def test_snark_end_to_end(snark_run):
    prm, inst, wit, crs, vrs, pi = snark_run
    assert snark.verifier(prm, inst, vrs, pi)


def test_snark_rejects_tampered_proof(snark_run):
    prm, inst, wit, crs, vrs, pi = snark_run
    import copy

    bad = copy.deepcopy(pi)
    bad.h.b ^= 1 << 100
    assert not snark.verifier(prm, inst, vrs, bad)
    bad2 = copy.deepcopy(pi)
    bad2.v_w.b = (bad2.v_w.b + 1) % prm.q_eff
    assert not snark.verifier(prm, inst, vrs, bad2)


def test_snark_rejects_wrong_witness(tiny):
    ent = EntropySource(seed=SEED)
    wit, inst = ssp.random_ssp(tiny, ent)
    crs, vrs = snark.setup(tiny, inst, ent, seed=bytes(40))
    wrong = wit ^ 0b11  # flip two witness bits
    pi = snark.prover(tiny, crs, inst, wrong, ent)
    assert not snark.verifier(tiny, inst, vrs, pi)


def test_sample_digit_rows_word_path_matches_oracle():
    """Word-native draws == oracle stream bytes at every width/offset mix.

    sample_digit_rows routes word-aligned offsets through keystream_words
    with fused byte extraction (the u8-bitcast-free path); draw widths 70
    (error+sign), 81 (smudge), 92 (key/a) cover row periods 2, 4, 1, and
    unaligned offsets must fall back bit-identically.
    """
    import jax

    from c_lwe_snarks_tpu.ops import sampling

    key = sampling.PRGKey(SEED)
    for db, nd, cnt, off in [
        (70, 69, 7, 0), (70, 69, 8, 4), (92, 88, 5, 24), (81, 81, 5, 8),
        (92, 88, 3, 2), (70, 69, 4, 10), (81, 80, 3, 16),
    ]:
        got = np.asarray(
            jax.jit(
                lambda: sampling.sample_digit_rows(
                    key, off, cnt, draw_bytes=db, ndigits=nd
                )
            )()
        )
        s = AesCtrStream.from_seed(SEED)
        s.seek(off)
        want = np.frombuffer(s.gen(cnt * db), np.uint8).reshape(cnt, db)[:, :nd]
        np.testing.assert_array_equal(got, want, err_msg=str((db, nd, cnt, off)))
