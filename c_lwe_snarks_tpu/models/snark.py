"""The LWE/SSP SNARK protocol on TPU: setup / prover / verifier.

TPU-native redesign of src/snark.c (GMNO18 designated-verifier zk-SNARK):

* setup (src/snark.c:57-115): the 2d+m+... message schedule (s^i, alpha
  s^i, beta t(s), beta v_i(s)) is computed with log-depth power doubling
  and one batched mod-p matvec, then all encryptions run through the
  tiled keystream-regenerating encrypt_section — never materializing a
  [d, n, 88] slab.  CRS = 40-byte seed + compressed b-rows, exactly the
  reference's compressed format (seed + 92-byte b per ct).
* prover (src/snark.c:117-190): witness accumulation over the bv section
  IS a homomorphic evaluation with 0/1 coefficients, so it reuses the
  eval_poly kernel; the four polynomial evaluations run as TWO fused
  two-polynomial passes (w,h over the s section; v,h over the as
  section), halving keystream work vs the reference's four passes.
  h = (v^2-1)/t runs on the CRT-NTT engine.
* verifier (src/snark.c:192-250): 5 decrypts + mod-p relation checks.

All randomness beyond the CRS seed flows from a second seeded AES-CTR
stream ("entropy") with a static byte layout replicating the reference's
getrandom call order (SURVEY §2 quirk 3) — this makes full runs
reproducible and bit-exact against the host oracle given equal seeds.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import digits as dg
from ..ops import modp, sampling
from ..utils.params import Params
from . import lwe as tlwe
from . import ssp as tssp
from ..ops import ntt


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CRSDev:
    """seed + compressed ciphertext arrays (src/snark.h:31-37)."""

    seed: bytes = dataclasses.field(metadata=dict(static=True))
    b_s: jnp.ndarray  # uint8 [d, 88]   Enc(s^i)
    b_as: jnp.ndarray  # uint8 [d, 88]  Enc(alpha s^i)
    b_t: jnp.ndarray  # uint8 [88]      Enc(beta t(s))
    b_v: jnp.ndarray  # uint8 [m-1, 88] Enc(beta v_i(s)), i in [1, m)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VRSDev:
    """Designated-verifier trapdoor (src/snark.h:23-29)."""

    alpha: jnp.ndarray  # uint32
    beta: jnp.ndarray
    s: jnp.ndarray
    sk: jnp.ndarray  # uint8 [n, 88]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ProofDev:
    """Five full ciphertexts [n+1, 88] (src/snark.h:14-20)."""

    h: jnp.ndarray
    hat_h: jnp.ndarray
    hat_v: jnp.ndarray
    v_w: jnp.ndarray
    b_w: jnp.ndarray

    def stack(self) -> jnp.ndarray:
        return jnp.stack([self.h, self.hat_h, self.hat_v, self.v_w, self.b_w])


# --------------------------------------------------------------------------
# Entropy stream layout (replicates the reference's getrandom call order).
# --------------------------------------------------------------------------


def err_bytes(params: Params) -> int:
    """Bytes per encryption-error draw (errdist_uniform, src/lwe.c:60-63)."""
    return (params.log_sigma + 3) // 8  # 69


def enc_entropy_bytes(params: Params) -> int:
    """Error draw + dead sign byte (src/lwe.c:85-87) per encryption."""
    return err_bytes(params) + 1  # 70


def smudge_entropy_bytes(params: Params) -> int:
    """Smudging draw + sign byte (src/lwe.c:65-76)."""
    return params.log_smudging // 8 + 1  # 81


def setup_entropy_bytes(params: Params) -> int:
    """alpha/beta/s (24) + sk (92n) + per-encryption draws."""
    n_enc = 2 * params.d + 1 + (params.m - 1)
    return 24 + params.logq_bytes * params.n + n_enc * enc_entropy_bytes(params)


def prover_entropy_bytes(params: Params) -> int:
    """delta (8) + 5 smudge draws."""
    return 8 + 5 * smudge_entropy_bytes(params)


def _err_digits(ent: sampling.PRGKey, offset: int, count: int, params: Params):
    """count error draws as digit rows [count, 88] (69 live bytes each).

    Each draw consumes enc_entropy_bytes (incl. the dead sign byte whose
    stream slot the reference burns — SURVEY §2 quirk 2)."""
    rows = sampling.sample_digit_rows(
        ent, offset, count, draw_bytes=enc_entropy_bytes(params),
        ndigits=err_bytes(params),
    )
    return tlwe.pad_digits(rows)


# --------------------------------------------------------------------------
# setup
# --------------------------------------------------------------------------


def setup(
    crs_key: sampling.PRGKey,
    ent_key: sampling.PRGKey,
    ent_offset: int,
    ssp: tssp.SSPDev,
    params: Params,
    *,
    tile: int | None = None,
    mesh=None,
) -> tuple[CRSDev, VRSDev]:
    """CRS/VRS generation (src/snark.c:57-115), jit-friendly.

    One CRS keystream runs sequentially through sections at offsets
    CTR_S/CTR_AS/CTR_BT/CTR_BV (src/snark.h:8-12); the entropy stream is
    consumed in the reference's draw order: alpha, beta, s, sk, then one
    error+sign pair per encryption.

    With ``mesh`` set, the 2d+m encryptions shard over the CRS-term axis
    (parallel/mesh.py) — bit-identical output, zero collectives.
    """
    d, m, n = params.d, params.m, params.n

    if mesh is not None:
        from ..parallel import mesh as pmesh

        def enc_section(key, off, sk, msgs, errs, params, tile=None):
            return pmesh.encrypt_section_sharded(
                key, off, sk, msgs, errs, params, mesh, tile=tile
            )
    else:
        enc_section = tlwe.encrypt_section

    scalars = sampling.keystream_bytes(ent_key, ent_offset, 24).reshape(3, 8)
    alpha, beta, s = (modp.bytes_to_u64_mod_p(scalars[i]) for i in range(3))
    sk = tlwe.key_gen(ent_key, ent_offset + 24, params)

    # The per-encryption error draws are one contiguous entropy run in
    # exactly the CRS term order (s, as, t, v — src/snark.c:75-110).
    e_base = ent_offset + 24 + params.logq_bytes * n
    n_enc = 2 * d + 1 + (m - 1)
    errs = _err_digits(ent_key, e_base, n_enc, params)

    powers = modp.powers_mod_p(s, d)  # [d]: s^i
    # beta * t(s), beta * v_i(s): one exact int8 MXU matmul over byte
    # planes (modp.matvec_mod_p) instead of m*d VPU mulmods
    t_s = modp.matvec_mod_p(ssp.t[None, :], powers)[0]
    if mesh is not None:
        from ..parallel import mesh as pmesh2

        v_s = pmesh2.v_at_s_sharded(ssp.v, powers, mesh)  # [m], row-sharded
    else:
        v_s = modp.matvec_mod_p(ssp.v, powers)
    msgs = jnp.concatenate([
        powers,                            # s^i            (CTR_S)
        modp.mulmod_p(alpha, powers),      # alpha s^i      (CTR_AS)
        modp.mulmod_p(beta, t_s)[None],    # beta t(s)      (CTR_BT)
        modp.mulmod_p(beta, v_s[1:]),      # beta v_i(s)    (CTR_BV)
    ])

    # The four CTR_* sections are back-to-back in the CRS stream
    # (src/snark.h:8-12), so all 2d+m encryptions run as ONE fused
    # kernel launch from CTR_S — no per-section dispatch gaps and a
    # single contiguous keystream sweep.
    rows = enc_section(crs_key, params.ctr_s, sk, msgs, errs, params, tile=tile)
    # Materialize ONCE before the four section slices (same XLA fusion-
    # duplication hazard as _prover_evals_onepass' five-way split).
    rows = jax.lax.optimization_barrier(rows)

    crs = CRSDev(
        seed=crs_key.seed, b_s=rows[:d], b_as=rows[d : 2 * d],
        b_t=rows[2 * d], b_v=rows[2 * d + 1 :],
    )
    vrs = VRSDev(alpha=alpha, beta=beta, s=s, sk=sk)
    return crs, vrs


# --------------------------------------------------------------------------
# prover
# --------------------------------------------------------------------------


def _pad_multiple(x: jnp.ndarray, mult: int, axis: int = 0) -> jnp.ndarray:
    """Zero-pad axis to a multiple of mult (>= 2 keeps AES-block alignment).

    Padding the b_v evaluation with zero coefficients adds exact zeros to
    the MAC; the dummy terms read keystream past the section end, which
    no real term consumes."""
    extra = -x.shape[axis] % mult
    if extra == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, extra)
    return jnp.pad(x, pad)


def _prover_evals_onepass(
    crs_key: sampling.PRGKey,
    crs: CRSDev,
    w: jnp.ndarray,
    h: jnp.ndarray,
    v: jnp.ndarray,
    delta: jnp.ndarray,
    witness: jnp.ndarray,
    params: Params,
    *,
    lane_w: int = 512,
    interpret: bool = False,
) -> tuple:
    """All five prover evaluations in ONE fused kernel sweep.

    The CRS sections are back-to-back in the stream (src/snark.h:8-12),
    so (w, h over s), (v, h over as) and the b_w combination
    (delta at the bt term + witness bits over bv, src/snark.c:140-155)
    are five coefficient lanes over the SAME contiguous term range —
    each lane zero outside its section.  One launch regenerates the
    whole 11.8 GB keystream exactly once (the reference walks it four
    times); delta folds in as a traced coefficient, so no ct_import of
    Enc(beta t) is needed either.  Wall time matches the stage-wise
    path (both are keystream-bound and XLA already pipelines the
    separate launches); kept for the single-launch structure — the
    whole prover hot path is one kernel sweep.

    int32 safety: the kernel's per-lane MAC planes are bounded by the
    lane's NONZERO term count (zero coefficients contribute exactly 0),
    <= max(d, m) * 255^2 < 2^31 — the generic eval_poly_multi d-bound
    does not apply to block-sparse lanes, hence the direct
    eval_poly_multi_fused call.  Returns (v_w, h@s, hat_v, hat_h, b_w).
    """
    d, m = params.d, params.m
    total = 2 * d + 1 + (m - 1)
    pad = -total % (2 * lane_w)
    tp = total + pad
    coeffs = jnp.zeros((5, tp), jnp.uint32)
    coeffs = coeffs.at[0, :d].set(w)
    coeffs = coeffs.at[1, :d].set(h)
    coeffs = coeffs.at[2, d : 2 * d].set(v)
    coeffs = coeffs.at[3, d : 2 * d].set(h)
    coeffs = coeffs.at[4, 2 * d].set(delta)
    coeffs = coeffs.at[4, 2 * d + 1 :].set(
        jnp.pad(witness[: m - 1].astype(jnp.uint32), (0, pad))
    )
    b_all = jnp.concatenate([
        crs.b_s, crs.b_as, crs.b_t[None], crs.b_v,
        jnp.zeros((pad, crs.b_s.shape[-1]), jnp.uint8),
    ])
    out = tlwe.eval_poly_multi_fused(
        crs_key, params.ctr_s, b_all, coeffs, params,
        lane_w=lane_w, interpret=interpret,
    )
    # Materialize ONCE before slicing: five sliced roots otherwise make
    # XLA duplicate the whole eval epilogue per output (measured +90 ms
    # at release shapes — fusion duplication, not slice cost).
    out = jax.lax.optimization_barrier(out)
    return out[0], out[1], out[2], out[3], out[4]


def prover(
    crs_key: sampling.PRGKey,
    ent_key: sampling.PRGKey,
    ent_offset: int,
    crs: CRSDev,
    ssp: tssp.SSPDev,
    witness: jnp.ndarray,
    params: Params,
    *,
    tile: int | None = None,
    mesh=None,
) -> ProofDev:
    """src/snark.c:117-190 with fused two-polynomial evaluations.

    witness: uint8 bit vector [m] (bit i-1 gates v_i, i in [1, m)).
    With ``mesh`` set, each evaluation shards its degree axis over the
    mesh (partial MACs + one psum each — parallel/mesh.py); on a
    single-chip Pallas backend the five evaluations run as ONE kernel
    sweep of the contiguous CRS stream (_prover_evals_onepass).
    """
    d, m, n = params.d, params.m, params.n
    p_u32 = jnp.uint32(params.p)

    if mesh is not None:
        from ..parallel import mesh as pmesh

        def eval_multi(key, off, b_rows, coeffs, params, tile=None):
            return pmesh.eval_poly_multi_sharded(
                key, off, b_rows, coeffs, params, mesh, tile=tile
            )
    else:
        eval_multi = tlwe.eval_poly_multi

    delta = modp.bytes_to_u64_mod_p(
        sampling.keystream_bytes(ent_key, ent_offset, 8)
    )

    # w = delta*t + sum_{witness bit i-1} v_i   (coeff domain, mod p;
    # the gated row-sum runs as byte-plane MXU matmuls — ops/modp.py)
    gate = witness[: m - 1]  # gates v_1..v_{m-1}
    w = modp.addmod_p(
        modp.mulmod_p(delta, ssp.t), modp.gated_rowsum_mod_p(ssp.v[1:], gate)
    )

    # v = v_0 + w;  h = (v^2 - 1) / t   (CRT-NTT engine; with a mesh the
    # large transforms run 4-step sharded over ICI — ops/ntt.py)
    v = modp.addmod_p(ssp.v[0], w)
    v_sq = ntt.poly_mul_mod_p(v, v, mesh=mesh)  # [2d-1]
    num = v_sq.at[0].set(modp.submod_p(v_sq[0], jnp.uint32(1)))
    h = ntt.poly_div_exact_mod_p(num, ssp.t, d, mesh=mesh)

    one_pass = (
        mesh is None and tile is None
        and sampling._default_backend() == "pallas"
        and params.n % 2 == 0
        # per-lane int32 bound of the fused kernel (see onepass docstring)
        and max(d, m) * 255 * 255 < 2**31
        # the fused kernel needs a byte-aligned lead (holds today because
        # ctr_s is statically 0; guard against future layout changes)
        and params.ctr_s % 16 % 8 == 0
    )
    if one_pass:
        v_w, h_ct, hat_v, hat_h, b_w = _prover_evals_onepass(
            crs_key, crs, w, h, v, delta, witness, params
        )
    else:
        # b_w = delta * ct(beta t) + sum_{witness} ct(beta v_i): the
        # masked sum is a homomorphic evaluation with 0/1 coefficients.
        ct_bt = tlwe.ct_import(crs_key, params.ctr_bt, crs.b_t[None], params)[0]
        # pad so the default eval tiling divides the padded degree: to
        # the fused kernel's 2*lane_w grid when the section is large
        # (CTR_BV's half-block offset rides the kernel's lead-prefix
        # path), else a full scan tile, else even (one whole-set tile)
        if tile is None and (m - 1) >= 1024:
            bw_mult = 1024
        else:
            bw_mult = (tile or 256) if (m - 1) >= (tile or 256) else 2
        bw_coeffs = _pad_multiple(witness[: m - 1].astype(jnp.uint32), bw_mult)
        bw_rows = _pad_multiple(tlwe.pad_digits(crs.b_v), bw_mult)
        b_w = tlwe.ct_add(
            tlwe.ct_mul_ui(ct_bt, delta),
            eval_multi(
                crs_key, params.ctr_bv, bw_rows, bw_coeffs[None], params,
                tile=tile,
            )[0],
        )
        # fused evaluations: (w, h) over the s section, (v, h) over as
        ev_s = eval_multi(
            crs_key, params.ctr_s, crs.b_s, jnp.stack([w, h]), params,
            tile=tile,
        )
        ev_as = eval_multi(
            crs_key, params.ctr_as, crs.b_as, jnp.stack([v, h]), params,
            tile=tile,
        )
        v_w, h_ct = ev_s[0], ev_s[1]
        hat_v, hat_h = ev_as[0], ev_as[1]

    # smudging, reference order: h, hat_h, hat_v, v_w, v_w (quirk: v_w
    # twice, b_w never — src/snark.c:184-189)
    sm = sampling.sample_digit_rows(
        ent_key, ent_offset + 8, 5,
        draw_bytes=smudge_entropy_bytes(params),
        ndigits=smudge_entropy_bytes(params),
    )
    s_digits = tlwe.pad_digits(sm[:, :-1])  # [5, 88]
    signs = (sm[:, -1] & 1) == 0  # low bit 0 -> positive (src/lwe.c:52-58)

    h_ct = tlwe.smudge(h_ct, s_digits[0], signs[0], params)
    hat_h = tlwe.smudge(hat_h, s_digits[1], signs[1], params)
    hat_v = tlwe.smudge(hat_v, s_digits[2], signs[2], params)
    v_w = tlwe.smudge(v_w, s_digits[3], signs[3], params)
    v_w = tlwe.smudge(v_w, s_digits[4], signs[4], params)
    return ProofDev(h=h_ct, hat_h=hat_h, hat_v=hat_v, v_w=v_w, b_w=b_w)


# --------------------------------------------------------------------------
# verifier
# --------------------------------------------------------------------------


@functools.cache
def _test_error_thresholds() -> tuple:
    """Host constants p * 2^(64j) for j < 11 as uint8 digit rows [11, 88].

    floor(x/p) >= 2^(64j) iff x >= p * 2^(64j); counting the satisfied
    thresholds gives the exact GMP limb count of floor(x/p) for any
    x < 2^704 (the quotient is < 2^672 = 10.5 limbs).
    """
    p = (1 << 32) - 5
    rows = dg.ints_to_digit_matrix(
        [(p << (64 * j)) % (1 << 704) for j in range(11)]
    )
    # p * 2^640 still fits 704 bits (no wrap); assert to be safe.
    assert all((p << (64 * j)) < (1 << 704) for j in range(11))
    return tuple(map(tuple, rows))


def test_error_ok(
    vrs: VRSDev, proof: ProofDev, params: Params
) -> jnp.ndarray:
    """The reference verifier's "test-error" bound (src/snark.c:237-241).

    test = ceil(-(<b_w.a, sk> mod 2^704) / p) = -floor(dot / p); the
    reference rejects when SIZ(test) >= GAMMA_LOG_SMUDGING/8 = 80 limbs.
    GMP's SIZ is the *signed* limb count (negative here since test <= 0)
    and |test| < 2^672 = 11 limbs, so the check always passes at these
    parameters — computed literally anyway: the signed limb count of the
    quotient is derived on device from 11 threshold comparisons.
    """
    dot = dg.bigint_dot(tlwe.ct_a(proof.b_w), vrs.sk)  # [88] mod 2^704
    thr = jnp.asarray(np.asarray(_test_error_thresholds(), np.uint8))
    qlimbs = jnp.sum(dg.digits_ge(dot[None, :], thr).astype(jnp.int32))
    siz = -qlimbs  # SIZ of the (non-positive) mpz test value
    return siz < jnp.int32(params.log_smudging // 8)


def verifier(
    vrs: VRSDev, ssp: tssp.SSPDev, proof: ProofDev, params: Params
) -> jnp.ndarray:
    """Decrypt the proof, check the mod-p relations (src/snark.c:192-250).

    Returns a bool scalar.  All five checks run on device, including the
    reference's "test-error" noise bound (vacuous at these parameters —
    see test_error_ok — but computed for literal parity).
    """
    cts = proof.stack()  # [5, n+1, 88]
    dec = tlwe.decrypt(cts, vrs.sk, params)  # [5]
    h_s, hath_s, hatv_s, w_s, b_s = (dec[i] for i in range(5))

    t_s = modp.poly_eval_mod_p(ssp.t, vrs.s)
    v0_s = modp.poly_eval_mod_p(ssp.v[0], vrs.s)
    v_s = modp.addmod_p(v0_s, w_s)

    eq_pke1 = modp.mulmod_p(h_s, vrs.alpha) == hath_s
    eq_pke2 = modp.mulmod_p(v_s, vrs.alpha) == hatv_s
    lhs = modp.submod_p(
        modp.submod_p(modp.mulmod_p(v_s, v_s), jnp.uint32(1)),
        modp.mulmod_p(h_s, t_s),
    )
    eq_div = lhs == jnp.uint32(0)
    eq_lin = modp.mulmod_p(w_s, vrs.beta) == b_s
    eq_err = test_error_ok(vrs, proof, params)
    return eq_pke1 & eq_pke2 & eq_div & eq_lin & eq_err
