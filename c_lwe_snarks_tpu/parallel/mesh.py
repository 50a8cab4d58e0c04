"""Multi-chip sharding for the SNARK pipeline: mesh + shard_map layer.

The reference is single-threaded C (SURVEY §1: zero OpenMP pragmas, no
MPI/NCCL); every distributed capability here is greenfield TPU design.
The enabling property is AES-CTR's O(1) seek (reference rng_seek,
src/entropy.c:46-56): the CRS keystream is a pure function of
(seed, byte offset), so each shard regenerates exactly its slice of the
stream from counter arithmetic — no keystream ever moves over ICI.

Two sharded primitives cover the protocol's heavy sections:

* ``encrypt_section_sharded`` — setup's 2d+m encryptions
  (src/snark.c:75-110) are embarrassingly parallel over the CRS-term
  axis: shard i encrypts the contiguous chunk [i*c, (i+1)*c) from its own
  stream position.  ZERO collectives.
* ``eval_poly_multi_sharded`` — the prover's hot loop
  (src/lwe.c:176-186) is an inner product over the degree axis: each
  shard MACs its d/P-term slice, carry-folds the partial to normalized
  digits, and ONE psum of [k, n+1, 88] int32 (~1 MB) rides ICI per
  fused evaluation pair (post-psum positions <= 255 * nshards).

Per-shard stream positions are computed host-side as exact python ints
and shipped as a sharded uint32 [P, 3] array (skip, ctr_lo, ctr_hi) —
SPMD-safe even though CTR_CT = 92n is not AES-block aligned.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models import lwe as tlwe
from ..models import ssp as tssp
from ..ops import digits as dg
from ..ops import modp, sampling
from ..utils.params import Params

AXIS = "shard"


def make_mesh(n_devices: int | None = None, axis: str = AXIS) -> Mesh:
    """1-D device mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _mesh_axis(mesh: Mesh) -> tuple[str, int]:
    (axis,) = mesh.axis_names
    return axis, mesh.shape[axis]


def _chunk_parts(
    section_offset: int, per_item_bytes: int, chunk: int, nshards: int
) -> np.ndarray:
    """Per-shard stream positions: uint32 [P, 3] (skip, ctr_lo, ctr_hi)."""
    return np.stack(
        [
            sampling.offset_parts(section_offset + i * chunk * per_item_bytes)
            for i in range(nshards)
        ]
    )


def _pad_to(x: jnp.ndarray, total: int) -> jnp.ndarray:
    if x.shape[0] == total:
        return x
    pad = [(0, total - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def _chunk_align(params: Params) -> int:
    """Smallest even per-shard chunk multiple keeping shard strides
    AES-block aligned: with chunk * CTR_CT ≡ 0 (mod 16) every shard's
    intra-block skip equals the section's own (one static lead), so no
    per-shard traced skip is needed and the fused Pallas kernels stay
    eligible.  Even n needs chunk % 2 == 0 (92n ≡ 0 mod 8); odd n needs
    chunk % 4 == 0 (92n ≡ 4 or 12 mod 16)."""
    return max(2, 16 // math.gcd(params.ctr_ct, 16))


def encrypt_section_sharded(
    key: sampling.PRGKey,
    section_offset: int,
    sk: jnp.ndarray,
    msgs: jnp.ndarray,
    errs: jnp.ndarray,
    params: Params,
    mesh: Mesh,
    *,
    tile: int | None = None,
    impl: str = "auto",
    lane_w: int = 512,
    interpret: bool = False,
    check_vma: bool = True,
) -> jnp.ndarray:
    """Compressed b-rows [B, 88], B encryptions sharded over CRS terms.

    Bit-identical to ``lwe.encrypt_section`` (itself == B sequential
    reference encryptions, src/snark.c:75-110): shard i re-derives the
    stream position of term i*c by counter arithmetic.  A ragged tail is
    padded with dummy terms on the last shard (they consume keystream
    past the section, whose bytes no real term reads) and dropped.
    ``impl``/``lane_w``/``interpret`` pass through to the per-shard
    encrypt_section (interpret-mode CI coverage of the fused path).
    """
    axis, nshards = _mesh_axis(mesh)
    total = msgs.shape[0]
    # Aligned per-shard chunks keep every shard's block phase equal to
    # the section's (chunk * CTR_CT ≡ 0 mod 16), so the lead is one
    # static int and the fused Pallas kernel is eligible inside the
    # shard.  For odd n this needs chunk % 4 == 0, not just even — a
    # merely-even chunk leaves odd shards 8 bytes off (_chunk_align).
    align = _chunk_align(params)
    chunk = -(-total // nshards)
    chunk = -(-chunk // align) * align
    assert (chunk * params.ctr_ct) % 16 == 0, (chunk, params.ctr_ct)
    padded = chunk * nshards
    lead = section_offset % 16
    offs = _chunk_parts(section_offset, params.ctr_ct, chunk, nshards)
    msgs_p = _pad_to(msgs, padded)
    errs_p = _pad_to(errs, padded)

    def shard_fn(offs_l, msgs_l, errs_l, sk_l):
        off = (lead, (offs_l[0][1], offs_l[0][2]))
        return tlwe.encrypt_section(
            key, off, sk_l, msgs_l, errs_l, params, tile=tile,
            impl=impl, lane_w=lane_w, interpret=interpret,
            vma={axis} if check_vma else None,
        )

    out = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=check_vma,
    )(jnp.asarray(offs), msgs_p, errs_p, sk)
    return out[:total]


def eval_poly_multi_sharded(
    key: sampling.PRGKey,
    section_offset: int,
    b_rows: jnp.ndarray,
    coeffs: jnp.ndarray,
    params: Params,
    mesh: Mesh,
    *,
    tile: int | None = None,
    impl: str = "auto",
    lane_w: int = 512,
    interpret: bool = False,
    check_vma: bool = True,
) -> jnp.ndarray:
    """k fused homomorphic evaluations, degree axis sharded over the mesh.

    Each shard MACs its slice of the d terms (regenerating only its
    keystream slice), carry-folds its partial to normalized digits
    (positions <= 255), then one int32 psum + carry_fold yields the exact
    eval_poly result (src/lwe.c:176-186) replicated on every shard.
    Normalizing before the psum bounds the reduced positions by
    255 * nshards, so any realistic mesh size (< 2^23 shards) is safe.
    """
    axis, nshards = _mesh_axis(mesh)
    k, d = coeffs.shape
    # Aligned per-shard chunks (chunk * CTR_CT ≡ 0 mod 16) keep every
    # shard's intra-block skip equal to the section lead — see
    # _chunk_align; odd n needs chunk % 4 == 0, not just even.
    align = _chunk_align(params)
    chunk = -(-d // nshards)
    chunk = -(-chunk // align) * align
    lead = section_offset % 16
    # On a Pallas backend, round the chunk up to the fused MAC kernel's
    # 2*lane_w grid so every shard runs the single-kernel path (zero
    # coefficients pad exactly); otherwise mirror the scan tiling.
    use_fused = impl == "fused" or (
        impl == "auto"
        and sampling._default_backend() == "pallas"
        and lead % 8 == 0
        and params.n % 2 == 0
        and chunk >= 512
        # int32 bound of the fused kernel's MAC planes (per-shard degree)
        and (-(-chunk // (2 * lane_w)) * 2 * lane_w) * 255 * 255 < 2**31
    )
    if use_fused:
        chunk = -(-chunk // (2 * lane_w)) * 2 * lane_w
    elif tile is not None:
        chunk = -(-chunk // tile) * tile
    elif chunk > 256:
        # eval_poly_multi_acc defaults to tile=256 and requires the chunk
        # to divide evenly; mirror the explicit-tile branch.
        chunk = -(-chunk // 256) * 256
    assert (chunk * params.ctr_ct) % 16 == 0, (chunk, params.ctr_ct)
    padded = chunk * nshards
    offs = _chunk_parts(section_offset, params.ctr_ct, chunk, nshards)
    # Padding coefficients with zeros adds exact zeros to the MAC (the
    # dummy terms' keystream rows are multiplied by 0).
    coeffs_p = _pad_to(coeffs.T, padded).T
    b_p = _pad_to(b_rows[:, : dg.DIGITS], padded)

    def shard_fn(offs_l, b_l, c_l):
        off = (lead, (offs_l[0][1], offs_l[0][2]))
        if use_fused:
            part = tlwe.eval_poly_multi_fused(
                key, off, b_l, c_l, params,
                lane_w=lane_w, interpret=interpret,
                vma={axis} if check_vma else None,
            ).astype(jnp.int32)
        else:
            acc = tlwe.eval_poly_multi_acc(
                key, off, b_l, c_l, params, tile=tile, axis_name=axis
            )
            # Normalize the shard partial to digits (<= 255 per position)
            # before the reduction: mod-2^704 truncation is a ring hom,
            # so summing normalized per-shard values mod 2^704 equals the
            # total, and the psum'd positions stay < 256 * nshards — no
            # int32 overflow at any realistic shard count.
            part = dg.carry_fold(acc).astype(jnp.int32)
        return dg.carry_fold(jax.lax.psum(part, axis))

    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(None, axis)),
        out_specs=P(),
        check_vma=check_vma,
    )(jnp.asarray(offs), b_p, coeffs_p)


def random_ssp_sharded(
    key: sampling.PRGKey,
    byte_offset: int,
    params: Params,
    mesh: Mesh,
    *,
    tile: int = 256,
) -> tuple[jnp.ndarray, tssp.SSPDev]:
    """random_ssp (src/ssp.c:37-77) with the m polynomial rows sharded.

    Each shard regenerates its own slice of the entropy stream (a row is
    exactly 8d bytes, block-aligned for even d, so per-shard positions are
    pure counter arithmetic) and computes a masked partial column-sum for
    t; two uint32 psums of 16-bit halves (exact to 2^16 shards) + one
    mod-p fold make t exact and replicated.  v comes back sharded over m;
    t matches the single-chip scan bit-for-bit (tests/test_parallel.py).
    """
    axis, nshards = _mesh_axis(mesh)
    m, d = params.m, params.d
    assert (8 * d) % 16 == 0, "polynomial rows must be AES-block aligned"
    assert byte_offset % 16 == 0, "random_ssp section must be block-aligned"
    wb, pad = tssp.witness_pad_bytes(params)
    wits = tssp.witness_bits(sampling.keystream_bytes(key, byte_offset, wb), m)

    chunk = -(-m // nshards)
    tile_s = min(tile, chunk)
    chunk = -(-chunk // tile_s) * tile_s
    m_pad = chunk * nshards
    offs = _chunk_parts(byte_offset + wb + pad, 8 * d, chunk, nshards)
    # t-mask: v_0 always, v_i gated by witness bit i-1; padding rows off.
    mask = jnp.concatenate(
        [jnp.ones((1,), jnp.uint8), wits[: m - 1],
         jnp.zeros((m_pad - m,), jnp.uint8)]
    )

    def shard_fn(offs_l, mask_l):
        _, ctr0 = sampling.parts_to_offset(offs_l[0])  # skip == 0 (aligned)
        v_l, t_l = tssp.gen_v_scan(key, ctr0, mask_l, d, tile_s, axis_name=axis)
        # Partials are already reduced mod p but a plain uint32 psum could
        # wrap; psum 16-bit halves (exact for <= 2^16 shards) and fold the
        # 48-bit totals back mod p.
        lo = jax.lax.psum(t_l & jnp.uint32(0xFFFF), axis)
        hi = jax.lax.psum(t_l >> 16, axis)
        add = hi << 16
        s = add + lo
        top = (hi >> 16) + (s < add).astype(jnp.uint32)
        return v_l, modp.fold64_mod_p(top, s)

    v, t = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P()),
    )(jnp.asarray(offs), mask)
    v = v[:m]
    t = t.at[0].set(modp.submod_p(t[0], jnp.uint32(1)))
    return wits, tssp.SSPDev(t=t, v=v)


def v_at_s_sharded(
    v: jnp.ndarray, powers: jnp.ndarray, mesh: Mesh
) -> jnp.ndarray:
    """v_i(s) for all m polynomials, row axis sharded over the mesh.

    Setup's message schedule (src/snark.c:103-110) evaluates every v_i at
    the trapdoor point s; with the powers vector replicated the [m, d]
    mod-p matvec is embarrassingly parallel over rows — zero collectives.
    """
    axis, nshards = _mesh_axis(mesh)
    m = v.shape[0]
    chunk = -(-m // nshards)
    v_p = _pad_to(v, chunk * nshards)

    def shard_fn(v_l, pw):
        return modp.matvec_mod_p(v_l, pw)

    out = shard_map(
        shard_fn, mesh=mesh, in_specs=(P(axis), P()), out_specs=P(axis)
    )(v_p, powers)
    return out[:m]


def eval_poly_sharded(
    key: sampling.PRGKey,
    section_offset: int,
    b_rows: jnp.ndarray,
    coeffs: jnp.ndarray,
    params: Params,
    mesh: Mesh,
    *,
    tile: int | None = None,
) -> jnp.ndarray:
    """Single-polynomial wrapper: uint8 [n+1, 88]."""
    return eval_poly_multi_sharded(
        key, section_offset, b_rows, coeffs[None], params, mesh, tile=tile
    )[0]
