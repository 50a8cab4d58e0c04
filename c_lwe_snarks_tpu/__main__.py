"""CLI driver: run the full protocol end-to-end (main.c analog, grown up).

    python -m c_lwe_snarks_tpu [--profile toy|release] [--d D --m M]
        [--mesh N] [--save-dir DIR] [--probe]

Runs random_ssp -> setup -> prover -> verifier with seeded entropy,
prints stage timings, optionally persists the CRS/VRS/proof in the
compressed byte formats, and optionally runs the designated-verifier
decrypt-probes after setup and prove.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax

from .models import snark as tsnark
from .models import ssp as tssp
from .ops import sampling
from .utils import obs, serial
from .utils import params as params_mod


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="c_lwe_snarks_tpu")
    ap.add_argument("--profile", default="toy", choices=["toy", "release"])
    ap.add_argument("--d", type=int)
    ap.add_argument("--m", type=int)
    ap.add_argument("--mesh", type=int, help="shard over N devices")
    ap.add_argument("--save-dir", help="persist crs/vrs/proof here")
    ap.add_argument("--probe", action="store_true",
                    help="run decrypt-probes after setup and prove")
    ap.add_argument("--crs-seed", default="00" * 40, help="40-byte hex")
    ap.add_argument("--ent-seed", default="01" * 40, help="40-byte hex")
    args = ap.parse_args(argv)

    P = (params_mod.custom(d=args.d, m=args.m) if args.d and args.m
         else getattr(params_mod, args.profile)())
    print(f"params: {P}", file=sys.stderr)

    mesh = None
    if args.mesh:
        from .parallel import mesh as pmesh

        mesh = pmesh.make_mesh(args.mesh)
        print(f"mesh: {args.mesh} devices", file=sys.stderr)

    crs_key = sampling.PRGKey(bytes.fromhex(args.crs_seed))
    ent_key = sampling.PRGKey(bytes.fromhex(args.ent_seed))
    off_setup = tssp.entropy_bytes_random_ssp(P)
    off_prove = off_setup + tsnark.setup_entropy_bytes(P)

    with obs.timeit("random_ssp"):
        wits, inst = jax.jit(lambda: tssp.random_ssp(ent_key, 0, P))()
        jax.block_until_ready(inst.v)
    with obs.timeit("setup"):
        crs, vrs = jax.jit(
            lambda i: tsnark.setup(crs_key, ent_key, off_setup, i, P, mesh=mesh)
        )(inst)
        jax.block_until_ready(crs.b_s)
    if args.probe:
        checks = obs.probe_crs(crs, vrs, P)
        print(f"crs probe: { {k: bool(v) for k, v in checks.items()} }",
              file=sys.stderr)
        assert all(bool(v) for v in checks.values())
    with obs.timeit("prover"):
        pi = jax.jit(
            lambda c, i, w: tsnark.prover(
                crs_key, ent_key, off_prove, c, i, w, P, mesh=mesh
            )
        )(crs, inst, wits)
        jax.block_until_ready(pi.h)
    if args.probe:
        pchecks = obs.probe_proof(pi, vrs, P)
        print(f"proof probe: pke_h={bool(pchecks['pke_h'])}", file=sys.stderr)
        assert bool(pchecks["pke_h"])
    with obs.timeit("verifier"):
        ok = bool(jax.jit(lambda v, i, p: tsnark.verifier(v, i, p, P))(
            vrs, inst, pi
        ))

    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
        serial.save(os.path.join(args.save_dir, "crs.bin"),
                    serial.crs_to_bytes(crs, P))
        serial.save(os.path.join(args.save_dir, "vrs.bin"),
                    serial.vrs_to_bytes(vrs, P))
        serial.save(os.path.join(args.save_dir, "proof.bin"),
                    serial.proof_to_bytes(pi, P))
        serial.save(os.path.join(args.save_dir, "ssp.bin"),
                    serial.ssp_to_buffer(inst, P))
        print(f"artifacts saved to {args.save_dir}", file=sys.stderr)

    print(f"verified: {ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
