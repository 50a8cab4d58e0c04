"""Multi-host execution: DCN initialization + host-sliced protocol stages.

The reference is single-process (SURVEY §1); everything here is greenfield
TPU design.  The enabling property is the same one mesh.py uses on ICI:
AES-CTR's O(1) seek means any host can regenerate exactly its slice of
the CRS keystream from (seed, byte offset) — no keystream ever crosses
DCN, only the compressed 92-byte b-rows (8 MB for the whole release CRS)
and the small proof ciphertexts.

Deployment model (standard JAX multi-controller SPMD):

* every host runs the same program and calls ``initialize()`` first;
* ``global_mesh()`` builds a 1-D mesh over ALL devices of the slice;
  `mesh.encrypt_section_sharded` / `mesh.eval_poly_multi_sharded` then
  shard over that mesh unchanged — XLA routes the one psum per fused
  evaluation over ICI within hosts and DCN across;
* per-shard stream positions are computed host-side as python ints
  (mesh._chunk_parts), identically on every host — no coordination.

This module is exercised in CI only at process_count=1 (the test
environment has one host); the mesh-sharded code paths it feeds are
bit-exactness-tested on an 8-device virtual mesh (tests/test_parallel.py).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

from . import mesh as pmesh


def _distributed_client():
    """The live jax distributed-service client, or None.

    Read from jax's internal global state instead of jax.process_count():
    any device/process API call initializes the XLA backend, after which
    jax.distributed.initialize() unconditionally raises — probing with
    process_count() would make multi-host startup impossible.
    """
    try:
        from jax._src import distributed as _dist

        return _dist.global_state.client
    except Exception:  # noqa: BLE001 — internal layout changed; assume none
        return None


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed.initialize with env/metadata auto-detection.

    Must run before ANY jax call that initializes the XLA backend
    (jax.devices, jax.process_count, array ops...).  No-op when the
    distributed service is already initialized, or when nothing indicates
    a multi-process launch (no explicit args and no JAX_COORDINATOR_ADDRESS
    / Cloud-TPU metadata environment).
    """
    if _distributed_client() is not None:
        return  # already initialized
    explicit = coordinator_address is not None or (num_processes or 1) > 1
    env_auto = any(
        os.environ.get(v)
        for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                  "MEGASCALE_COORDINATOR_ADDRESS")
    # single-entry TPU_WORKER_HOSTNAMES means a one-host slice: nothing
    # to coordinate (and dev tunnels set it to "localhost")
    ) or ("," in os.environ.get("TPU_WORKER_HOSTNAMES", ""))
    if not explicit and not env_auto:
        return  # single-host run: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = pmesh.AXIS) -> Mesh:
    """1-D mesh over every device of every host (ICI + DCN)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def local_shard_bounds(total: int) -> tuple[int, int]:
    """[start, end) of this host's contiguous chunk of `total` items.

    The same chunking rule as mesh._chunk_parts applied at host
    granularity — used for host-local IO (e.g. writing this host's CRS
    b-row slice to its own file)."""
    nproc = jax.process_count()
    chunk = -(-total // nproc)
    start = min(jax.process_index() * chunk, total)
    return start, min(start + chunk, total)
