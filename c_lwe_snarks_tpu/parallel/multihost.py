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

import jax
import numpy as np
from jax.sharding import Mesh

from . import mesh as pmesh


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed.initialize with env-var fallback.

    On Cloud TPU pods the three arguments auto-detect from the metadata
    server; pass them explicitly elsewhere.  Must run before any jax
    device API.  No-op when already initialized or single-process.
    """
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is None and num_processes in (None, 1):
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
