"""Multi-host helpers at process_count == 1 (CI has one host).

The sharded compute paths they feed are bit-exactness-tested on the
8-device virtual mesh in test_parallel.py.
"""

import jax

from c_lwe_snarks_tpu.parallel import multihost


def test_initialize_single_host_noop():
    multihost.initialize()  # must not raise or spawn a coordinator
    assert jax.process_count() == 1


def test_global_mesh_covers_all_devices():
    mesh = multihost.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("shard",)


def test_local_shard_bounds():
    lo, hi = multihost.local_shard_bounds(100)
    assert (lo, hi) == (0, 100)
    lo, hi = multihost.local_shard_bounds(0)
    assert (lo, hi) == (0, 0)
