"""parallel subpackage: device meshes and sharded protocol sections."""

from . import mesh  # noqa: F401
