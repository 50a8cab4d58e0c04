"""c_lwe_snarks_tpu — TPU-native designated-verifier lattice zk-SNARK framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the C
reference library "mangiafuoco" (LWE/SSP SNARKs of Gennaro–Minelli–
Nitulescu–Orrù, CCS'18): AES-CTR PRG expansion, Regev encryption over
Z_{2^704}, homomorphic polynomial evaluation, and the setup/prove/verify
protocol — all mapped onto the MXU/VPU as batched int8 digit-plane
arithmetic, sharded over device meshes for multi-chip scale.

Layers (bottom-up):
  utils/     parameters, entropy plumbing, serialization, stats
  oracle/    bit-exact host reference (the conformance referee)
  ops/       TPU kernels: bitsliced AES-CTR, digit matmuls, carries, NTT
  models/    LWE scheme, SSP instances, SNARK protocol on TPU
  parallel/  mesh construction and sharded setup/prover
"""

__version__ = "0.1.0"

from .utils import params  # noqa: F401
