"""provekit-tpu: a TPU-native zero-knowledge proving framework.

A from-scratch JAX/XLA/Pallas implementation of the ProveKit capability
surface (Noir ACIR -> R1CS -> ZK-Spartan sumcheck -> WHIR polynomial
commitment with the Skyscraper hash), designed for TPU hardware: limb-plane
field arithmetic on the VPU/MXU, sharded sumcheck/NTT/Merkle via
``jax.sharding`` collectives, and a sequential host-side Fiat-Shamir sponge
absorbing only device-reduced digests.
"""

from . import config  # noqa: F401  (enables the persistent compile cache)

__version__ = "0.1.0"
