"""halo2_tpu — a TPU-native PLONKish proving stack (halo2-class).

Re-implements the capability surface of the PSE halo2 fork
(frontend circuit DSL, PLONK backend with lookups/shuffles/permutations,
KZG + IPA commitment schemes, Blake2b/Keccak transcripts) with a JAX/XLA
compute path designed for TPU meshes rather than a Rust port.
"""

__version__ = "0.1.0"
