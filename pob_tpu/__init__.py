"""pob_tpu — a TPU-native zero-knowledge proving framework for EIP-7503
private proof-of-burn (capabilities of worm-privacy/proof-of-burn, re-designed
for JAX/XLA/Pallas on TPU).

Layers (bottom-up), mirroring SURVEY.md §7.1:

- ``pob_tpu.field``    BN254 field arithmetic: a pure-Python golden reference
                       (incl. Fq2/Fq6/Fq12 towers and the optimal-ate pairing
                       used by Groth16 verification) and batched JAX limbed-u32
                       Montgomery arithmetic for the device compute path.
- ``pob_tpu.hash``     Poseidon (circomlib-compatible) and Keccak-f[1600]
                       permutations, batched on device; dynamic-length sponge
                       realized as masked static-shape ops.
- ``pob_tpu.gadgets``  RLP / Merkle-Patricia-Trie / substring / byte-plumbing
                       ops with the exact semantics of the reference gadget
                       library (circuits/utils/*.circom), as jittable functions.
- ``pob_tpu.circuits`` ProofOfBurn and Spend witness builders (batched).
- ``pob_tpu.r1cs``     Rank-1 constraint system builder + circuit encodings.
- ``pob_tpu.prover``   Groth16: NTT, MSM, setup/prove/verify, serialization.
- ``pob_tpu.dist``     Multi-chip sharding of MSM/NTT via mesh collectives.
"""

__version__ = "0.1.0"
