"""Hash permutations: circomlib-compatible Poseidon over BN254-Fr and the
Ethereum Keccak256 sponge, each with a python-int golden model and a batched
JAX device implementation."""
