"""Groth16 proving stack: Fr NTT (QAP division), G1/G2 curve kernels, MSM,
setup / prove / verify, and proof serialization. The reference delegates this
stage to snarkjs/rapidsnark (SURVEY.md §2.8); here it is a first-class,
TPU-native subsystem."""
