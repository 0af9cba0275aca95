"""BN254 field arithmetic.

- ``ref``:  pure-Python golden reference (Fr, Fq, extension towers, curve
            groups G1/G2, optimal-ate pairing). Bit-exactness oracle for the
            device kernels and the host-side Groth16 verifier.
- ``limb``: batched JAX arithmetic on 16x16-bit limbed representations in
            Montgomery form — the TPU compute path.
"""

from .ref import FR_MOD, FQ_MOD  # noqa: F401
