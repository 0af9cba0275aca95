"""Rank-1 constraint system layer: the builder (sparse A/B/C over Fr with a
block-structured witness layout), circuit constraint encodings, and the
device-side witness assembler. Replaces the reference's circom-compiler +
generated C++ witness pipeline (SURVEY.md §2.8) with a TPU-native design:
constraints are emitted in bulk as index arrays, witness blocks are tensors
computed by the batched JAX forward."""

from .builder import ConstraintSystem  # noqa: F401
