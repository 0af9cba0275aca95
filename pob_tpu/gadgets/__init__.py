"""Gadget library: vectorized, jittable equivalents of the reference's
circuits/utils/* templates. Dynamic lengths are realized as masked
static-shape ops; every circom assertion becomes a boolean "ok" flag that the
circuit layer ANDs into a validity bit (witness solving must *reject* invalid
inputs, mirroring the reference's negative-test convention, tests/test.py:65-68).
"""
