"""Linear combinations over wires for constraint building.

An LC is a dict {wire_index: coeff} (wire 0 = the constant 1). Linear
structure stays symbolic — only nonlinear ops allocate wires — so our circuits
come out tighter than circom --O0, which materializes every signal."""

from __future__ import annotations

from ..field.ref import FR_MOD

INV2 = pow(2, FR_MOD - 2, FR_MOD)


def lc_const(c: int) -> dict:
    return {0: c % FR_MOD} if c % FR_MOD else {}

def lc_wire(w: int, coeff: int = 1) -> dict:
    return {int(w): coeff % FR_MOD} if coeff % FR_MOD else {}


def lc_add(*lcs) -> dict:
    out: dict = {}
    for lc in lcs:
        for w, c in lc.items():
            nc = (out.get(w, 0) + c) % FR_MOD
            if nc:
                out[w] = nc
            elif w in out:
                del out[w]
    return out


def lc_scale(lc: dict, k: int) -> dict:
    k %= FR_MOD
    if not k:
        return {}
    return {w: (c * k) % FR_MOD for w, c in lc.items()}


def lc_sub(a: dict, b: dict) -> dict:
    return lc_add(a, lc_scale(b, FR_MOD - 1))


def lc_terms(lc: dict):
    return list(lc.items())
