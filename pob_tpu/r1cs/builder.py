"""Sparse R1CS builder.

A constraint is <A_row, w> * <B_row, w> = <C_row, w> over Fr, wire 0 == 1.
Terms are stored as flat COO triples (row, wire, coeff) per matrix, appended
in bulk numpy chunks so million-constraint circuits build fast in Python.

Wire layout (Groth16/snarkjs convention): [1, public outputs/inputs...,
private...]. Witness *blocks* are named contiguous wire ranges whose values
are produced as tensors by the circuit's JAX forward — witness assembly is a
device-side concatenation, replacing circom's generated C++ witness binary."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..field.ref import FR_MOD


class _Coo:
    __slots__ = ("rows", "cols", "coeffs")

    def __init__(self):
        self.rows = []  # list of np.int64 chunks
        self.cols = []
        self.coeffs = []  # list of python-int lists (field elements)

    def append_chunk(self, rows, cols, coeffs):
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        assert rows.shape == cols.shape and rows.shape[0] == len(coeffs)
        self.rows.append(rows)
        self.cols.append(cols)
        self.coeffs.append([c % FR_MOD for c in coeffs])

    def finalize(self):
        if not self.rows:
            return np.zeros(0, np.int64), np.zeros(0, np.int64), []
        rows = np.concatenate(self.rows)
        cols = np.concatenate(self.cols)
        coeffs = [c for chunk in self.coeffs for c in chunk]
        return rows, cols, coeffs


@dataclass
class WitnessBlock:
    name: str
    start: int
    shape: tuple


class ConstraintSystem:
    def __init__(self):
        self.num_wires = 1  # wire 0 is the constant 1
        self.num_public = 0  # wires 1..num_public are public
        self.num_constraints = 0
        self.a = _Coo()
        self.b = _Coo()
        self.c = _Coo()
        self.blocks: list[WitnessBlock] = []

    # ---- wires ----

    def alloc_block(self, name: str, shape) -> np.ndarray:
        """Allocate a named contiguous block of wires; returns index array."""
        shape = tuple(int(s) for s in shape)
        n = int(np.prod(shape)) if shape else 1
        start = self.num_wires
        self.num_wires += n
        self.blocks.append(WitnessBlock(name, start, shape))
        return np.arange(start, start + n, dtype=np.int64).reshape(shape)

    def mark_public(self, n: int):
        """The first n allocated wires (1..n) are public."""
        self.num_public = n

    # ---- constraints ----

    def add(self, a_terms, b_terms, c_terms):
        """One constraint; each arg is a list of (wire, coeff)."""
        r = self.num_constraints
        self.num_constraints += 1
        if a_terms:
            self.a.append_chunk([r] * len(a_terms), [w for w, _ in a_terms],
                                [c for _, c in a_terms])
        if b_terms:
            self.b.append_chunk([r] * len(b_terms), [w for w, _ in b_terms],
                                [c for _, c in b_terms])
        if c_terms:
            self.c.append_chunk([r] * len(c_terms), [w for w, _ in c_terms],
                                [c for _, c in c_terms])

    def add_bulk(self, n: int, a=(), b=(), c=()):
        """n constraints at once. Each of a/b/c is a list of term groups
        (rel_rows, wires, coeffs) with rel_rows in [0, n) as numpy arrays and
        coeffs as a python-int list or scalar int."""
        r0 = self.num_constraints
        self.num_constraints += n
        for coo, groups in ((self.a, a), (self.b, b), (self.c, c)):
            for rel_rows, wires, coeffs in groups:
                rel_rows = np.asarray(rel_rows, np.int64)
                wires = np.asarray(wires, np.int64)
                if isinstance(coeffs, int):
                    coeffs = [coeffs] * len(rel_rows)
                coo.append_chunk(r0 + rel_rows, wires, coeffs)

    # ---- export ----

    def matrices(self):
        """Finalized (rows, cols, coeffs) for A, B, C."""
        return self.a.finalize(), self.b.finalize(), self.c.finalize()

    # ---- host-side checking (tests) ----

    def check_witness(self, w) -> bool:
        """w: list/array of python ints, len num_wires, w[0] == 1."""
        assert int(w[0]) == 1 and len(w) == self.num_wires
        aw = np.zeros(self.num_constraints, object)
        bw = np.zeros(self.num_constraints, object)
        cw = np.zeros(self.num_constraints, object)
        for coo, acc in ((self.a, aw), (self.b, bw), (self.c, cw)):
            rows, cols, coeffs = coo.finalize()
            for r, cidx, co in zip(rows, cols, coeffs):
                acc[r] = (acc[r] + co * int(w[cidx])) % FR_MOD
        return all((aw[i] * bw[i] - cw[i]) % FR_MOD == 0 for i in range(self.num_constraints))
