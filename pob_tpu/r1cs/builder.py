"""Sparse R1CS builder.

A constraint is <A_row, w> * <B_row, w> = <C_row, w> over Fr, wire 0 == 1.
Terms are stored as flat COO triples (row, wire, coeff-palette-index) per
matrix, appended in bulk numpy chunks so the prod ProofOfBurn system
(~10^7 constraints, ~84 keccak-f permutations) builds in seconds of numpy
instead of minutes of per-constraint Python.

Coefficient values live in a small shared *palette* (the whole gadget library
draws from a few thousand distinct field elements: +/-1, +/-inv2, powers of 2
and 256, Poseidon constants/MDS entries) — so COO chunks are pure int arrays
and device conversion is a single vectorized gather instead of a Python loop
over tens of millions of 256-bit ints.

Wire layout (Groth16/snarkjs convention): [1, public outputs/inputs...,
private...]. Witness *blocks* are named contiguous wire ranges whose values
are produced as tensors by the circuit's JAX forward — witness assembly is a
device-side concatenation, replacing circom's generated C++ witness binary
(the role of the reference's circuits/main_*_cpp, SURVEY.md §2.8)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field.ref import FR_MOD


class _Coo:
    __slots__ = ("rows", "cols", "cidx")

    def __init__(self):
        self.rows = []  # list of np.int64 chunks
        self.cols = []
        self.cidx = []  # list of np.int32 chunks (palette indices)

    def append_chunk(self, rows, cols, cidx):
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        cidx = np.asarray(cidx, np.int32)
        assert rows.shape == cols.shape == cidx.shape
        self.rows.append(rows)
        self.cols.append(cols)
        self.cidx.append(cidx)

    def finalize(self):
        if not self.rows:
            return np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int32)
        return (
            np.concatenate(self.rows),
            np.concatenate(self.cols),
            np.concatenate(self.cidx),
        )


@dataclass
class WitnessBlock:
    name: str
    start: int
    shape: tuple
    # declared max bit-width of the block's values in any satisfying witness
    # (a gadget contract: 1 = boolean wires). Used by the prover's
    # width-classified MSM plan; a wrong annotation can only yield an invalid
    # proof (completeness), never unsound acceptance — verification is
    # pairing-based.
    width: int = 254


class ConstraintSystem:
    def __init__(self):
        self.num_wires = 1  # wire 0 is the constant 1
        self.num_public = 0  # wires 1..num_public are public
        self.num_constraints = 0
        self.a = _Coo()
        self.b = _Coo()
        self.c = _Coo()
        self.blocks: list[WitnessBlock] = []
        # coefficient palette; index 0 is always the value 1
        self.palette: list[int] = [1]
        self._pal = {1: 0}

    # ---- coefficients ----

    def coeff_index(self, c: int) -> int:
        c %= FR_MOD
        i = self._pal.get(c)
        if i is None:
            i = len(self.palette)
            self._pal[c] = i
            self.palette.append(c)
        return i

    def _coeff_indices(self, coeffs, n: int) -> np.ndarray:
        if isinstance(coeffs, (int, np.integer)):
            return np.full(n, self.coeff_index(int(coeffs)), np.int32)
        if isinstance(coeffs, np.ndarray) and coeffs.dtype != object:
            # small-int array: palette-map the unique values only
            uniq, inv = np.unique(coeffs, return_inverse=True)
            lut = np.fromiter((self.coeff_index(int(u)) for u in uniq), np.int32,
                              len(uniq))
            return lut[inv]
        out = np.fromiter((self.coeff_index(int(c)) for c in coeffs), np.int32, n)
        return out

    # ---- wires ----

    def alloc_block(self, name: str, shape, width: int = 254) -> np.ndarray:
        """Allocate a named contiguous block of wires; returns index array.
        width declares the values' max bit-width (see WitnessBlock.width)."""
        shape = tuple(int(s) for s in shape)
        n = int(np.prod(shape)) if shape else 1
        start = self.num_wires
        self.num_wires += n
        self.blocks.append(WitnessBlock(name, start, shape, width))
        return np.arange(start, start + n, dtype=np.int64).reshape(shape)

    def bit_wires_declared(self) -> np.ndarray:
        """(num_wires,) bool mask of wires in width-1 (boolean) blocks."""
        mask = np.zeros(self.num_wires, bool)
        for blk in self.blocks:
            if blk.width == 1:
                n = int(np.prod(blk.shape)) if blk.shape else 1
                mask[blk.start : blk.start + n] = True
        return mask

    def mark_public(self, n: int):
        """The first n allocated wires (1..n) are public."""
        self.num_public = n

    # ---- constraints ----

    def add(self, a_terms, b_terms, c_terms):
        """One constraint; each arg is a list of (wire, coeff)."""
        r = self.num_constraints
        self.num_constraints += 1
        for coo, terms in ((self.a, a_terms), (self.b, b_terms), (self.c, c_terms)):
            if terms:
                coo.append_chunk(
                    [r] * len(terms),
                    [w for w, _ in terms],
                    [self.coeff_index(c) for _, c in terms],
                )

    def add_bulk(self, n: int, a=(), b=(), c=()):
        """n constraints at once. Each of a/b/c is a list of term groups
        (rel_rows, wires, coeffs) with rel_rows in [0, n) as numpy arrays and
        coeffs as a scalar int, an int array, or a python-int list."""
        r0 = self.num_constraints
        self.num_constraints += n
        for coo, groups in ((self.a, a), (self.b, b), (self.c, c)):
            for rel_rows, wires, coeffs in groups:
                rel_rows = np.asarray(rel_rows, np.int64)
                wires = np.asarray(wires, np.int64)
                coo.append_chunk(
                    r0 + rel_rows, wires, self._coeff_indices(coeffs, len(rel_rows))
                )

    # ---- export ----

    def palette_array(self) -> np.ndarray:
        """The palette as a numpy object array of python ints."""
        return np.asarray(self.palette, dtype=object)

    def matrices_indexed(self):
        """Finalized ((rows, cols, cidx) for A, B, C, palette_array)."""
        return (
            self.a.finalize(),
            self.b.finalize(),
            self.c.finalize(),
            self.palette_array(),
        )

    def matrices(self):
        """Finalized (rows, cols, coeffs) for A, B, C with materialized
        coefficient values (object arrays of python ints)."""
        pal = self.palette_array()
        out = []
        for coo in (self.a, self.b, self.c):
            rows, cols, cidx = coo.finalize()
            out.append((rows, cols, pal[cidx]))
        return tuple(out)

    # ---- host-side checking (tests, CLI witness validation) ----

    def check_witness(self, w) -> bool:
        """w: list/array of python ints, len num_wires, w[0] == 1.

        Vectorized over numpy object arrays so million-constraint systems
        check in seconds; the reference's equivalent is running the circom
        witness binary, which aborts on violation (tests/test.py:65-68)."""
        assert int(w[0]) == 1 and len(w) == self.num_wires
        w_np = np.asarray([int(x) % FR_MOD for x in w], dtype=object)
        pal = self.palette_array()
        prods = []
        for coo in (self.a, self.b, self.c):
            rows, cols, cidx = coo.finalize()
            acc = np.zeros(self.num_constraints, dtype=object)
            if len(rows):
                terms = pal[cidx] * w_np[cols]
                np.add.at(acc, rows, terms)
                acc %= FR_MOD
            prods.append(acc)
        aw, bw, cw = prods
        return bool(np.all((aw * bw - cw) % FR_MOD == 0))

    def failing_constraints(self, w, limit: int = 10):
        """Indices of violated constraints (diagnostic twin of check_witness)."""
        w_np = np.asarray([int(x) % FR_MOD for x in w], dtype=object)
        pal = self.palette_array()
        prods = []
        for coo in (self.a, self.b, self.c):
            rows, cols, cidx = coo.finalize()
            acc = np.zeros(self.num_constraints, dtype=object)
            if len(rows):
                np.add.at(acc, rows, pal[cidx] * w_np[cols])
                acc %= FR_MOD
            prods.append(acc)
        bad = np.nonzero((prods[0] * prods[1] - prods[2]) % FR_MOD != 0)[0]
        return bad[:limit].tolist()
