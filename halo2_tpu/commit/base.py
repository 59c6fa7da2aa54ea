"""Commitment-scheme shared types.

Mirrors halo2_backend/src/poly/commitment.rs (Blind, Prover/Verifier traits)
and poly/query.rs (ProverQuery / VerifierQuery / CommitmentReference) in
Python terms: schemes are plain classes, queries are small host-side records
pointing at device-resident polynomials.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Any, Optional


class Blind:
    """Blinding scalar (poly/commitment.rs:220-273); value is a host int."""

    __slots__ = ("value",)

    def __init__(self, value: int = 0):
        self.value = int(value)

    @staticmethod
    def random(Fr, rng) -> "Blind":
        return Blind(rng.randrange(Fr.p))

    def __repr__(self):
        return f"Blind({self.value})"


class PolyRef:
    """A committed polynomial (coeff basis, device array) plus its blind.
    Query grouping uses *object identity*, mirroring the reference's
    pointer-equality on `&Polynomial` (poly/query.rs:50-55).

    Accepts a raw array or a basis-typed `Poly` (poly/poly.py); a typed
    polynomial must be in coefficient form (the multiopen provers do
    coefficient arithmetic on it) — the reference makes this a compile-time
    property via `Polynomial<F, Coeff>` in ProverQuery (poly/query.rs:21-27).
    """

    __slots__ = ("poly", "blind")

    def __init__(self, poly, blind: Blind):
        from ..poly.poly import COEFF, unwrap
        self.poly = unwrap(poly, COEFF, "PolyRef")
        self.blind = blind


@dataclass
class ProverQuery:
    """Open `poly` at `point` (a host int in the scalar field)."""
    point: int
    poly_ref: PolyRef


@dataclass
class VerifierQuery:
    """Claimed evaluation of a commitment at a point.

    commitment: affine (x, y) int pair, or an MSM accumulator object
    (CommitmentReference::MSM analog) exposing `.clone()` and `.scale()`.
    """
    point: int
    commitment: Any
    eval: int
    is_msm: bool = False
    ident: Any = None

    def commitment_key(self):
        """Grouping identity mirroring the reference's pointer equality on
        `CommitmentReference` (query.rs:140-147): two distinct columns with
        EQUAL commitment values must stay distinct (the prover keys on
        `&Polynomial` identity), while one column queried at several
        rotations must merge.  Callers therefore pass `ident` — the slot the
        commitment was taken from; the value itself is never the key unless
        no ident was provided."""
        if self.ident is not None:
            return ("id", self.ident)
        if self.is_msm:
            return ("msm", id(self.commitment))
        return ("pt", self.commitment)


def new_rng(seed: Optional[int] = None) -> random.Random:
    """Proof randomness source. A seeded instance gives reproducible proofs
    (the reference's deterministic-rng test pattern,
    vanishing/prover.rs:55-85)."""
    return random.Random(seed) if seed is not None else random.SystemRandom()
