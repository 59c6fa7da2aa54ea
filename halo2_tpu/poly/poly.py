"""Basis-typed polynomial container.

The reference types every polynomial by a basis marker —
`Polynomial<F, Coeff | LagrangeCoeff | ExtendedLagrangeCoeff>`
(halo2_backend/src/poly.rs:44-71) — so committing a coefficient-form vector
against Lagrange bases is a *compile error*.  The TPU stack's polynomials
are device arrays of Montgomery limbs; this wrapper restores the same
protection at the orchestration layer: a `(..., n, NLIMBS)` array plus a
basis tag, checked (and unwrapped) at every basis-sensitive boundary —
`EvaluationDomain` transforms, `Params.commit*`, `eval_polynomial`,
`kate_division`, `PolyRef`.

Inside jitted kernels polynomials stay raw arrays (the tag is host-side
typing, not device data), but `Poly` is registered as a pytree so it can
also cross `jax.jit` boundaries intact when convenient.

Migration contract ("typed-in, typed-out"): boundary functions accept
either a raw array (legacy call sites) or a `Poly`; a `Poly` with the wrong
basis raises `TypeError`, and typed inputs produce typed outputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

COEFF = "coeff"          # coefficient form, length n
LAGRANGE = "lagrange"    # evaluations over the 2^k domain
EXTENDED = "extended"    # evaluations over the zeta-coset extended domain
_BASES = (COEFF, LAGRANGE, EXTENDED)


@jax.tree_util.register_pytree_node_class
class Poly:
    """values: (..., n, NLIMBS) device array; basis: one of the tags above.

    Leading batch dims are allowed (a stacked column set is a batch of
    polynomials in the same basis)."""

    __slots__ = ("values", "basis")

    def __init__(self, values, basis: str):
        if basis not in _BASES:
            raise TypeError(f"unknown polynomial basis {basis!r}")
        self.values = values
        self.basis = basis

    # -- constructors ----------------------------------------------------

    @staticmethod
    def coeff(values) -> "Poly":
        return Poly(values, COEFF)

    @staticmethod
    def lagrange(values) -> "Poly":
        return Poly(values, LAGRANGE)

    @staticmethod
    def extended(values) -> "Poly":
        return Poly(values, EXTENDED)

    @staticmethod
    def stack(polys, axis: int = 0) -> "Poly":
        """Stack same-basis polynomials into a batched Poly."""
        bases = {p.basis for p in polys}
        if len(bases) != 1:
            raise TypeError(f"cannot stack mixed bases {sorted(bases)}")
        return Poly(jnp.stack([p.values for p in polys], axis=axis),
                    bases.pop())

    # -- array-ish surface ----------------------------------------------

    @property
    def shape(self):
        return self.values.shape

    @property
    def ndim(self):
        return self.values.ndim

    def __len__(self):
        return self.values.shape[0]

    def __getitem__(self, idx) -> "Poly":
        """Indexing selects within the batch / row dims; the basis tag is
        preserved (slicing rows of a coeff vector yields coeff pieces —
        the h-piece split)."""
        return Poly(self.values[idx], self.basis)

    def map(self, fn) -> "Poly":
        """Apply an elementwise/array fn to the values, keeping the tag."""
        return Poly(fn(self.values), self.basis)

    def __repr__(self):
        return f"Poly<{self.basis}>{tuple(self.values.shape)}"

    # -- pytree ----------------------------------------------------------

    def tree_flatten(self):
        return (self.values,), self.basis

    @classmethod
    def tree_unflatten(cls, basis, children):
        return cls(children[0], basis)


def unwrap(x, basis: str, what: str = "operation"):
    """Unwrap a Poly, enforcing its basis; raw arrays pass through
    (legacy call sites — the tag only protects typed flows)."""
    if isinstance(x, Poly):
        if x.basis != basis:
            raise TypeError(
                f"{what} expects a {basis}-basis polynomial, got "
                f"{x.basis}-basis {x!r}")
        return x.values
    return x


def take(x, basis: str, what: str = "operation"):
    """Like `unwrap` but also reports whether the input was typed, so
    transforms can honor the typed-in/typed-out contract."""
    if isinstance(x, Poly):
        return unwrap(x, basis, what), True
    return x, False
