"""Basis-typed polynomial container (halo2_backend/src/poly.rs:44-71).

The reference makes a basis mixup a compile error via
`Polynomial<F, Coeff | LagrangeCoeff | ExtendedLagrangeCoeff>`; here the
typed wrapper must make the same mixups raise `TypeError` at the
boundaries (domain transforms, commit, eval, PolyRef)."""

import numpy as np
import pytest

from halo2_tpu.commit import ParamsIPA
from halo2_tpu.commit.base import Blind, PolyRef
from halo2_tpu.curves import VESTA
from halo2_tpu.fields import PASTA_FP
from halo2_tpu.poly.arith import eval_polynomial, kate_division
from halo2_tpu.poly.domain import EvaluationDomain
from halo2_tpu.poly.poly import Poly

F = PASTA_FP
K = 4


@pytest.fixture(scope="module")
def domain():
    return EvaluationDomain(F, 3, K)


def _poly(seed=1):
    rng = np.random.default_rng(seed)
    return F.encode_ints([int(x) for x in rng.integers(0, 1 << 30, 1 << K)])


def test_transform_roundtrip_typed(domain):
    lag = Poly.lagrange(_poly())
    coeff = domain.lagrange_to_coeff(lag)
    assert isinstance(coeff, Poly) and coeff.basis == "coeff"
    back = domain.coeff_to_lagrange(coeff)
    assert back.basis == "lagrange"
    assert F.decode_ints(back.values) == F.decode_ints(lag.values)
    ext = domain.coeff_to_extended(coeff)
    assert ext.basis == "extended"
    assert ext.shape[-2] == domain.extended_n


def test_mixups_raise(domain):
    coeff = Poly.coeff(_poly())
    lag = Poly.lagrange(_poly())
    ext = Poly.extended(F.zeros((domain.extended_n,)))
    with pytest.raises(TypeError):
        domain.lagrange_to_coeff(coeff)       # coeff into iFFT
    with pytest.raises(TypeError):
        domain.coeff_to_extended(lag)         # lagrange into coset-FFT
    with pytest.raises(TypeError):
        domain.extended_to_coeff(coeff)
    with pytest.raises(TypeError):
        domain.divide_by_vanishing_poly(lag)
    with pytest.raises(TypeError):
        domain.rotate_extended(lag, __import__(
            "halo2_tpu.poly.domain", fromlist=["Rotation"]).Rotation(1))
    with pytest.raises(TypeError):
        eval_polynomial(F, lag, F.encode_int(7))
    with pytest.raises(TypeError):
        kate_division(F, ext, F.encode_int(7))
    with pytest.raises(TypeError):
        PolyRef(lag, Blind(0))                # committed queries are coeff


def test_commit_basis_checked(domain):
    params = ParamsIPA.new(VESTA, K)
    coeff = Poly.coeff(_poly())
    lag = Poly.lagrange(_poly())
    with pytest.raises(TypeError):
        params.commit(lag, Blind(1))
    with pytest.raises(TypeError):
        params.commit_lagrange(coeff, Blind(1))
    # correct tags go through
    params.commit(coeff, Blind(1))
    params.commit_lagrange(lag, Blind(1))


def test_stack_and_indexing():
    a, b = Poly.coeff(_poly(1)), Poly.coeff(_poly(2))
    s = Poly.stack([a, b])
    assert s.basis == "coeff" and s.shape[0] == 2
    assert s[0].basis == "coeff"
    with pytest.raises(TypeError):
        Poly.stack([a, Poly.lagrange(_poly(3))])


def test_pytree_roundtrip():
    import jax
    a = Poly.lagrange(_poly())
    leaves, treedef = jax.tree_util.tree_flatten(a)
    b = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(b, Poly) and b.basis == "lagrange"
