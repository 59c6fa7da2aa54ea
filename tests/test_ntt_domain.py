"""NTT / EvaluationDomain / polynomial arithmetic tests.

Re-expresses the reference's domain tests (halo2_backend/src/poly/domain.rs:
478-547 rotate/l_i consistency) plus NTT roundtrip and kate division checks.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from halo2_tpu.fields import PASTA_FP, BN254_FR
from halo2_tpu.ntt import get_ntt, powers
from halo2_tpu.poly import (
    EvaluationDomain, Rotation, eval_polynomial, kate_division,
    compute_inner_product, lagrange_interpolate_int, eval_polynomial_int,
)


def naive_dft(p, coeffs, omega):
    n = len(coeffs)
    return [sum(c * pow(omega, (i * j) % n, p) for j, c in enumerate(coeffs)) % p
            for i in range(n)]


@pytest.mark.parametrize("F", [PASTA_FP, BN254_FR], ids=["pasta", "bn254"])
def test_ntt_matches_naive(F):
    k = 4
    ntt = get_ntt(F, k)
    rng = random.Random(0)
    coeffs = [rng.randrange(F.p) for _ in range(1 << k)]
    got = F.decode_ints(ntt.forward(F.encode_ints(coeffs)))
    assert got == naive_dft(F.p, coeffs, ntt.omega_int)


def test_ntt_roundtrip_batched():
    F = PASTA_FP
    k = 6
    ntt = get_ntt(F, k)
    rng = random.Random(1)
    vals = [rng.randrange(F.p) for _ in range(3 << k)]
    a = F.encode_ints(vals).reshape(3, 1 << k, -1)
    back = ntt.inverse(ntt.forward(a))
    assert F.decode_ints(back) == vals


def test_powers():
    F = BN254_FR
    xs = F.decode_ints(powers(F, F.encode_int(5), 8))
    assert xs == [pow(5, i, F.p) for i in range(8)]


def test_domain_lagrange_coeff_roundtrip():
    F = PASTA_FP
    d = EvaluationDomain(F, j=3, k=5)
    rng = random.Random(2)
    vals = [rng.randrange(F.p) for _ in range(d.n)]
    a = F.encode_ints(vals)
    coeff = d.lagrange_to_coeff(a)
    # evaluating the coefficients at omega^i must reproduce the values
    evals = naive_dft(F.p, F.decode_ints(coeff), d.omega)
    assert evals == vals
    back = d.coeff_to_lagrange(coeff)
    assert F.decode_ints(back) == vals


def test_domain_extended_roundtrip_and_vanishing():
    F = PASTA_FP
    d = EvaluationDomain(F, j=3, k=4)
    rng = random.Random(3)
    # random poly of degree < n
    vals = [rng.randrange(F.p) for _ in range(d.n)]
    coeff = d.lagrange_to_coeff(F.encode_ints(vals))
    ext = d.coeff_to_extended(coeff)
    # check a sample: ext[i] = poly(zeta * ext_omega^i)
    cs = F.decode_ints(coeff)
    for i in [0, 1, 7]:
        x = (d.g_coset * pow(d.extended_omega, i, F.p)) % F.p
        assert F.decode_ints(ext[i: i + 1])[0] == eval_polynomial_int(F.p, cs, x)
    # extended_to_coeff inverts coeff_to_extended (after truncation)
    back = d.extended_to_coeff(ext)
    assert F.decode_ints(back)[: d.n] == cs
    assert all(v == 0 for v in F.decode_ints(back)[d.n:])

    # divide_by_vanishing: (X^n - 1) * q over the coset divided back equals q
    qvals = [rng.randrange(F.p) for _ in range(d.n)]
    q_ext = d.coeff_to_extended(d.lagrange_to_coeff(F.encode_ints(qvals)))
    # t(X) evals over extended coset
    t_evals = []
    for i in range(d.extended_n):
        x = (d.g_coset * pow(d.extended_omega, i, F.p)) % F.p
        t_evals.append((pow(x, d.n, F.p) - 1) % F.p)
    prod = F.mul(q_ext, F.encode_ints(t_evals))
    got = d.divide_by_vanishing_poly(prod)
    assert F.decode_ints(got) == F.decode_ints(q_ext)


def test_rotate_extended():
    F = PASTA_FP
    d = EvaluationDomain(F, j=3, k=3)
    rng = random.Random(4)
    vals = [rng.randrange(F.p) for _ in range(d.n)]
    coeff = d.lagrange_to_coeff(F.encode_ints(vals))
    ext = d.coeff_to_extended(coeff)
    rot = d.rotate_extended(ext, Rotation(1))
    # rotated poly evaluated at coset point i = original at coset point
    # i + extension_factor (domain.rs:478-506 test_rotate analog)
    cs = F.decode_ints(coeff)
    ratio = 1 << (d.extended_k - d.k)
    for i in [0, 3]:
        x = (d.g_coset * pow(d.extended_omega, i + ratio, F.p)) % F.p
        assert F.decode_ints(rot[i: i + 1])[0] == eval_polynomial_int(F.p, cs, x)


def test_l_i_range():
    # domain.rs:509-547 test_l_i analog
    F = PASTA_FP
    d = EvaluationDomain(F, j=3, k=3)
    rng = random.Random(5)
    x = rng.randrange(F.p)
    xn = pow(x, d.n, F.p)
    rotations = [-2, -1, 0, 1, 2]
    l = d.l_i_range_int(x, xn, rotations)
    # ground truth: l_i(x) via interpolation of indicator vectors
    points = [pow(d.omega, i, F.p) for i in range(d.n)]
    for rot, li in zip(rotations, l):
        idx = rot % d.n
        evals = [1 if j == idx else 0 for j in range(d.n)]
        coeffs = lagrange_interpolate_int(F.p, points, evals)
        assert li == eval_polynomial_int(F.p, coeffs, x)


def test_eval_polynomial_device():
    F = BN254_FR
    rng = random.Random(6)
    cs = [rng.randrange(F.p) for _ in range(20)]  # non-power-of-two length
    x = rng.randrange(F.p)
    got = F.decode_int(eval_polynomial(F, F.encode_ints(cs), F.encode_int(x)))
    assert got == eval_polynomial_int(F.p, cs, x)


def test_kate_division():
    F = BN254_FR
    rng = random.Random(7)
    n = 16
    cs = [rng.randrange(F.p) for _ in range(n)]
    b = rng.randrange(F.p)
    q = F.decode_ints(kate_division(F, F.encode_ints(cs), F.encode_int(b)))
    assert len(q) == n - 1
    # check p(X) - p(b) == q(X) * (X - b)
    pb = eval_polynomial_int(F.p, cs, b)
    # reconstruct q*(X-b) + pb
    recon = [0] * n
    recon[0] = pb
    for i, qi in enumerate(q):
        recon[i] = (recon[i] - qi * b) % F.p
        recon[i + 1] = (recon[i + 1] + qi) % F.p
    assert recon == [c % F.p for c in cs]


def test_inner_product():
    F = PASTA_FP
    rng = random.Random(8)
    a = [rng.randrange(F.p) for _ in range(10)]
    b = [rng.randrange(F.p) for _ in range(10)]
    got = F.decode_int(
        compute_inner_product(F, F.encode_ints(a), F.encode_ints(b)))
    assert got == sum(x * y for x, y in zip(a, b)) % F.p
