"""Field arithmetic vs python-int ground truth (all four supported fields)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from halo2_tpu.fields import BN254_FR, BN254_FQ, PASTA_FP, PASTA_FQ

FIELDS = [BN254_FR, BN254_FQ, PASTA_FP, PASTA_FQ]


@pytest.fixture(params=FIELDS, ids=[f.name for f in FIELDS])
def F(request):
    return request.param


def rand_elems(F, n, seed=0):
    rng = random.Random(seed)
    xs = [rng.randrange(F.p) for _ in range(n)]
    return xs, F.encode_ints(xs)


def test_roundtrip(F):
    xs, enc = rand_elems(F, 8)
    assert F.decode_ints(enc) == xs


def test_add_sub_neg(F):
    xs, a = rand_elems(F, 16, seed=1)
    ys, b = rand_elems(F, 16, seed=2)
    assert F.decode_ints(F.add(a, b)) == [(x + y) % F.p for x, y in zip(xs, ys)]
    assert F.decode_ints(F.sub(a, b)) == [(x - y) % F.p for x, y in zip(xs, ys)]
    assert F.decode_ints(F.neg(a)) == [(-x) % F.p for x in xs]


def test_add_edge_cases(F):
    xs = [0, 1, F.p - 1, F.p - 1]
    ys = [0, F.p - 1, F.p - 1, 1]
    a, b = F.encode_ints(xs), F.encode_ints(ys)
    assert F.decode_ints(F.add(a, b)) == [(x + y) % F.p for x, y in zip(xs, ys)]
    assert F.decode_ints(F.sub(a, b)) == [(x - y) % F.p for x, y in zip(xs, ys)]


def test_mul(F):
    xs, a = rand_elems(F, 16, seed=3)
    ys, b = rand_elems(F, 16, seed=4)
    assert F.decode_ints(F.mul(a, b)) == [(x * y) % F.p for x, y in zip(xs, ys)]
    # edge cases
    xs = [0, 1, F.p - 1, F.p - 1]
    ys = [5, F.p - 1, F.p - 1, 0]
    a, b = F.encode_ints(xs), F.encode_ints(ys)
    assert F.decode_ints(F.mul(a, b)) == [(x * y) % F.p for x, y in zip(xs, ys)]


def test_pow_inv(F):
    xs, a = rand_elems(F, 4, seed=5)
    assert F.decode_ints(F.pow(a, 5)) == [pow(x, 5, F.p) for x in xs]
    assert F.decode_ints(F.inv(a)) == [pow(x, -1, F.p) for x in xs]
    # zero maps to zero
    z = F.zeros((1,))
    assert F.decode_ints(F.inv(z)) == [0]


def test_batch_inv(F):
    xs, a = rand_elems(F, 9, seed=6)
    xs[3] = 0
    a = F.encode_ints(xs)
    expected = [pow(x, -1, F.p) if x else 0 for x in xs]
    assert F.decode_ints(F.batch_inv(a)) == expected


def test_roots_of_unity(F):
    w = F.root_of_unity
    assert pow(w, 1 << F.S, F.p) == 1
    assert pow(w, 1 << (F.S - 1), F.p) == F.p - 1
    if F.zeta is not None:
        assert pow(F.zeta, 3, F.p) == 1 and F.zeta != 1
    assert (F.delta * 1) % F.p == pow(F.generator, 1 << F.S, F.p)


def test_mont_conversions(F):
    xs, a = rand_elems(F, 4, seed=7)
    canon = F.from_mont(a)
    # canonical limbs should literally encode xs
    from halo2_tpu.fields.field import _limbs_to_int
    got = [_limbs_to_int(np.asarray(canon)[i]) for i in range(4)]
    assert got == xs
    back = F.to_mont(canon)
    assert F.decode_ints(back) == xs


def test_broadcasting(F):
    xs, a = rand_elems(F, 6, seed=8)
    a2 = a.reshape(2, 3, -1)
    s = F.encode_int(7)
    out = F.mul(a2, s)
    assert out.shape == (2, 3, 16)
    assert F.decode_ints(out) == [(x * 7) % F.p for x in xs]
