"""Native C++ library (halo2_tpu/native): keccak and BN254 pairing parity
with the pure-Python implementations, plus the dispatch seams."""

import os
import random

import pytest

from halo2_tpu import native
from halo2_tpu.transcript.keccak import Keccak256
from halo2_tpu.compat import bn254_pairing as bp
from halo2_tpu.curves import BN254_G1

LIB = native.get_lib()
needs_native = pytest.mark.skipif(LIB is None,
                                  reason="native toolchain unavailable")


@needs_native
def test_keccak_vectors():
    # keccak256(b"") is a well-known constant
    assert native.keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    rng = random.Random(0)
    for n in (1, 135, 136, 137, 500):
        msg = bytes(rng.randrange(256) for _ in range(n))
        k = Keccak256.__new__(Keccak256)
        k._state = [[0] * 5 for _ in range(5)]
        k._buf = b""
        k._native = None      # force the pure-Python sponge
        k._data = None
        k.update(msg)
        assert native.keccak256(msg) == k.digest()


@needs_native
def test_keccak_class_uses_native():
    k = Keccak256()
    k.update(b"hello ")
    k2 = k.copy()
    k.update(b"world")
    k2.update(b"world")
    assert k.digest() == k2.digest()
    assert k.digest().hex() == (
        "47173285a8d7341e5e972fc677286384f802f8ef42a5ec5f03bbfa254cb01fad")


def _g1_points():
    g1 = (BN254_G1.gen_x, BN254_G1.gen_y)
    p = BN254_G1.Fq.p
    lam = (3 * g1[0] * g1[0]) * pow(2 * g1[1], -1, p) % p
    x2 = (lam * lam - 2 * g1[0]) % p
    y2 = (lam * (g1[0] - x2) - g1[1]) % p
    neg = (g1[0], (-g1[1]) % p)
    return g1, (x2, y2), neg


@needs_native
def test_pairing_value_matches_python():
    g1, _, _ = _g1_points()
    G2 = bp.g2_to_ints(bp.g2_generator())
    e_nat = native.pairing(g1, G2)
    e_py = bp.pairing(G2, g1)
    assert e_nat == list(e_py.coeffs)


@needs_native
def test_pairing_check_relations():
    g1, two_g1, neg_g1 = _g1_points()
    G2 = bp.g2_to_ints(bp.g2_generator())
    # e(G,H) e(-G,H) == 1
    assert native.pairing_check([(g1, G2), (neg_g1, G2)])
    # bilinearity: e(2G,H) e(-G,H)^2 == 1
    assert native.pairing_check([(two_g1, G2), (neg_g1, G2), (neg_g1, G2)])
    # single non-degenerate pairing != 1
    assert not native.pairing_check([(g1, G2)])
    # infinity pairs are skipped
    assert native.pairing_check([(None, G2), (g1, None)])


@needs_native
def test_compat_dispatches_to_native():
    g1, _, neg_g1 = _g1_points()
    G2 = bp.g2_to_ints(bp.g2_generator())
    assert bp.pairing_check([(g1, G2), (neg_g1, G2)])
    assert not bp.pairing_check([(g1, G2)])
