"""Unblinded advice columns (vector-ops-unblinded.rs): two different
circuits (elementwise mul and add) proved with independent randomness must
produce byte-identical commitments for their shared unblinded input columns
— the mechanism for matching up transcripts across host machines."""

import random

import pytest

from halo2_tpu.api import keygen, create_proof, verify
from halo2_tpu.commit import (ParamsKZG, ProverGWC, VerifierGWC,
                              SingleStrategyKZG)
from halo2_tpu.curves import BN254_G1
from halo2_tpu.dev import MockProver
from halo2_tpu.fields import BN254_FR

from circuits import UnblindedMulCircuit, UnblindedAddCircuit

F = BN254_FR
K = 4
N_ROWS = 6


def _vectors():
    rng = random.Random(7)
    a = [rng.randrange(1, 1000) for _ in range(N_ROWS)]
    b = [rng.randrange(1, 1000) for _ in range(N_ROWS)]
    return a, b


def test_unblinded_mock():
    a, b = _vectors()
    mul = [(x * y) % F.p for x, y in zip(a, b)]
    MockProver.run(F, K, UnblindedMulCircuit(a, b), [mul]).assert_satisfied()
    add = [(x + y) % F.p for x, y in zip(a, b)]
    MockProver.run(F, K, UnblindedAddCircuit(a, b), [add]).assert_satisfied()


@pytest.fixture(scope="module")
def params():
    return ParamsKZG.new(K)


@pytest.mark.slow
def test_unblinded_commitments_match_across_circuits(params):
    """The first two proof points are the commitments to the unblinded
    a/b columns (advice columns 0 and 1, phase 0); they must agree between
    the mul proof and the add proof despite different RNGs, and both proofs
    must verify."""
    a, b = _vectors()
    mul = [(x * y) % F.p for x, y in zip(a, b)]
    add = [(x + y) % F.p for x, y in zip(a, b)]

    mul_circ = UnblindedMulCircuit(a, b)
    add_circ = UnblindedAddCircuit(a, b)
    pk_mul = keygen(F, params, K, mul_circ)
    pk_add = keygen(F, params, K, add_circ)

    proof_mul = create_proof(params, pk_mul, [mul_circ], [[mul]],
                             random.Random(1),
                             multiopen_prover_cls=ProverGWC)
    proof_add = create_proof(params, pk_add, [add_circ], [[add]],
                             random.Random(2),
                             multiopen_prover_cls=ProverGWC)

    assert verify(params, pk_mul.vk, proof_mul, [[mul]],
                  multiopen_verifier_cls=VerifierGWC,
                  strategy_cls=SingleStrategyKZG)
    assert verify(params, pk_add.vk, proof_add, [[add]],
                  multiopen_verifier_cls=VerifierGWC,
                  strategy_cls=SingleStrategyKZG)

    point_len = len(BN254_G1.point_to_bytes(params.commit_affine(
        F.encode_ints([1] + [0] * (params.n - 1)))))
    # a- and b-column commitments: bytes [0, 2*point_len)
    assert proof_mul[:2 * point_len] == proof_add[:2 * point_len]
    # the out-column commitment (blinded) must differ between the proofs
    assert proof_mul[2 * point_len:3 * point_len] != \
        proof_add[2 * point_len:3 * point_len]


def test_blinded_commitments_differ_across_rng(params):
    """Control: with fresh randomness the same circuit's blinded column
    commitments differ run-to-run."""
    a, b = _vectors()
    mul = [(x * y) % F.p for x, y in zip(a, b)]
    circ = UnblindedMulCircuit(a, b)
    pk = keygen(F, params, K, circ)
    p1 = create_proof(params, pk, [circ], [[mul]], random.Random(3),
                      multiopen_prover_cls=ProverGWC)
    p2 = create_proof(params, pk, [circ], [[mul]], random.Random(4),
                      multiopen_prover_cls=ProverGWC)
    point_len = len(BN254_G1.point_to_bytes(params.commit_affine(
        F.encode_ints([1] + [0] * (params.n - 1)))))
    assert p1[:2 * point_len] == p2[:2 * point_len]
    assert p1[2 * point_len:3 * point_len] != p2[2 * point_len:3 * point_len]
