"""Lookup / shuffle / multi-phase arguments: MockProver + full proofs."""

import random

import pytest

from halo2_tpu.api import keygen, create_proof, verify
from halo2_tpu.commit import ParamsIPA
from halo2_tpu.curves import VESTA
from halo2_tpu.dev import MockProver
from halo2_tpu.fields import PASTA_FP

from circuits import LookupCircuit, ShuffleCircuit, PhaseCircuit

F = PASTA_FP
K = 5


def test_lookup_mock():
    circuit = LookupCircuit([1, 5, 15, 0, 3])
    MockProver.run(F, K, circuit, []).assert_satisfied()
    bad = LookupCircuit([1, 99])   # 99 outside 4-bit table
    failures = MockProver.run(F, K, bad, []).verify()
    assert any(f.kind == "lookup" for f in failures)


def test_shuffle_mock():
    circuit = ShuffleCircuit([1, 2, 3, 4], [4, 3, 2, 1])
    MockProver.run(F, K, circuit, []).assert_satisfied()
    bad = ShuffleCircuit([1, 2, 3, 4], [4, 3, 2, 5])
    failures = MockProver.run(F, K, bad, []).verify()
    assert any(f.kind == "shuffle" for f in failures)


def test_phase_mock():
    circuit = PhaseCircuit([7, 8, 9])
    MockProver.run(F, K, circuit, []).assert_satisfied()


@pytest.fixture(scope="module")
def params():
    return ParamsIPA.new(VESTA, K)


@pytest.mark.slow
def test_lookup_proof(params):
    circuit = LookupCircuit([1, 5, 15, 0, 3])
    pk = keygen(F, params, K, circuit)
    proof = create_proof(params, pk, [circuit], [[]], random.Random(1))
    assert verify(params, pk.vk, proof, [[]])
    bad = bytearray(proof)
    bad[33] ^= 1
    assert not verify(params, pk.vk, bytes(bad), [[]])


def test_shuffle_proof(params):
    circuit = ShuffleCircuit([1, 2, 3, 4], [4, 3, 2, 1])
    pk = keygen(F, params, K, circuit)
    proof = create_proof(params, pk, [circuit], [[]], random.Random(2))
    assert verify(params, pk.vk, proof, [[]])
    # a non-permutation witness must not produce a valid proof
    bad_circuit = ShuffleCircuit([1, 2, 3, 4], [4, 3, 2, 5])
    bad_proof = create_proof(params, pk, [bad_circuit], [[]], random.Random(3))
    assert not verify(params, pk.vk, bad_proof, [[]])


def test_phase_proof(params):
    circuit = PhaseCircuit([7, 8, 9])
    pk = keygen(F, params, K, circuit)
    proof = create_proof(params, pk, [circuit], [[]], random.Random(4))
    assert verify(params, pk.vk, proof, [[]])
