"""End-to-end keygen -> prove -> verify over IPA/Vesta (driver config 1:
the simple-example circuit; the reference's plonk_api.rs roundtrip shape)."""

import random

import pytest

from halo2_tpu.api import keygen, create_proof, verify
from halo2_tpu.commit import ParamsIPA
from halo2_tpu.curves import VESTA
from halo2_tpu.fields import PASTA_FP
from halo2_tpu.frontend import Value

from circuits import SimpleCircuit

F = PASTA_FP
K = 5


@pytest.fixture(scope="module")
def setup():
    params = ParamsIPA.new(VESTA, K)
    a, b, constant = 2, 3, 7
    c = (constant * a * a * b * b) % F.p
    circuit = SimpleCircuit(constant, Value.known(a), Value.known(b))
    pk = keygen(F, params, K, circuit)
    return params, pk, circuit, c


@pytest.mark.slow
def test_prove_verify_roundtrip(setup):
    params, pk, circuit, c = setup
    rng = random.Random(42)
    proof = create_proof(params, pk, [circuit], [[[c]]], rng)
    assert len(proof) > 0
    assert verify(params, pk.vk, proof, [[[c]]])


def test_deterministic_with_seeded_rng(setup):
    params, pk, circuit, c = setup
    p1 = create_proof(params, pk, [circuit], [[[c]]], random.Random(1))
    p2 = create_proof(params, pk, [circuit], [[[c]]], random.Random(1))
    assert p1 == p2
    p3 = create_proof(params, pk, [circuit], [[[c]]], random.Random(2))
    assert p3 != p1


def test_wrong_instance_rejected(setup):
    params, pk, circuit, c = setup
    proof = create_proof(params, pk, [circuit], [[[c]]], random.Random(3))
    assert not verify(params, pk.vk, proof, [[[(c + 1) % F.p]]])


def test_tampered_proof_rejected(setup):
    params, pk, circuit, c = setup
    proof = create_proof(params, pk, [circuit], [[[c]]], random.Random(4))
    for pos in [0, len(proof) // 2, len(proof) - 1]:
        bad = bytearray(proof)
        bad[pos] ^= 1
        assert not verify(params, pk.vk, bytes(bad), [[[c]]]), \
            f"tamper at byte {pos} accepted"
