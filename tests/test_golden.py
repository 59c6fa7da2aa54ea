"""Golden pinned vectors — the analog of the reference's pinned-vk assert
(plonk_api.rs:659-1120 pins the entire Debug format of `vk.pinned()`).

These hashes anchor everything consensus-critical: the constraint-system
compilation (selector compression, query indexing), the evaluation domain,
the commitment pipeline (field/curve/MSM/NTT numerics), key generation, and
— via the proof hash — the whole prover + Fiat–Shamir transcript under a
seeded RNG.  If an intentional protocol change moves them, regenerate with
the printed values; any unintentional drift is a consensus break."""

import hashlib
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

PINNED_VK_SHA256 = \
    "60574e82de83783bbb54838623dad0670737c6a32f6ee47722a99a20546488f3"
TRANSCRIPT_REPR = \
    0x0b8af4d112faf6d4beaa3f5cdd342fa078258c429d164b0995a73050f22abe1b
PROOF_SHA256 = \
    "2ef8d7551fc0b4322fc20f6fdc8244ffc79543a24f788e8b0435f137665da6a1"
PROOF_LEN = 1536


@pytest.fixture(scope="module")
def setup():
    params = ParamsIPA.new(VESTA, K)
    a, b, constant = 2, 3, 7
    c = (constant * a * a * b * b) % F.p
    circuit = SimpleCircuit(constant, Value.known(a), Value.known(b))
    pk = keygen(F, params, K, circuit)
    return params, pk, circuit, c


def test_pinned_vk(setup):
    _params, pk, _circuit, _c = setup
    pinned = pk.vk.pinned()
    got = hashlib.sha256(pinned.encode()).hexdigest()
    assert got == PINNED_VK_SHA256, (
        f"pinned vk drifted: sha256={got}\nfirst 400 chars:\n{pinned[:400]}")
    assert pk.vk.transcript_repr == TRANSCRIPT_REPR, \
        hex(pk.vk.transcript_repr)


def test_pinned_proof(setup):
    params, pk, circuit, c = setup
    proof = create_proof(params, pk, [circuit], [[[c]]], random.Random(42))
    assert len(proof) == PROOF_LEN, len(proof)
    got = hashlib.sha256(proof).hexdigest()
    assert got == PROOF_SHA256, f"proof bytes drifted: sha256={got}"
    assert verify(params, pk.vk, proof, [[[c]]])
