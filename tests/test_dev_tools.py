"""Dev tooling: cost model, gates inspector, tracing planner, batch verifier,
vk/pk serde."""

import random

import pytest

from halo2_tpu.api import keygen, create_proof, verify
from halo2_tpu.commit import ParamsIPA
from halo2_tpu.compat import vk_write, vk_read, pk_write, pk_read
from halo2_tpu.curves import VESTA
from halo2_tpu.dev import (
    CircuitCost, CircuitGates, TracingFloorPlanner, MockProver,
)
from halo2_tpu.fields import PASTA_FP
from halo2_tpu.frontend import Value, SimpleFloorPlanner
from halo2_tpu.plonk import BatchVerifier

from circuits import SimpleCircuit

F = PASTA_FP
K = 5


def make():
    a, b, constant = 2, 3, 7
    c = (constant * a * a * b * b) % F.p
    return SimpleCircuit(constant, Value.known(a), Value.known(b)), c


def test_cost_model():
    circuit, _ = make()
    cost = CircuitCost.measure(K, circuit)
    assert cost.advice_columns == 2
    assert cost.instance_columns == 1
    assert cost.gates == 1
    assert cost.permutation_columns == 4   # instance + constant + 2 advice
    for scheme in ("ipa", "kzg-gwc", "kzg-shplonk"):
        assert cost.proof_size(scheme) > 0
        # verification-time model (book dev-tools.md:113): IPA pays the
        # 2^k b-vector MSM, so it must dominate the KZG estimates
        assert cost.verification_time(scheme) > 0
    assert cost.verification_time("ipa") > cost.verification_time(
        "kzg-shplonk") - 0.35  # minus the pairing constant
    sizes = cost.verifier_msm_sizes("ipa")
    assert (1 << cost.k) in sizes
    j = cost.to_json()
    assert "proof_size" in j and "verification_time_s" in j


def test_circuit_gates():
    circuit, _ = make()
    gates = CircuitGates.collect(circuit)
    text = str(gates)
    assert "mul" in text and "advice[0]" in text
    qs = gates.queries()
    assert len(qs["advice"]) == 3


def test_tracing_floor_planner():
    circuit, c = make()
    events = []
    circuit.floor_planner = TracingFloorPlanner(
        SimpleFloorPlanner, log_fn=events.append)
    prover = MockProver.run(F, K, circuit, [[c]])
    assert prover.verify() == []
    assert any(e.startswith("enter_region") for e in events)
    assert any(e.startswith("assign_advice") for e in events)
    assert any(e.startswith("copy") for e in events)
    SimpleCircuit.floor_planner = SimpleFloorPlanner  # restore


@pytest.fixture(scope="module")
def setup():
    params = ParamsIPA.new(VESTA, K)
    circuit, c = make()
    pk = keygen(F, params, K, circuit)
    return params, pk, circuit, c


@pytest.mark.slow
def test_batch_verifier(setup):
    params, pk, circuit, c = setup
    p1 = create_proof(params, pk, [circuit], [[[c]]], random.Random(11))
    p2 = create_proof(params, pk, [circuit], [[[c]]], random.Random(12))
    batch = BatchVerifier(random.Random(0))
    batch.add_proof([[[c]]], p1)
    batch.add_proof([[[c]]], p2)
    assert batch.finalize(params, pk.vk)

    bad = bytearray(p2)
    bad[50] ^= 1
    batch2 = BatchVerifier(random.Random(0))
    batch2.add_proof([[[c]]], p1)
    batch2.add_proof([[[c]]], bytes(bad))
    assert not batch2.finalize(params, pk.vk)


def test_batch_verifier_canceling_errors(setup):
    """batch.rs:96-106: the accumulator must be rescaled by a fresh random
    factor before each proof's MSM folds in.  Under weight-1 folding, two
    invalid proofs whose MSM errors are exact negatives sum to the identity
    and the batch wrongly verifies.  This drives `finalize` with two stub
    guards whose MSMs cancel: [s]W and [-s]W."""
    from unittest import mock

    import halo2_tpu.plonk.batch as batch_mod

    params, pk, circuit, c = setup
    p = params.curve.Fr.p
    s = 12345
    errors = [s, p - s]   # canceling MSM "errors"

    class FakeGuard:
        def __init__(self, scalar):
            self.scalar = scalar

        def use_challenges(self):
            m = params.empty_msm()
            m.append_term(self.scalar, params.w_aff)
            return m

    class FakeVerifier:
        QUERY_INSTANCE = True

        def __init__(self, _params):
            pass

        def verify_proof(self, transcript, queries, msm):
            # msm must arrive UNscaled-empty; fold scaling happens outside
            assert not msm.terms and msm.g_scalars is None
            return FakeGuard(errors.pop(0))

    batch = BatchVerifier(random.Random(7))
    batch.add_proof([], b"")
    batch.add_proof([], b"")
    with mock.patch.object(batch_mod, "VerifierIPA", FakeVerifier), \
            mock.patch.object(batch_mod, "backend_verify_queries",
                              lambda *a, **k: []):
        assert not batch.finalize(params, pk.vk)


def test_vk_pk_serde(setup):
    """Reference-layout roundtrip (plonk.rs:58-155, :297-376): the vk hash
    is NOT stored — it is recomputed from the recompiled constraint system
    plus the stored commitments, so repr equality validates everything."""
    import numpy as np
    params, pk, circuit, c = setup
    blob = vk_write(pk.vk)
    vk2 = vk_read(F, params, K, circuit, blob)
    assert vk2.transcript_repr == pk.vk.transcript_repr
    assert vk2.fixed_commitments == pk.vk.fixed_commitments

    pkb = pk_write(pk)
    pk2 = pk_read(F, params, K, circuit, pkb)
    assert pk2.vk.transcript_repr == pk.vk.transcript_repr
    assert np.array_equal(np.asarray(pk2.fixed_polys),
                          np.asarray(pk.fixed_polys))
    assert np.array_equal(np.asarray(pk2.permutation.cosets),
                          np.asarray(pk.permutation.cosets))

    # header layout: version byte 0x04, then k as u8 (plonk.rs:73-78)
    assert blob[0] == 0x04 and blob[1] == K

    # corrupting a commitment byte breaks point decoding or moves the hash
    bad = bytearray(blob)
    bad[-1] ^= 0x41
    try:
        vk_bad = vk_read(F, params, K, circuit, bytes(bad))
        assert vk_bad.transcript_repr != pk.vk.transcript_repr
    except ValueError:
        pass


def test_vk_serde_formats(setup):
    """helpers.rs SerdeFormat: PROCESSED (compressed, checked), RAW_BYTES
    (Montgomery coords, on-curve checked), RAW_BYTES_UNCHECKED.  The format
    is out-of-band (a function argument), as in the reference."""
    from halo2_tpu.compat import SerdeFormat
    params, pk, circuit, c = setup
    for fmt in SerdeFormat:
        blob = vk_write(pk.vk, fmt)
        vk2 = vk_read(F, params, K, circuit, blob, fmt)
        assert vk2.transcript_repr == pk.vk.transcript_repr, fmt
    # RAW_BYTES is 64 bytes/point vs 32 compressed
    assert len(vk_write(pk.vk, SerdeFormat.RAW_BYTES)) > len(
        vk_write(pk.vk, SerdeFormat.PROCESSED))
    # RAW_BYTES validates curve membership; corrupt a coordinate byte
    blob = bytearray(vk_write(pk.vk, SerdeFormat.RAW_BYTES))
    blob[14] ^= 0x5A
    with pytest.raises(ValueError):
        vk_read(F, params, K, circuit, bytes(blob), SerdeFormat.RAW_BYTES)


def test_namespace_gadget_provenance():
    """Layouter.namespace records the opening gadget's qualified function
    name and reports it on pop (the reference's gadget-traces feature,
    circuit.rs:948-979); TracingAssignment logs both events."""
    circuit, c = make()
    events = []
    circuit.floor_planner = TracingFloorPlanner(
        SimpleFloorPlanner, log_fn=events.append)

    orig_synth = type(circuit).synthesize

    def synth_with_namespace(self, config, layouter):
        with layouter.namespace("my gadget") as ns:
            orig_synth(self, config, ns)

    type(circuit).synthesize = synth_with_namespace
    try:
        prover = MockProver.run(F, K, circuit, [[c]])
        assert prover.verify() == []
    finally:
        type(circuit).synthesize = orig_synth
    assert any(e == "push_namespace: my gadget" for e in events), events[:5]
    pops = [e for e in events if e.startswith("pop_namespace")]
    assert pops and "synth_with_namespace" in pops[0], pops
