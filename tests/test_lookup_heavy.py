"""Lookup-heavy circuit (BASELINE config 4 shape) + bulk witness API.

Mirrors the reference's dev_lookup bench circuit class
(halo2_proofs/benches/dev_lookup.rs:103-107) and the zkEVM-style
lookup-dominated workload the streamed cosets serve
(halo2_backend/src/plonk/evaluation.rs:486-558).
"""

import random

import pytest

from halo2_tpu.fields import BN254_FR as F
from halo2_tpu.compat.lookup_heavy import lookup_heavy_instance
from halo2_tpu.dev.mock_prover import MockProver


def test_mock_prover_accepts_and_rejects():
    circuit, instances, _ = lookup_heavy_instance(F, 9)
    assert MockProver.run(F, 9, circuit, instances).verify() == []

    bad, inst, _ = lookup_heavy_instance(F, 9)
    bad.witness["x1"][5] = (1 << bad.table_bits) + 5   # out of table range
    assert MockProver.run(F, 9, bad, inst).verify() != []

    bad2, inst2, _ = lookup_heavy_instance(F, 9)
    bad2.witness["acc"][7] += 1                        # breaks the gate
    assert MockProver.run(F, 9, bad2, inst2).verify() != []


def test_bulk_assignment_matches_per_cell():
    """The bulk column path must produce the same witness the per-cell
    path produces (WitnessCalculator.calc output equality)."""
    from halo2_tpu.frontend.circuit import (
        WitnessCalculator, compile_circuit)
    circuit, instances, kg = lookup_heavy_instance(F, 9, rows=100)
    compiled, config, cs = compile_circuit(F, 9, kg)

    calc = WitnessCalculator(F, 9, circuit, config, cs, instances)
    bulk = calc.calc(0, {})

    # per-cell variant: strip the sink's slice fast-paths so Region falls
    # back to per-cell assign_advice
    class PerCell(WitnessCalculator):
        def calc(self, phase, challenges):
            from halo2_tpu.frontend import circuit as fc
            orig = fc.WitnessCollection.assign_advice_slice
            del fc.WitnessCollection.assign_advice_slice
            try:
                return super().calc(phase, challenges)
            finally:
                fc.WitnessCollection.assign_advice_slice = orig

    percell = PerCell(F, 9, circuit, config, cs, instances).calc(0, {})
    assert bulk == percell


@pytest.mark.slow
def test_e2e_kzg_shplonk_k10():
    """Full prove/verify of the lookup-heavy circuit (KZG + SHPLONK)."""
    from halo2_tpu.api import keygen, create_proof, verify
    from halo2_tpu.commit import (ParamsKZG, ProverSHPLONK, VerifierSHPLONK,
                                  SingleStrategyKZG)
    k = 10
    circuit, instances, kgc = lookup_heavy_instance(F, k)
    params = ParamsKZG.new(k)
    pk = keygen(F, params, k, kgc)
    proof = create_proof(params, pk, [circuit], [instances],
                         random.Random(7), multiopen_prover_cls=ProverSHPLONK)
    assert verify(params, pk.vk, proof, [instances],
                  multiopen_verifier_cls=VerifierSHPLONK,
                  strategy_cls=SingleStrategyKZG)
    bad = bytearray(proof)
    bad[11] ^= 1
    assert not verify(params, pk.vk, bytes(bad), [instances],
                      multiopen_verifier_cls=VerifierSHPLONK,
                      strategy_cls=SingleStrategyKZG)
