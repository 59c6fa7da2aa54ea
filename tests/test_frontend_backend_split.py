"""Frontend/backend split API (tests/frontend_backend_split.rs): drive the
pipeline stage-by-stage — compile_circuit -> backend keygen (no circuit
object) -> per-phase WitnessCalculator + Prover.commit_phase ->
create_proof -> verify_proof_single — without the legacy api.py glue."""

import random

import pytest

from halo2_tpu.commit import (
    ParamsIPA, ProverIPA, VerifierIPA, SingleStrategyIPA,
)
from halo2_tpu.curves import VESTA
from halo2_tpu.fields import PASTA_FP
from halo2_tpu.frontend import Value, compile_circuit, WitnessCalculator
from halo2_tpu.plonk import keygen as backend_keygen, Prover
from halo2_tpu.plonk.verifier import verify_proof_single
from halo2_tpu.transcript import Blake2bWrite, Blake2bRead

from circuits import LookupCircuit

F = PASTA_FP
K = 5


@pytest.mark.slow
def test_split_api_roundtrip():
    values = [1, 2, 3, 5, 7, 2, 4, 8]
    circuit = LookupCircuit(values)

    # stage 1: frontend compile (compile_circuit -> CompiledCircuit)
    compiled, config, cs = compile_circuit(F, K, circuit)

    # stage 2: backend keygen from the compiled matrix only
    params = ParamsIPA.new(VESTA, K)
    pk = backend_keygen(F, params, compiled, K)

    # stage 3: per-phase witness calc + commit_phase (ProverSingle shape,
    # backend prover.rs:44-125)
    inst = []
    rng = random.Random(77)
    transcript = Blake2bWrite(params.curve)
    mo = ProverIPA(params)
    prover = Prover(params, pk, [inst], rng, transcript,
                    query_instance=mo.QUERY_INSTANCE)
    compiled2, config2, cs2 = compile_circuit(F, K, circuit)
    calc = WitnessCalculator(F, K, circuit, config2, cs2, inst)
    challenges = {}
    for phase in cs2.phases():
        witness = calc.calc(phase, challenges)
        challenges = prover.commit_phase(phase, [witness])

    # stage 4: the 14-step proof
    queries = prover.create_proof()
    mo.create_proof(rng, transcript, queries)
    proof = transcript.finalize()
    assert len(proof) > 0

    # stage 5: single verify
    ok = verify_proof_single(params, pk.vk, proof, [[]],
                             transcript_cls=Blake2bRead,
                             multiopen_verifier_cls=VerifierIPA,
                             strategy_cls=SingleStrategyIPA)
    assert ok

    # tampered proof must fail
    bad = bytearray(proof)
    bad[12] ^= 1
    try:
        ok_bad = verify_proof_single(params, pk.vk, bytes(bad), [[]],
                                     transcript_cls=Blake2bRead,
                                     multiopen_verifier_cls=VerifierIPA,
                                     strategy_cls=SingleStrategyIPA)
    except (ValueError, AssertionError):
        ok_bad = False
    assert not ok_bad
