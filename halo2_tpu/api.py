"""Top-level proving API (the halo2_proofs legacy-glue equivalent:
halo2_proofs/src/plonk/{keygen,prover}.rs).

    params = ParamsIPA.new(VESTA, k)
    pk = keygen(F, params, k, circuit)
    proof = create_proof(params, pk, [circuit], [instances], rng)
    ok = verify(params, pk.vk, proof, [instances])
"""

from __future__ import annotations

from typing import List, Optional

from .commit import (
    ParamsIPA, ProverIPA, VerifierIPA, SingleStrategyIPA, new_rng,
)
from .frontend import compile_circuit, WitnessCalculator
from .plonk import keygen as backend_keygen, Prover
from .plonk.verifier import verify_proof as backend_verify_queries
from .transcript import Blake2bWrite, Blake2bRead


def keygen(F, params, k: int, circuit, compress_selectors: bool = True,
           engine=None):
    """compile_circuit + backend keygen; returns ProvingKey (with .vk)."""
    compiled, _config, _cs = compile_circuit(F, k, circuit,
                                             compress_selectors)
    return backend_keygen(F, params, compiled, k, engine=engine)


def create_proof(params, pk, circuits: List, instances: List[List[List[int]]],
                 rng=None, transcript_cls=Blake2bWrite,
                 multiopen_prover_cls=ProverIPA, engine=None,
                 timings: Optional[dict] = None) -> bytes:
    """Full proof over one or more circuit instances
    (halo2_proofs/src/plonk/prover.rs:19-98).  Pass a dict as `timings` to
    collect the per-[TRANSCRIPT-N] step wall-time table (SURVEY §5.1)."""
    import time
    F = pk.vk.F
    k = pk.vk.k
    rng = rng if rng is not None else new_rng()
    transcript = transcript_cls(params.curve)
    mo_prover = multiopen_prover_cls(params)

    t0 = time.time()
    prover = Prover(params, pk, instances, rng, transcript,
                    query_instance=mo_prover.QUERY_INSTANCE, engine=engine)
    prover.timings = {} if timings is None else timings
    prover.timings["instances [T1-2]"] = time.time() - t0

    # per-circuit witness calculators over freshly-configured constraint
    # systems (must structurally match the pk's).  Configuration ONLY — the
    # reference's create_proof also just configures (prover.rs:44-55);
    # running full compile_circuit here would redo keygen-assembly
    # synthesis + selector compression (seconds of host work at k>=18)
    # for data the pk already holds.
    t0 = time.time()
    from .frontend.circuit import configure_circuit
    from .frontend.constraint_system import ConstraintSystem
    calcs = []
    for circuit, inst in zip(circuits, instances):
        cs_front = ConstraintSystem()
        config = configure_circuit(circuit, cs_front)
        calcs.append(WitnessCalculator(F, k, circuit, config, cs_front, inst))

    challenges = {}
    cs = pk.vk.cs.cs
    for phase in cs.phases():
        witnesses = [calc.calc(phase, challenges) for calc in calcs]
        challenges = prover.commit_phase(phase, witnesses)
    prover.timings["witness+advice_commits [T3-4]"] = time.time() - t0

    queries = prover.create_proof()
    t0 = time.time()
    mo_prover.create_proof(rng, transcript, queries)
    prover.timings["multiopen [T24+]"] = time.time() - t0
    return transcript.finalize()


def verify(params, vk, proof: bytes, instances: List[List[List[int]]],
           transcript_cls=Blake2bRead, multiopen_verifier_cls=VerifierIPA,
           strategy_cls=SingleStrategyIPA) -> bool:
    from .plonk.errors import VerifyError
    transcript = transcript_cls(params.curve, proof)
    verifier = multiopen_verifier_cls(params)
    try:
        queries = backend_verify_queries(
            params, vk, transcript, instances, verifier.QUERY_INSTANCE)
        strategy = strategy_cls(params)
        return strategy.process(
            lambda msm: verifier.verify_proof(transcript, queries, msm))
    except VerifyError:
        # typed proof-format/algebra failures are "invalid proof";
        # anything else (AssertionError etc.) is a bug and propagates
        return False
