"""Non-toy domain sizes and multi-circuit proofs (VERDICT round-1 item 9).

The plonk_api circuit carries 12 permutation columns (6 z-sets at degree
4), a lookup, and prev/next rotations, so running it at k=11 exercises
multi-set permutation chaining and all rotation paths at a 2048-row domain.
The 2-circuit test proves two instances of the circuit in ONE transcript
(the reference's Prover is a multi-circuit state machine, prover.rs:130).
"""

import random

import pytest

from halo2_tpu.api import create_proof, keygen, verify
from halo2_tpu.commit.ipa import ParamsIPA
from halo2_tpu.compat.plonk_api import PlonkApiCircuit, plonk_api_instance
from halo2_tpu.curves import VESTA
from halo2_tpu.fields import PASTA_FP as F


@pytest.mark.slow
def test_e2e_k11_plonk_api_ipa():
    K = 11
    circuit, instances = plonk_api_instance(F)
    params = ParamsIPA.new(VESTA, K)
    pk = keygen(F, params, K, circuit)
    # 6 permutation z-sets at this degree — multi-set chaining is live
    chunk = pk.vk.cs_degree - 2
    n_sets = -(-len(pk.vk.cs.cs.permutation.columns) // chunk)
    assert n_sets >= 2
    proof = create_proof(params, pk, [circuit], [instances],
                         random.Random(21))
    assert verify(params, pk.vk, proof, [instances])
    bad = bytearray(proof)
    bad[33] ^= 2
    assert not verify(params, pk.vk, bytes(bad), [instances])


@pytest.mark.slow
def test_two_circuits_one_transcript():
    """Runs in a subprocess: XLA:CPU deterministically segfaults compiling
    this program once the worker has accumulated enough live JIT
    executables (same upstream bug as test_msm_adversarial_distributions;
    standalone the test always passes — reconfirmed twice this round
    after the round-5 suite additions pushed the shared worker over the
    threshold)."""
    import os
    import subprocess
    import sys
    if not os.environ.get("HALO2_SCALE_2CIRC_INNER"):
        env = dict(os.environ, HALO2_SCALE_2CIRC_INNER="1")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x",
             os.path.abspath(__file__)
             + "::test_two_circuits_one_transcript"],
            env=env, capture_output=True, timeout=1200)
        assert r.returncode == 0, r.stdout.decode()[-2000:]
        return
    _two_circuits_one_transcript_body()


def _two_circuits_one_transcript_body():
    K = 6
    c1, i1 = plonk_api_instance(F)
    # the pk is shared, so circuit 2 must use the SAME fixed lookup table;
    # its witness differs but stays inside the table (a = 2)
    c2 = PlonkApiCircuit(F.p, 2, c1.lookup_table)
    i2 = [[2]]
    params = ParamsIPA.new(VESTA, K)
    pk = keygen(F, params, K, c1)
    proof = create_proof(params, pk, [c1, c2], [i1, i2], random.Random(5))
    assert verify(params, pk.vk, proof, [i1, i2])
    # wrong instance for the second circuit must fail
    assert not verify(params, pk.vk, proof, [i1, [[3]]])
