"""Deliberately-lying multiopen negatives, one per scheme.

The reference's scheme-parametric harness includes a prover that lies about
a single claimed evaluation and asserts `finalize() == false`
(halo2_backend/src/poly/multiopen_test.rs:180-223).  Same shape here: a
valid opening proof is created, then the verifier is fed one corrupted
eval; every scheme (IPA multiopen, KZG-GWC, KZG-SHPLONK) must reject —
and must reject for EVERY corrupted query position, not just one.
"""

import random

import pytest

from halo2_tpu.commit import (
    Blind, PolyRef, ProverQuery, VerifierQuery,
    ParamsIPA, ProverIPA, VerifierIPA, SingleStrategyIPA,
    ParamsKZG, ProverGWC, VerifierGWC,
    ProverSHPLONK, VerifierSHPLONK, SingleStrategyKZG,
)
from halo2_tpu.curves import BN254_G1, VESTA
from halo2_tpu.poly.arith import eval_polynomial_int
from halo2_tpu.transcript import Blake2bRead, Blake2bWrite

K = 4

SCHEMES = {
    "ipa": (lambda: ParamsIPA.new(VESTA, K), VESTA,
            ProverIPA, VerifierIPA, SingleStrategyIPA),
    "gwc": (lambda: ParamsKZG.new(K), BN254_G1,
            ProverGWC, VerifierGWC, SingleStrategyKZG),
    "shplonk": (lambda: ParamsKZG.new(K), BN254_G1,
                ProverSHPLONK, VerifierSHPLONK, SingleStrategyKZG),
}


@pytest.mark.parametrize("name", sorted(SCHEMES))
def test_multiopen_rejects_wrong_eval(name):
    params_fn, curve, prover_cls, verifier_cls, strategy_cls = SCHEMES[name]
    params = params_fn()
    F = curve.Fr
    p = F.p
    rng = random.Random(99)

    polys_int = [[rng.randrange(p) for _ in range(params.n)]
                 for _ in range(3)]
    refs = [PolyRef(F.encode_ints(ci), Blind.random(F, rng))
            for ci in polys_int]
    comms = [params.commit_affine(r.poly, r.blind) for r in refs]

    x, y = 48278743, 938283942
    # two distinct rotation sets: poly0 at {x}; poly1, poly2 at {x, y}
    keys = [(0, x), (1, x), (1, y), (2, x), (2, y)]
    pq = [ProverQuery(pt, refs[i]) for i, pt in keys]
    evals = {k: eval_polynomial_int(p, polys_int[k[0]], k[1]) for k in keys}

    t = Blake2bWrite(curve)
    for c in comms:
        t.write_point(c)
    for k in keys:
        t.write_scalar(evals[k])
    prover_cls(params).create_proof(rng, t, pq)
    proof = t.finalize()

    def run(lie=None):
        r = Blake2bRead(curve, proof)
        cs = r.read_n_points(3)
        es = {k: r.read_scalar() for k in keys}
        if lie is not None:
            es[lie] = (es[lie] + 1) % p
        vq = [VerifierQuery(pt, cs[i], es[(i, pt)], ident=("c", i))
              for i, pt in keys]
        return strategy_cls(params).process(
            lambda msm: verifier_cls(params).verify_proof(r, vq, msm))

    assert run(), f"{name}: honest verification failed"
    for k in keys:
        assert not run(lie=k), f"{name}: accepted a lie about eval {k}"
