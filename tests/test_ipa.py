"""IPA commitment scheme tests (mirrors poly/ipa/commitment.rs:253-392 and
the multiopen roundtrip harness shape of poly/multiopen_test.rs)."""

import random

import jax.numpy as jnp
import pytest

from halo2_tpu.curves import VESTA
from halo2_tpu.commit import (
    Blind, PolyRef, ProverQuery, VerifierQuery,
    ParamsIPA, ProverIPA, VerifierIPA, SingleStrategyIPA,
    create_opening_proof, verify_opening_proof,
)
from halo2_tpu.poly import EvaluationDomain, eval_polynomial_int
from halo2_tpu.transcript import Blake2bWrite, Blake2bRead

K = 4


@pytest.fixture(scope="module")
def params():
    return ParamsIPA.new(VESTA, K)


def test_commit_lagrange_matches_commit(params):
    # kzg/commitment.rs:381-408 analog for IPA: commit(coeff) == commit_lagrange(values)
    F = VESTA.Fr
    d = EvaluationDomain(F, 3, K)
    rng = random.Random(0)
    vals = [rng.randrange(F.p) for _ in range(d.n)]
    lagrange = F.encode_ints(vals)
    coeff = d.lagrange_to_coeff(lagrange)
    b = Blind(42)
    c1 = params.commit(coeff, b)
    c2 = params.commit_lagrange(lagrange, b)
    assert bool(VESTA.eq(c1, c2))


def test_opening_roundtrip(params):
    F = VESTA.Fr
    rng = random.Random(1)
    coeffs = [rng.randrange(F.p) for _ in range(params.n)]
    poly = F.encode_ints(coeffs)
    blind = Blind.random(F, rng)
    commitment = params.commit_affine(poly, blind)

    t = Blake2bWrite(VESTA)
    t.write_point(commitment)
    x = t.squeeze_challenge()
    v = eval_polynomial_int(F.p, coeffs, x)
    t.write_scalar(v)
    create_opening_proof(params, rng, t, poly, blind, x)
    proof = t.finalize()

    r = Blake2bRead(VESTA, proof)
    comm2 = r.read_point()
    x2 = r.squeeze_challenge()
    v2 = r.read_scalar()
    assert (comm2, x2, v2) == (commitment, x, v)
    msm = params.empty_msm()
    msm.append_term(1, comm2)
    guard = verify_opening_proof(params, msm, r, x2, v2)
    assert guard.use_challenges().check()

    # negative: lying about the eval must fail
    r = Blake2bRead(VESTA, proof)
    comm2 = r.read_point()
    x2 = r.squeeze_challenge()
    v2 = r.read_scalar()
    msm = params.empty_msm()
    msm.append_term(1, comm2)
    guard = verify_opening_proof(params, msm, r, x2, (v2 + 1) % F.p)
    assert not guard.use_challenges().check()


def test_multiopen_roundtrip(params):
    F = VESTA.Fr
    p = F.p
    rng = random.Random(2)
    d = EvaluationDomain(F, 3, K)

    polys_int = [[rng.randrange(p) for _ in range(params.n)] for _ in range(3)]
    refs = [PolyRef(F.encode_ints(ci), Blind.random(F, rng))
            for ci in polys_int]
    comms = [params.commit_affine(r.poly, r.blind) for r in refs]

    x = 1234567
    y = 7654321
    # poly0 at {x}, poly1 at {x, y}, poly2 at {x, y} (two distinct point sets)
    pq = [ProverQuery(x, refs[0]), ProverQuery(x, refs[1]),
          ProverQuery(y, refs[1]), ProverQuery(x, refs[2]),
          ProverQuery(y, refs[2])]
    evals = {(i, pt): eval_polynomial_int(p, polys_int[i], pt)
             for i, pt in [(0, x), (1, x), (1, y), (2, x), (2, y)]}

    t = Blake2bWrite(VESTA)
    for c in comms:
        t.write_point(c)
    for key in sorted(evals):
        t.write_scalar(evals[key])
    ProverIPA(params).create_proof(rng, t, pq)
    proof = t.finalize()

    def run_verifier(tamper=None):
        r = Blake2bRead(VESTA, proof)
        cs = r.read_n_points(3)
        es = {}
        for key in sorted(evals):
            es[key] = r.read_scalar()
        if tamper:
            es[tamper] = (es[tamper] + 1) % p
        vq = [VerifierQuery(x, cs[0], es[(0, x)]),
              VerifierQuery(x, cs[1], es[(1, x)]),
              VerifierQuery(y, cs[1], es[(1, y)]),
              VerifierQuery(x, cs[2], es[(2, x)]),
              VerifierQuery(y, cs[2], es[(2, y)])]
        verifier = VerifierIPA(params)
        strategy = SingleStrategyIPA(params)
        return strategy.process(
            lambda msm: verifier.verify_proof(r, vq, msm))

    assert run_verifier()
    assert not run_verifier(tamper=(1, y))


def test_guard_use_g_accumulator(params):
    """Recursion surface (strategy.rs:54-71): verifying via use_g(compute_g)
    must agree with use_challenges, and the Accumulator carries the claim."""
    import random
    from halo2_tpu.commit.ipa import (
        create_opening_proof, verify_opening_proof, Blind)

    F = params.curve.Fr
    p = F.p
    rng = random.Random(3)
    poly_int = [rng.randrange(p) for _ in range(params.n)]
    poly = F.encode_ints(poly_int)
    blind = Blind(rng.randrange(p))
    comm = params.commit_affine(poly, blind)
    x = rng.randrange(p)
    v = eval_polynomial_int(p, poly_int, x)

    t = Blake2bWrite(params.curve)
    create_opening_proof(params, rng, t, poly, blind, x)
    proof = t.finalize()

    def fresh_guard():
        msm = params.empty_msm()
        msm.append_term(1, comm)
        r = Blake2bRead(params.curve, proof)
        return verify_opening_proof(params, msm, r, x, v)

    assert fresh_guard().use_challenges().check()

    guard = fresh_guard()
    g = guard.compute_g()
    msm2, acc = guard.use_g(g)
    assert msm2.check()
    assert acc.u_packed and acc.g == g
