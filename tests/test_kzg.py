"""KZG scheme tests: commit identity, GWC multiopen roundtrip, pairing path,
and end-to-end proofs over KZG/BN254 (Blake2b + Keccak transcripts)."""

import random

import pytest

from halo2_tpu.api import keygen, create_proof, verify
from halo2_tpu.commit import (
    Blind, PolyRef, ProverQuery, VerifierQuery,
    ParamsKZG, ProverGWC, VerifierGWC, SingleStrategyKZG, DualMSM,
)
from halo2_tpu.curves import BN254_G1
from halo2_tpu.fields import BN254_FR
from halo2_tpu.frontend import Value
from halo2_tpu.poly import EvaluationDomain, eval_polynomial_int
from halo2_tpu.transcript import (
    Blake2bWrite, Blake2bRead, Keccak256Write, Keccak256Read,
)

from circuits import SimpleCircuit

F = BN254_FR
K = 4


@pytest.fixture(scope="module")
def params():
    return ParamsKZG.new(K)


def test_commit_lagrange_matches_commit(params):
    d = EvaluationDomain(F, 3, K)
    rng = random.Random(0)
    vals = [rng.randrange(F.p) for _ in range(d.n)]
    lagrange = F.encode_ints(vals)
    coeff = d.lagrange_to_coeff(lagrange)
    c1 = params.commit(coeff)
    c2 = params.commit_lagrange(lagrange)
    assert bool(BN254_G1.eq(c1, c2))


def test_gwc_multiopen_roundtrip(params):
    p = F.p
    rng = random.Random(1)
    polys_int = [[rng.randrange(p) for _ in range(params.n)] for _ in range(2)]
    refs = [PolyRef(F.encode_ints(ci), Blind(0)) for ci in polys_int]
    comms = [params.commit_affine(r.poly) for r in refs]

    x, z = 111, 222
    pq = [ProverQuery(x, refs[0]), ProverQuery(x, refs[1]),
          ProverQuery(z, refs[1])]
    evals = {(0, x): eval_polynomial_int(p, polys_int[0], x),
             (1, x): eval_polynomial_int(p, polys_int[1], x),
             (1, z): eval_polynomial_int(p, polys_int[1], z)}

    t = Blake2bWrite(BN254_G1)
    for c in comms:
        t.write_point(c)
    for key in sorted(evals):
        t.write_scalar(evals[key])
    ProverGWC(params).create_proof(rng, t, pq)
    proof = t.finalize()

    def run(tamper=None):
        r = Blake2bRead(BN254_G1, proof)
        cs = r.read_n_points(2)
        es = {k: r.read_scalar() for k in sorted(evals)}
        if tamper:
            es[tamper] = (es[tamper] + 1) % p
        vq = [VerifierQuery(x, cs[0], es[(0, x)]),
              VerifierQuery(x, cs[1], es[(1, x)]),
              VerifierQuery(z, cs[1], es[(1, z)])]
        return SingleStrategyKZG(params).process(
            lambda msm: VerifierGWC(params).verify_proof(r, vq, msm))

    assert run()
    assert not run(tamper=(1, z))


def test_pairing_path_matches_fast_path(params):
    # same check through the real pairing (s_secret hidden)
    p = F.p
    rng = random.Random(2)
    poly_int = [rng.randrange(p) for _ in range(params.n)]
    ref = PolyRef(F.encode_ints(poly_int), Blind(0))
    comm = params.commit_affine(ref.poly)
    x = 777
    ev = eval_polynomial_int(p, poly_int, x)
    t = Blake2bWrite(BN254_G1)
    t.write_point(comm)
    t.write_scalar(ev)
    ProverGWC(params).create_proof(rng, t, [ProverQuery(x, ref)])
    proof = t.finalize()

    for hide_secret in (False, True):
        params2 = ParamsKZG(params.k, params.g_aff, params.g_lagrange_aff,
                            params.g2, params.s_g2,
                            s_secret=None if hide_secret else params.s_secret)
        r = Blake2bRead(BN254_G1, proof)
        c2 = r.read_point()
        e2 = r.read_scalar()
        vq = [VerifierQuery(x, c2, e2)]
        ok = SingleStrategyKZG(params2).process(
            lambda msm: VerifierGWC(params2).verify_proof(r, vq, msm))
        assert ok, f"hide_secret={hide_secret}"


KE2E = 5


@pytest.fixture(scope="module")
def e2e():
    params = ParamsKZG.new(KE2E)
    a, b, constant = 3, 5, 7
    c = (constant * a * a * b * b) % F.p
    circuit = SimpleCircuit(constant, Value.known(a), Value.known(b))
    pk = keygen(F, params, KE2E, circuit)
    return params, pk, circuit, c


def test_e2e_kzg_gwc_blake2b(e2e):
    params, pk, circuit, c = e2e
    proof = create_proof(params, pk, [circuit], [[[c]]], random.Random(3),
                         multiopen_prover_cls=ProverGWC)
    assert verify(params, pk.vk, proof, [[[c]]],
                  multiopen_verifier_cls=VerifierGWC,
                  strategy_cls=SingleStrategyKZG)
    assert not verify(params, pk.vk, proof, [[[(c + 1) % F.p]]],
                      multiopen_verifier_cls=VerifierGWC,
                      strategy_cls=SingleStrategyKZG)


def test_e2e_kzg_gwc_keccak(e2e):
    params, pk, circuit, c = e2e
    proof = create_proof(params, pk, [circuit], [[[c]]], random.Random(4),
                         transcript_cls=Keccak256Write,
                         multiopen_prover_cls=ProverGWC)
    assert verify(params, pk.vk, proof, [[[c]]],
                  transcript_cls=Keccak256Read,
                  multiopen_verifier_cls=VerifierGWC,
                  strategy_cls=SingleStrategyKZG)
    bad = bytearray(proof)
    bad[10] ^= 1
    assert not verify(params, pk.vk, bytes(bad), [[[c]]],
                      transcript_cls=Keccak256Read,
                      multiopen_verifier_cls=VerifierGWC,
                      strategy_cls=SingleStrategyKZG)


def test_e2e_kzg_shplonk(e2e):
    from halo2_tpu.commit import ProverSHPLONK, VerifierSHPLONK
    params, pk, circuit, c = e2e
    proof = create_proof(params, pk, [circuit], [[[c]]], random.Random(5),
                         multiopen_prover_cls=ProverSHPLONK)
    assert verify(params, pk.vk, proof, [[[c]]],
                  multiopen_verifier_cls=VerifierSHPLONK,
                  strategy_cls=SingleStrategyKZG)
    assert not verify(params, pk.vk, proof, [[[(c + 1) % F.p]]],
                      multiopen_verifier_cls=VerifierSHPLONK,
                      strategy_cls=SingleStrategyKZG)
    # shplonk proofs are shorter than gwc (2 closing points)
    bad = bytearray(proof)
    bad[-1] ^= 1
    assert not verify(params, pk.vk, bytes(bad), [[[c]]],
                      multiopen_verifier_cls=VerifierSHPLONK,
                      strategy_cls=SingleStrategyKZG)


def test_params_downsize(params):
    """downsize truncates g and recomputes g_lagrange (commitment.rs:291)."""
    small = params.downsize(K - 1)
    fresh = ParamsKZG.setup(K - 1, s=params.s_secret)
    assert small.g_aff == fresh.g_aff
    assert small.g_lagrange_aff == fresh.g_lagrange_aff


def test_premsm_batched_normalize(params):
    """PreMSM (kzg/msm.rs:96-137): projective device points -> one batched
    normalization; identity points survive as None bases and drop out of
    the accumulated MSM evaluation."""
    import random
    from halo2_tpu.commit.kzg import PreMSM, MSMKZG
    from halo2_tpu.msm.host_msm import host_msm
    from tests.test_curves_msm import py_mul, py_add
    curve = params.curve
    rng = random.Random(31)
    g = (curve.gen_x, curve.gen_y)
    terms = [(rng.randrange(1, 1000), rng.randrange(2, 50)) for _ in range(4)]
    pre = PreMSM(params)
    for s, m in terms:
        pt_aff = py_mul(curve, g, m)
        pre.append_term(s, curve.from_affine_ints([pt_aff])[0])
    pre.append_term(7, curve.identity(()))     # identity -> None base
    msm_acc = pre.to_msm()
    assert isinstance(msm_acc, MSMKZG)
    assert msm_acc.bases[-1] is None
    got = msm_acc.eval_affine()
    want = None
    for s, m in terms:
        want = py_add(curve, want, py_mul(curve, py_mul(curve, g, m), s))
    assert got == want
