"""Curve group law + MSM tests vs python-int ground truth."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from halo2_tpu.curves import BN254_G1, PALLAS, VESTA
from halo2_tpu.msm import msm, naive_msm, pippenger_msm, point_tree_sum


def py_add(curve, P, Q):
    """Affine addition over python ints; None = identity."""
    p = curve.Fq.p
    if P is None:
        return Q
    if Q is None:
        return P
    x1, y1 = P
    x2, y2 = Q
    if x1 == x2 and (y1 + y2) % p == 0:
        return None
    if P == Q:
        lam = (3 * x1 * x1) * pow(2 * y1, p - 2, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, p - 2, p) % p
    x3 = (lam * lam - x1 - x2) % p
    y3 = (lam * (x1 - x3) - y1) % p
    return (x3, y3)


def py_mul(curve, P, k):
    acc = None
    add = P
    while k:
        if k & 1:
            acc = py_add(curve, acc, add)
        add = py_add(curve, add, add)
        k >>= 1
    return acc


CURVES = [BN254_G1, PALLAS, VESTA]


@pytest.fixture(params=CURVES, ids=[c.name for c in CURVES])
def curve(request):
    return request.param


def test_generator_on_curve(curve):
    g = curve.generator()
    aff = curve.to_affine_ints(g[None])[0]
    x, y = aff
    assert (y * y - x * x * x - curve.b) % curve.Fq.p == 0


def test_add_double_vs_python(curve):
    g_aff = (curve.gen_x, curve.gen_y)
    pts_aff = [py_mul(curve, g_aff, k) for k in range(1, 9)]
    pts = curve.from_affine_ints(pts_aff)
    # pairwise adds
    s = curve.add(pts[:4], pts[4:])
    expected = [py_add(curve, pts_aff[i], pts_aff[4 + i]) for i in range(4)]
    assert curve.to_affine_ints(s) == expected
    # doubling
    d = curve.double(pts)
    assert curve.to_affine_ints(d) == [py_add(curve, q, q) for q in pts_aff]


def test_add_edge_cases(curve):
    g_aff = (curve.gen_x, curve.gen_y)
    g = curve.from_affine_ints([g_aff])
    inf = curve.identity((1,))
    # P + inf, inf + P, inf + inf
    assert curve.to_affine_ints(curve.add(g, inf)) == [g_aff]
    assert curve.to_affine_ints(curve.add(inf, g)) == [g_aff]
    assert curve.to_affine_ints(curve.add(inf, inf)) == [None]
    # P + P (equal points through add) == double
    assert curve.to_affine_ints(curve.add(g, g)) == [py_add(curve, g_aff, g_aff)]
    # P + (-P) = inf
    assert curve.to_affine_ints(curve.add(g, curve.neg(g))) == [None]
    # double(inf) = inf
    assert curve.to_affine_ints(curve.double(inf)) == [None]


def test_scalar_mul(curve):
    g_aff = (curve.gen_x, curve.gen_y)
    g = curve.from_affine_ints([g_aff] * 3)
    ks = [0, 12345, curve.Fr.p - 1]
    sm = curve.scalar_mul(g, curve.Fr.encode_ints(ks))
    assert curve.to_affine_ints(sm) == [py_mul(curve, g_aff, k) for k in ks]


def test_batch_normalize(curve):
    g_aff = (curve.gen_x, curve.gen_y)
    pts_aff = [py_mul(curve, g_aff, k) for k in [1, 2, 3]]
    pts = curve.from_affine_ints(pts_aff)
    d = curve.double(pts)  # non-trivial Z
    aff = curve.batch_normalize(d)
    xs = curve.Fq.decode_ints(aff[:, 0])
    ys = curve.Fq.decode_ints(aff[:, 1])
    expected = [py_add(curve, q, q) for q in pts_aff]
    assert list(zip(xs, ys)) == expected


@pytest.mark.parametrize("n", [1, 7])
def test_naive_msm(n):
    curve = VESTA
    rng = random.Random(n)
    g_aff = (curve.gen_x, curve.gen_y)
    pts_aff = [py_mul(curve, g_aff, rng.randrange(1, 1000)) for _ in range(n)]
    scalars = [rng.randrange(curve.Fr.p) for _ in range(n)]
    got = naive_msm(curve, curve.Fr.encode_ints(scalars),
                    curve.from_affine_ints(pts_aff))
    # ground truth via py ops on small multiples
    acc = None
    for s, pt in zip(scalars, pts_aff):
        acc = py_add(curve, acc, py_mul(curve, pt, s))
    assert curve.to_affine_ints(got[None])[0] == acc


def test_pippenger_matches_naive():
    curve = VESTA
    rng = random.Random(99)
    n = 100
    g_aff = (curve.gen_x, curve.gen_y)
    pts_aff = [py_mul(curve, g_aff, rng.randrange(1, 500)) for _ in range(n)]
    # include an identity point and zero scalar in the mix
    pts_aff[5] = None
    scalars = [rng.randrange(curve.Fr.p) for _ in range(n)]
    scalars[17] = 0
    enc_s = curve.Fr.encode_ints(scalars)
    enc_p = curve.from_affine_ints(pts_aff)
    fast = pippenger_msm(curve, enc_s, enc_p, c=8, block=16)
    slow = naive_msm(curve, enc_s, enc_p)
    assert bool(curve.eq(fast, slow))


def test_pippenger_window_c4():
    curve = BN254_G1
    rng = random.Random(7)
    n = 64
    g_aff = (curve.gen_x, curve.gen_y)
    pts_aff = [py_mul(curve, g_aff, rng.randrange(1, 500)) for _ in range(n)]
    scalars = [rng.randrange(curve.Fr.p) for _ in range(n)]
    enc_s = curve.Fr.encode_ints(scalars)
    enc_p = curve.from_affine_ints(pts_aff)
    slow = naive_msm(curve, enc_s, enc_p)
    fast = pippenger_msm(curve, enc_s, enc_p, c=4, block=32)
    assert bool(curve.eq(fast, slow))


def test_point_serde(curve):
    g_aff = (curve.gen_x, curve.gen_y)
    for k in [1, 2, 77]:
        pt = py_mul(curve, g_aff, k)
        b = curve.point_to_bytes(pt)
        assert len(b) == 32
        assert curve.point_from_bytes(b) == pt
    assert curve.point_from_bytes(curve.point_to_bytes(None)) is None


def test_windowed_msm_matches_naive():
    from halo2_tpu.msm.msm import CachedMSM
    curve = VESTA
    rng = random.Random(21)
    n = 40
    g_aff = (curve.gen_x, curve.gen_y)
    pts_aff = [py_mul(curve, g_aff, rng.randrange(1, 500)) for _ in range(n)]
    pts_aff[3] = None
    scalars = [rng.randrange(curve.Fr.p) for _ in range(n)]
    scalars[8] = 0
    enc_s = curve.Fr.encode_ints(scalars)
    enc_p = curve.from_affine_ints(pts_aff)
    engine = CachedMSM(curve, enc_p, c=8, block=16)
    fast = engine(enc_s)
    slow = naive_msm(curve, enc_s, enc_p)
    assert bool(curve.eq(fast, slow))


@pytest.mark.slow
def test_msm_adversarial_distributions():
    """Bucket accumulation must stay correct when every element lands in one
    bucket (equal scalars), when scalars are zero, and when n is not a
    multiple of the scan block (bucket_scan.py always-correct claim).

    Runs in a subprocess: XLA:CPU deterministically segfaults compiling (or
    deserializing the compile-cache entry for) this exact pippenger program
    when the process has already JIT-compiled the e2e-proof tests' programs
    — standalone, the same test always passes.  Isolating the process
    sidesteps the upstream bug without losing the coverage."""
    import os
    import subprocess
    import sys
    if not os.environ.get("HALO2_MSM_ADV_INNER"):
        env = dict(os.environ, HALO2_MSM_ADV_INNER="1")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x",
             f"{__file__}::test_msm_adversarial_distributions"],
            env=env, capture_output=True, text=True, timeout=1200,
            cwd=os.path.dirname(os.path.dirname(__file__)))
        assert r.returncode == 0, f"isolated run failed:\n{r.stdout}\n{r.stderr}"
        return
    from halo2_tpu.msm.msm import CachedMSM
    curve = VESTA
    rng = random.Random(5)
    n = 37                                      # not a multiple of block
    g_aff = (curve.gen_x, curve.gen_y)
    pts_aff = [py_mul(curve, g_aff, i + 1) for i in range(n)]
    enc_p = curve.from_affine_ints(pts_aff)

    same = rng.randrange(curve.Fr.p)
    for scalars in ([same] * n,                 # one bucket owns every run
                    [0] * n,                    # all-zero digits
                    [1] * n,
                    [rng.randrange(curve.Fr.p) for _ in range(n)]):
        enc_s = curve.Fr.encode_ints(scalars)
        slow = naive_msm(curve, enc_s, enc_p)
        fast = pippenger_msm(curve, enc_s, enc_p, c=8, block=16)
        assert bool(curve.eq(fast, slow))
        engine = CachedMSM(curve, enc_p, c=8, block=16)
        assert bool(curve.eq(engine(enc_s), slow))


def test_fused_ntt_matches_stage_ntt():
    """fused.FusedNTT (four-step split, the >=2^10 path) against the XLA
    stage-per-op NTT and a naive DFT spot check."""
    from halo2_tpu.fields import BN254_FR as F
    from halo2_tpu.ntt.fused import FusedNTT
    from halo2_tpu.ntt.ntt import NTT
    rng = random.Random(11)
    log_n = 10
    w = pow(F.root_of_unity, 1 << (F.S - log_n), F.p)
    fused = FusedNTT(F, log_n, w)
    ref = NTT(F, 9, pow(w, 2, F.p))             # independent small reference
    coeffs = [rng.randrange(F.p) for _ in range(1 << log_n)]
    a = F.encode_ints(coeffs)
    got = F.decode_ints(fused.forward(a))
    for i in (0, 1, 513):
        want = sum(c * pow(w, i * j, F.p) for j, c in enumerate(coeffs)) % F.p
        assert got[i] == want
    back = F.decode_ints(fused.inverse(fused.forward(a)))
    assert back == coeffs
    # batched
    b = jnp.stack([a, F.add(a, F.ones((1 << log_n,)))])
    gb = F.decode_ints(fused.forward(b))
    assert gb[: 1 << log_n] == got


@pytest.mark.slow
def test_pippenger_non_divisor_window():
    """Signed digits free c from the 16-bit limb constraint: odd widths must
    agree with naive (exercises cross-limb window extraction + carry)."""
    import random
    rng = random.Random(11)
    curve, F = VESTA, VESTA.Fr
    n = 48
    svals = [rng.randrange(F.p) for _ in range(n)]
    pvals = [rng.randrange(1, 10 ** 6) for _ in range(n)]
    G = curve.from_affine_ints([(curve.gen_x, curve.gen_y)])[0]
    pts = curve.scalar_mul(jnp.broadcast_to(G, (n, 3, 16)),
                           F.encode_ints(pvals))
    want = naive_msm(curve, F.encode_ints(svals), pts)
    for c in (5, 13):
        got = pippenger_msm(curve, F.encode_ints(svals), pts, c=c, block=8)
        assert bool(curve.eq(got, want)), f"c={c}"


# ----------------------------------------------------------------------
# host-side verifier MSM (msm/host_msm.py)
# ----------------------------------------------------------------------

def test_host_msm_matches_python_ground_truth():
    """host_msm (Jacobian Pippenger over python ints) vs naive py_mul/py_add
    for a mix of sizes, identities, zero scalars and duplicate points."""
    from halo2_tpu.msm.host_msm import host_msm
    rng = random.Random(21)
    for curve in (VESTA, BN254_G1):
        g = (curve.gen_x, curve.gen_y)
        for n in (0, 1, 2, 3, 17, 130):
            pts = [py_mul(curve, g, rng.randrange(1, 1000))
                   for _ in range(n)]
            scalars = [rng.randrange(curve.Fr.p) for _ in range(n)]
            if n >= 3:
                pts[1] = None                   # identity in the stream
                scalars[2] = 0                  # zero scalar
                pts[0] = pts[-1]                # duplicate point
            want = None
            for s, pt in zip(scalars, pts):
                want = py_add(curve, want, py_mul(curve, pt, s))
            got = host_msm(curve, scalars, pts)
            assert got == want, (curve.name, n)


# ----------------------------------------------------------------------
# engine descriptor cache (engine.py TpuMsmEngine)
# ----------------------------------------------------------------------

def test_engine_descriptor_cache_no_stale_id_hit():
    """The descriptor cache pins the bases array alive (strong ref), so a
    recycled id() can never serve a stale window table; a NEW bases array
    always builds a fresh descriptor with its own content (VERDICT r4 weak
    #7 regression test)."""
    import gc
    from halo2_tpu.engine import TpuMsmEngine
    curve = VESTA
    rng = random.Random(5)
    g_aff = (curve.gen_x, curve.gen_y)
    n = 16
    mk = lambda seed: curve.from_affine_ints(
        [py_mul(curve, g_aff, random.Random(seed).randrange(1, 500))
         for _ in range(n)])
    scalars = curve.Fr.encode_ints(
        [rng.randrange(curve.Fr.p) for _ in range(n)])

    engine = TpuMsmEngine(c=8, block=16)
    b1 = mk(1)
    d1 = engine.get_base_descriptor(curve, b1)
    assert engine.get_base_descriptor(curve, b1) is d1   # true cache hit
    # the cache must hold b1 itself so its id cannot be recycled
    assert any(entry[0] is b1 for entry in engine._cache.values())

    r1 = d1(scalars)
    old_id = id(b1)
    del b1, d1
    gc.collect()
    # allocate fresh arrays until one lands on the recycled id (usually
    # immediate); even then the engine must rebuild, not serve stale state
    b2 = mk(2)
    d2 = engine.get_base_descriptor(curve, b2)
    r2 = d2(scalars)
    want = naive_msm(curve, scalars, b2)
    assert bool(curve.eq(r2, want)), f"stale descriptor (id reuse={id(b2)==old_id})"
    assert not bool(curve.eq(r2, r1))


# ----------------------------------------------------------------------
# streaming scatter-bucket MSM (msm/stream_msm.py)
# ----------------------------------------------------------------------

def test_stream_msm_baked_and_unbaked_match_naive():
    """Gather-free streaming MSM (round-5 default fixed-base engine):
    baked shared-bucket and unbaked per-window+Horner variants vs naive,
    under adversarial distributions — identity points, zero scalars,
    equal scalars (single hot bucket), and n not a multiple of lanes."""
    from halo2_tpu.msm.stream_msm import (
        StreamMSM, bake_stream_table, msm_stream_baked,
        pack_base_stream_table, msm_stream_unbaked)
    curve = VESTA
    rng = random.Random(9)
    n = 21                      # not a multiple of lanes
    g_aff = (curve.gen_x, curve.gen_y)
    pts_aff = [py_mul(curve, g_aff, rng.randrange(1, 700))
               for _ in range(n)]
    pts_aff[4] = None
    scalars = [rng.randrange(curve.Fr.p) for _ in range(n)]
    scalars[0] = 0
    scalars[6] = scalars[7] = scalars[8] = 99999   # hot bucket
    enc_s = curve.Fr.encode_ints(scalars)
    enc_p = curve.from_affine_ints(pts_aff)
    want = naive_msm(curve, enc_s, enc_p)

    for c, lanes in ((5, 8), (6, 16)):
        tbl = bake_stream_table(curve, enc_p, c, lanes)
        got = msm_stream_baked(curve, enc_s, tbl, c, lanes)
        assert bool(curve.eq(got, want)), f"baked c={c}"
        tbl_u = pack_base_stream_table(curve, enc_p, lanes)
        got_u = msm_stream_unbaked(curve, enc_s, tbl_u, c, lanes)
        assert bool(curve.eq(got_u, want)), f"unbaked c={c}"

    # engine contract: auto-picks unbaked over the row threshold; short
    # columns zero-pad
    eng = StreamMSM(curve, enc_p, c=5, lanes=8, max_baked_rows=32)
    assert not eng.baked
    assert bool(curve.eq(eng(enc_s), want))
    short = curve.Fr.encode_ints(scalars[:10])
    want_short = naive_msm(curve, short, enc_p[:10])
    assert bool(curve.eq(eng(short), want_short))
