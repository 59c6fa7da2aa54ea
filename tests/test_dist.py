"""Multi-chip collective paths on the 8-device virtual CPU mesh
(SURVEY.md §4.3: the analog of the reference's no-cluster-needed property).
Each sharded primitive must agree exactly with its single-chip twin.
"""

import random

import jax
import jax.numpy as jnp
import pytest

from halo2_tpu.dist import make_mesh, ROW_AXIS
from halo2_tpu.dist.msm import sharded_msm, ShardedCachedMSM
from halo2_tpu.dist.ntt import ShardedNTT
from halo2_tpu.dist.scan import sharded_prefix_product
from halo2_tpu.fields import BN254_FR, PASTA_FP
from halo2_tpu.curves import VESTA, BN254_G1
from halo2_tpu.msm import naive_msm
from halo2_tpu.ntt import get_ntt
from halo2_tpu.poly.arith import prefix_product

from tests.test_curves_msm import py_mul


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


def test_sharded_ntt_matches_single_chip(mesh):
    F = PASTA_FP
    log_n = 10
    n = 1 << log_n
    rng = random.Random(3)
    coeffs = F.rand_ints(n, rng)
    a = F.encode_ints(coeffs)
    single = get_ntt(F, log_n)
    dist = ShardedNTT(mesh, F, log_n)
    got = F.decode_ints(dist.forward(a))
    want = F.decode_ints(single.forward(a))
    assert got == want


def test_sharded_ntt_roundtrip_and_inverse(mesh):
    F = BN254_FR
    log_n = 12
    n = 1 << log_n
    rng = random.Random(4)
    coeffs = F.rand_ints(n, rng)
    a = F.encode_ints(coeffs)
    dist = ShardedNTT(mesh, F, log_n)
    back = F.decode_ints(dist.inverse(dist.forward(a)))
    assert back == coeffs
    # inverse alone matches the single-chip inverse
    single = get_ntt(F, log_n)
    assert F.decode_ints(dist.inverse(a)) == F.decode_ints(single.inverse(a))


def test_sharded_msm_matches_naive(mesh):
    curve = VESTA
    rng = random.Random(11)
    n = 64
    g_aff = (curve.gen_x, curve.gen_y)
    pts_aff = [py_mul(curve, g_aff, rng.randrange(1, 500)) for _ in range(n)]
    pts_aff[9] = None                       # identity point in the stream
    scalars = [rng.randrange(curve.Fr.p) for _ in range(n)]
    scalars[3] = 0
    enc_s = curve.Fr.encode_ints(scalars)
    enc_p = curve.from_affine_ints(pts_aff)
    got = sharded_msm(mesh, curve, enc_s, enc_p, c=4, block=8)
    want = naive_msm(curve, enc_s, enc_p)
    assert bool(curve.eq(got, want))


def test_sharded_cached_msm_matches_naive(mesh):
    curve = BN254_G1
    rng = random.Random(12)
    n = 32
    g_aff = (curve.gen_x, curve.gen_y)
    pts_aff = [py_mul(curve, g_aff, rng.randrange(1, 300)) for _ in range(n)]
    scalars = [rng.randrange(curve.Fr.p) for _ in range(n)]
    enc_s = curve.Fr.encode_ints(scalars)
    enc_p = curve.from_affine_ints(pts_aff)
    engine = ShardedCachedMSM(mesh, curve, enc_p, c=8, block=8)
    got = engine(enc_s)
    want = naive_msm(curve, enc_s, enc_p)
    assert bool(curve.eq(got, want))


def test_sharded_prefix_product(mesh):
    F = BN254_FR
    rng = random.Random(5)
    n = 1 << 10
    vals = F.rand_ints(n, rng)
    a = F.encode_ints(vals)
    got = F.decode_ints(sharded_prefix_product(mesh, F, a))
    want = F.decode_ints(prefix_product(F, a))
    assert got == want


# ----------------------------------------------------------------------
# the real prover on the mesh (VERDICT round-1 item 2)
# ----------------------------------------------------------------------

@pytest.mark.slow
def test_full_prover_on_mesh_bit_identical(tmp_path):
    """`create_proof` with a meshed PlonkEngine (sharded descriptor MSMs,
    distributed NTT transforms, sharded grand-product scans) must produce
    BIT-IDENTICAL proof bytes to the single-chip path, and verify.

    The mesh child runs with the fused-NTT threshold lowered so every
    ShardedNTT local transform goes through the FUSED four-step path
    (round-3 VERDICT item 8) while the single-chip child stays on the
    default plain path — bit-identity across the two pipelines is the
    strongest equivalence check we have.

    Each mode runs in its own subprocess (tests/_dist_prover_child.py):
    XLA:CPU segfaults deterministically once one process accumulates the
    JIT executables of BOTH the single-chip and meshed provers (round-2
    VERDICT weak #6; same executable-accumulation issue conftest.py
    documents)."""
    import os
    import subprocess
    import sys

    K = 6  # smallest k whose base/extended four-step splits fit 8 devices
    child = os.path.join(os.path.dirname(__file__), "_dist_prover_child.py")
    outs = {}
    for mode in ("single", "mesh"):
        out = tmp_path / f"{mode}.txt"
        env = dict(os.environ)
        if mode == "mesh":
            env["HALO2_TPU_FUSED_NTT_MIN_LOGN"] = "3"
        proc = subprocess.run(
            [sys.executable, child, mode, str(K), str(out)],
            capture_output=True, timeout=1200, env=env)
        assert proc.returncode == 0, \
            f"{mode} child failed:\n{proc.stderr.decode()[-2000:]}"
        outs[mode] = out.read_text().splitlines()

    vk1, proof1 = outs["single"]
    vk2, proof2 = outs["mesh"]
    assert vk2 == vk1, "meshed keygen diverged from single-chip vk"
    assert proof2 == proof1, "meshed prover diverged from single-chip bytes"


def test_sharded_ntt_on_hybrid_mesh_bit_identical(mesh):
    """ShardedNTT over a 2-D (hosts, rows) hybrid mesh (the multi-host
    axis layout, dist/multihost.py:63) must be bit-identical to both the
    single-chip NTT and the 1-D-mesh ShardedNTT — the all-to-alls run
    over the combined axis tuple (VERDICT r4 #3)."""
    import numpy as np
    from jax.sharding import Mesh

    F = PASTA_FP
    log_n = 10
    rng = random.Random(17)
    a = F.encode_ints(F.rand_ints(1 << log_n, rng))
    want = F.decode_ints(get_ntt(F, log_n).forward(a))

    hybrid = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                  ("hosts", ROW_AXIS))
    dist = ShardedNTT(hybrid, F, log_n)
    got = F.decode_ints(dist.forward(a))
    assert got == want
    back = F.decode_ints(dist.inverse(dist.forward(a)))
    assert back == F.decode_ints(a)
