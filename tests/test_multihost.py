"""Multi-host (multi-process) collectives — SURVEY §5.8 jax.distributed.

Two OS processes x 4 virtual CPU devices form one 8-device global mesh
(the DCN-analog of a 2-host TPU slice; same no-cluster-needed property as
the 8-device virtual mesh, SURVEY §4.3 item 4).  The sharded four-step
NTT must produce bit-identical output to the single-process NTT.
"""

import os
import random
import subprocess
import sys


def _run_multihost(tmp_path, mode, port):
    child = os.path.join(os.path.dirname(__file__), "_multihost_child.py")
    K = 10
    out = tmp_path / f"mh-{mode or 'flat'}.txt"
    extra = [mode] if mode else []
    procs = [subprocess.Popen(
        [sys.executable, child, str(i), "2", port, str(K), str(out)]
        + extra,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)]
    for p in procs:
        _, err = p.communicate(timeout=900)
        assert p.returncode == 0, err.decode()[-2000:]

    got = [int(line, 16) for line in out.read_text().splitlines()]

    # single-process ground truth
    from halo2_tpu.fields import BN254_FR as F
    from halo2_tpu.ntt import get_ntt
    coeffs = F.rand_ints(1 << K, random.Random(77))
    want = F.decode_ints(get_ntt(F, K).forward(F.encode_ints(coeffs)))
    assert got == want, "multihost NTT diverged from single-process NTT"


def test_sharded_ntt_across_two_processes(tmp_path):
    _run_multihost(tmp_path, None, "29417")


def test_sharded_ntt_across_two_processes_hybrid_mesh(tmp_path):
    """Same 2-process cluster, but the NTT shards over the 2-D
    (hosts, rows) hybrid mesh — the real multi-host axis layout
    (VERDICT r4 #3): bit-identity with the single-process NTT."""
    _run_multihost(tmp_path, "hybrid", "29431")
