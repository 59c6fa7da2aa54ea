"""Child for test_multihost: one of N processes in a jax.distributed CPU
cluster.  Runs the sharded four-step NTT (dist/ntt.py ShardedNTT) over the
GLOBAL 2-host x 4-device mesh and writes the full transformed vector (as
hex ints) from process 0.

Usage: python _multihost_child.py <process_id> <num_processes> <port> <k> <out> [hybrid]

With the optional "hybrid" arg the NTT runs over the 2-D (hosts, rows)
mesh from dist/multihost.py hybrid_mesh — the multi-host axis layout
whose all-to-alls run over the combined axis tuple (VERDICT r4 #3).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "device_count" not in f]
flags.append("--xla_force_host_platform_device_count=4")
os.environ["XLA_FLAGS"] = " ".join(flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/halo2_tpu/xla_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port, k, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                     sys.argv[3], int(sys.argv[4]),
                                     sys.argv[5])
    from halo2_tpu.dist.multihost import (
        init_multihost, global_mesh, hybrid_mesh, put_row_sharded,
        allgather_rows)
    init_multihost(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc * 4, "global mesh must span processes"

    import random
    import numpy as np
    from halo2_tpu.fields import BN254_FR as F
    from halo2_tpu.dist.ntt import ShardedNTT

    use_hybrid = len(sys.argv) > 6 and sys.argv[6] == "hybrid"
    mesh = hybrid_mesh() if use_hybrid else global_mesh()
    ntt = ShardedNTT(mesh, F, k)
    coeffs = F.rand_ints(1 << k, random.Random(77))
    a_host = np.asarray(F.encode_ints(coeffs))
    if use_hybrid:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(mesh, P(tuple(mesh.axis_names), None))
        a = jax.make_array_from_callback(
            a_host.shape, sharding, lambda idx: a_host[idx])
    else:
        a = put_row_sharded(mesh, a_host)
    # ShardedNTT.forward reshapes (n, L) -> (n1, n2, L); feed pre-shaped
    out = ntt._fwd(a.reshape(ntt.n1, ntt.n2, -1), ntt.tw_f)
    back = ntt._inv(out.reshape(ntt.n1, ntt.n2, -1), ntt.tw_i)
    full = allgather_rows(out)
    full_back = allgather_rows(back)
    if pid == 0:
        got = F.decode_ints(full)
        roundtrip = F.decode_ints(full_back)
        assert roundtrip == coeffs, "multihost NTT roundtrip failed"
        with open(out_path, "w") as f:
            f.write("\n".join(format(v, "x") for v in got))
    # all processes must stay alive until collectives complete
    jax.effects_barrier()


if __name__ == "__main__":
    main()
