"""Multi-chip / multi-host scaling model for the prover's hot ops.

The reference never scales past one box (rayon shared memory,
halo2_middleware/src/multicore.rs); the TPU build scales via GSPMD meshes
(halo2_tpu/dist/).  Real pods are not available in this environment, so
this tool does what CAN be done honestly without them:

  1. ANALYTIC collective-bytes model: for each sharded op, count the wire
     bytes per chip per invocation from the op's decomposition (the numbers
     below come from reading dist/ntt.py, dist/msm.py, dist/scan.py — the
     all_to_all / all_gather calls are cited by line).
  2. HLO ANCHOR: compile the actual ShardedNTT on an 8-virtual-device CPU
     mesh and count the all-to-all ops in the optimized HLO, so the model's
     collective count is checked against the real compiled program rather
     than asserted.
  3. Predicted scaling efficiency at 8 chips (ICI) and 2x8 chips (DCN
     boundary, hybrid mesh from dist/multihost.py) using measured per-chip
     compute rates (BENCH micro stage) and public link bandwidths.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python tools/scaling_model.py [--json out.json]
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# ---------------------------------------------------------------------------
# Parameters (sources cited; override via env for other hardware)
# ---------------------------------------------------------------------------

WIRE_BYTES = 64          # field element on the wire: 16 uint32 limbs
                         # (halo2_tpu/fields/field.py:30-38)
ICI_BW = float(os.environ.get("ICI_GBPS", 45)) * 1e9
                         # v5e: 1 ICI link ~45 GB/s/dir (public v5e specs)
DCN_BW = float(os.environ.get("DCN_GBPS", 12.5)) * 1e9
                         # 100 Gbps NIC per host
NTT_RATE = float(os.environ.get("NTT_ELEMS_PER_S", 6.8e7))
                         # measured per-chip (BENCH_r03 micro, k=18 size)
MSM_RATE = float(os.environ.get("MSM_PTS_PER_S", 1.7e6))


def ntt_model(k: int, d: int, bw: float, hops: int = 3) -> dict:
    """Four-step NTT over a d-chip row-sharded (2^k, 16) array.

    dist/ntt.py:121,129,134 — THREE all_to_alls, each a full reshuffle of
    the local slab: per chip, (n/d)*WIRE_BYTES bytes leave, of which a
    (d-1)/d fraction crosses the wire (the 1/d diagonal block stays)."""
    n = 1 << k
    local = n // d
    wire_per_hop = local * WIRE_BYTES * (d - 1) / d
    t_comm = hops * wire_per_hop / bw
    t_comp = local / NTT_RATE
    t1 = n / NTT_RATE                       # single-chip time
    eff = t1 / (d * (t_comp + t_comm))
    return {"op": "ntt", "k": k, "d": d,
            "wire_bytes_per_chip": round(hops * wire_per_hop),
            "t_comp_ms": round(t_comp * 1e3, 3),
            "t_comm_ms": round(t_comm * 1e3, 3),
            "efficiency": round(eff, 3)}


def msm_model(k: int, d: int, bw: float) -> dict:
    """Descriptor-sharded MSM (dist/msm.py:49,96): each chip runs Pippenger
    on its row slab, then ONE all_gather of a (d, 3, 16)-u32 projective
    descriptor — 192 bytes per chip — and a local fold.  Communication is
    O(d) bytes regardless of n: MSM scaling is compute-limited."""
    n = 1 << k
    local = n // d
    wire = d * 192
    t_comm = wire / bw
    t_comp = local / MSM_RATE
    t1 = n / MSM_RATE
    eff = t1 / (d * (t_comp + t_comm))
    return {"op": "msm", "k": k, "d": d, "wire_bytes_per_chip": wire,
            "t_comp_ms": round(t_comp * 1e3, 3),
            "t_comm_ms": round(t_comm * 1e3, 3),
            "efficiency": round(eff, 3)}


def hybrid_ntt_model(k: int, hosts: int, chips: int) -> dict:
    """2-host hybrid mesh (dist/multihost.py:63-80): the row axis spans
    (hosts x chips); of each all_to_all's wire bytes, the fraction crossing
    the host boundary is (hosts-1)/hosts of the total reshuffle, paid at
    DCN bandwidth; the rest rides ICI.  DCN term dominates."""
    d = hosts * chips
    n = 1 << k
    local = n // d
    per_hop = local * WIRE_BYTES * (d - 1) / d
    dcn_frac = (hosts - 1) / hosts
    t_comm = 3 * per_hop * (dcn_frac / DCN_BW + (1 - dcn_frac) / ICI_BW)
    t_comp = local / NTT_RATE
    t1 = n / NTT_RATE
    eff = t1 / (d * (t_comp + t_comm))
    return {"op": "ntt-2host", "k": k, "d": d,
            "dcn_bytes_per_chip": round(3 * per_hop * dcn_frac),
            "t_comp_ms": round(t_comp * 1e3, 3),
            "t_comm_ms": round(t_comm * 1e3, 3),
            "efficiency": round(eff, 3)}


def prover_mix(k: int, hosts: int, chips: int,
               msm_weight: float = 0.60, ntt_weight: float = 0.37,
               serial_weight: float = 0.03) -> dict:
    """Whole-prover scaling at (hosts x chips): weight the per-op
    efficiencies by the measured step-table split (BENCH e2e steps_s —
    commit phases are MSM-bound, domain transforms NTT-bound, transcript
    hashing + challenge squeezing is serial Amdahl residue)."""
    d = hosts * chips
    ntt = (hybrid_ntt_model(k, hosts, chips) if hosts > 1
           else ntt_model(k, d, ICI_BW))
    msm = msm_model(k, d, ICI_BW if hosts == 1 else DCN_BW)
    inv_eff = (msm_weight / msm["efficiency"]
               + ntt_weight / ntt["efficiency"]
               + serial_weight * d)       # serial part doesn't scale
    eff = 1.0 / inv_eff
    return {"op": "prover-mix", "k": k, "d": d, "hosts": hosts,
            "weights": {"msm": msm_weight, "ntt": ntt_weight,
                        "serial": serial_weight},
            "efficiency": round(eff, 3)}


def hlo_anchor(k: int = 10, d: int = 8) -> dict:
    """Compile the REAL ShardedNTT on a d-virtual-device mesh and count
    all-to-all ops in the optimized HLO.  Checks the model's hop count
    against the compiled program."""
    # env var alone is NOT enough: this environment's sitecustomize pins a
    # remote-TPU platform; the config update must win before backend init
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < d:
        return {"skipped": f"only {len(jax.devices())} devices"}
    from halo2_tpu.dist import make_mesh
    from halo2_tpu.dist.ntt import ShardedNTT
    from halo2_tpu.fields import PASTA_FP as F

    mesh = make_mesh(d)
    sntt = ShardedNTT(mesh, F, k)
    x = F.ones((1 << k,))
    lowered = jax.jit(sntt.forward).lower(x)
    hlo = lowered.compile().as_text()
    # count DEFINITION sites only: tuple-form ops read
    #   %all-to-all.N = (u32[...], ...) all-to-all(...)
    # and are then referenced by 8 get-tuple-elements each — a raw
    # substring count inflates 3 ops to ~30 mentions.
    import re
    n_a2a = len(re.findall(r"%all-to-all[.\d]* = ", hlo))
    return {"k": k, "d": d, "all_to_all_ops_in_hlo": n_a2a}


def main():
    rows = []
    for k in (18, 20, 22):
        for d in (2, 4, 8):
            rows.append(ntt_model(k, d, ICI_BW))
        rows.append(msm_model(k, 8, ICI_BW))
        rows.append(hybrid_ntt_model(k, hosts=2, chips=8))
        rows.append(prover_mix(k, hosts=1, chips=8))
        rows.append(prover_mix(k, hosts=2, chips=8))
    anchor = hlo_anchor()
    out = {"params": {"wire_bytes": WIRE_BYTES, "ici_gbps": ICI_BW / 1e9,
                      "dcn_gbps": DCN_BW / 1e9,
                      "ntt_rate": NTT_RATE, "msm_rate": MSM_RATE},
           "model": rows, "hlo_anchor": anchor}
    hdr = f"{'op':10s} {'k':>3s} {'d':>3s} {'wire/chip':>12s} " \
          f"{'comp ms':>9s} {'comm ms':>9s} {'eff':>6s}"
    print(hdr)
    for r in rows:
        wire = r.get("wire_bytes_per_chip", r.get("dcn_bytes_per_chip", 0))
        print(f"{r['op']:10s} {r['k']:3d} {r['d']:3d} {wire:12,d} "
              f"{r.get('t_comp_ms', 0):9.3f} {r.get('t_comm_ms', 0):9.3f} "
              f"{r['efficiency']:6.3f}")
    print(f"hlo anchor: {anchor}")
    if "--json" in sys.argv:
        path = sys.argv[sys.argv.index("--json") + 1]
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
