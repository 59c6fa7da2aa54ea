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
     mesh (1-D and 2-D hybrid) and count the all-to-all ops in the
     optimized HLO, so the model's collective count is checked against the
     real compiled program rather than asserted.
  3. Predicted scaling efficiency under TWO network profiles:
       - "v5p-ici": the BASELINE target config (2-host v5p slice).  v5p
         hosts within a pod are connected by the pod's ICI torus (public
         v5p spec: 4800 Gbps/chip aggregate ICI; DCN is only crossed
         between pods), so cross-host hops run at ICI rates.
       - "nic-dcn": NIC-connected hosts (v5e-style, one 100 Gbps NIC per
         host shared by all its chips).  Round-4 ADVICE: the host's
         AGGREGATE egress must be charged to the NIC, and the remote
         fraction of an all_to_all is chips*(hosts-1)/d of each chip's
         slab — the r4 model undercounted both, publishing 0.60 where the
         honest number is ~0.26.  This file is the corrected model.

A blocked-natural-order four-step NTT needs THREE global exchanges
(one-exchange variants require cyclic input/output layouts the prover's
natural-order polynomial contract does not use), so over a NIC the
distributed-single-NTT efficiency is honestly poor; the v5p/ICI profile is
the configuration the >=0.7 BASELINE target describes.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python tools/scaling_model.py [--json out.json]
"""

from __future__ import annotations

import json
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
V5P_ICI_BW = float(os.environ.get("V5P_ICI_GBPS", 90)) * 1e9
                         # v5p: 4800 Gbps/chip aggregate over 6 3D-torus
                         # links ~= 100 GB/s/link/dir; 90 is conservative
DCN_BW = float(os.environ.get("DCN_GBPS", 12.5)) * 1e9
                         # one 100 Gbps NIC PER HOST (shared by its chips)
NTT_RATE_K18 = float(os.environ.get("NTT_ELEMS_PER_S", 1.356e8))
                         # measured per-chip at k=18 (BENCH_r04 micro)
MSM_RATE = float(os.environ.get("MSM_PTS_PER_S", 2.1e6))


def ntt_rate(k: int) -> float:
    """NTT work is O(n log n): scale the measured k=18 per-element rate by
    18/k (round-4 ADVICE low #4 — the r4 model held it constant)."""
    return NTT_RATE_K18 * 18.0 / k


def ntt_model(k: int, d: int, bw: float, hops: int = 3) -> dict:
    """Four-step NTT over a d-chip row-sharded (2^k, 16) array, all hops
    at per-chip bandwidth `bw` (single-host ICI, or v5p cross-host ICI).

    dist/ntt.py:141,149,155 — THREE all_to_alls, each a full reshuffle of
    the local slab: per chip, (n/d)*WIRE_BYTES bytes leave, of which a
    (d-1)/d fraction crosses the wire (the 1/d diagonal block stays)."""
    n = 1 << k
    local = n // d
    wire_per_hop = local * WIRE_BYTES * (d - 1) / d
    t_comm = hops * wire_per_hop / bw
    t_comp = local / ntt_rate(k)
    t1 = n / ntt_rate(k)                    # single-chip time
    eff = t1 / (d * (t_comp + t_comm))
    return {"op": "ntt", "k": k, "d": d,
            "wire_bytes_per_chip": round(hops * wire_per_hop),
            "t_comp_ms": round(t_comp * 1e3, 3),
            "t_comm_ms": round(t_comm * 1e3, 3),
            "efficiency": round(eff, 3)}


def msm_model(k: int, d: int, bw: float) -> dict:
    """Descriptor-sharded MSM (dist/msm.py:49,96): each chip runs the
    bucket kernel on its row slab, then ONE all_gather of a (3, 16)-u32
    projective partial — each chip SENDS 192 bytes and receives d*192
    (round-4 ADVICE low #3: the r4 model labeled the gathered total as the
    per-chip send).  Communication is O(d) bytes regardless of n: MSM
    scaling is compute-limited."""
    n = 1 << k
    local = n // d
    send = 192
    gathered = d * 192
    t_comm = gathered / bw
    t_comp = local / MSM_RATE
    t1 = n / MSM_RATE
    eff = t1 / (d * (t_comp + t_comm))
    return {"op": "msm", "k": k, "d": d, "send_bytes_per_chip": send,
            "gathered_bytes": gathered,
            "t_comp_ms": round(t_comp * 1e3, 3),
            "t_comm_ms": round(t_comm * 1e3, 3),
            "efficiency": round(eff, 3)}


def hybrid_ntt_model(k: int, hosts: int, chips: int,
                     profile: str = "nic-dcn") -> dict:
    """Multi-host four-step NTT on the (hosts, chips) hybrid mesh
    (dist/multihost.py:63-80, dist/ntt.py multi-axis all_to_alls).

    Per all_to_all, each chip sends local/d of its slab to every peer:
      - remote peers: chips*(hosts-1) of the d-1 -> DCN bytes per chip =
        local*WIRE*chips*(hosts-1)/d   (ADVICE low #2 fraction fix)
      - local peers: (chips-1)         -> ICI bytes per chip =
        local*WIRE*(chips-1)/d
    NIC profile: the host NIC carries the AGGREGATE egress of all its
    chips (ADVICE medium fix): t_dcn = chips * per_chip_dcn / DCN_BW.
    v5p profile: cross-host hops ride the pod ICI torus at V5P_ICI_BW."""
    d = hosts * chips
    n = 1 << k
    local = n // d
    per_chip_dcn = local * WIRE_BYTES * chips * (hosts - 1) / d
    per_chip_ici = local * WIRE_BYTES * (chips - 1) / d
    if profile == "v5p-ici":
        t_hop = (per_chip_dcn / V5P_ICI_BW) + (per_chip_ici / ICI_BW)
    else:
        t_hop = (chips * per_chip_dcn / DCN_BW) + (per_chip_ici / ICI_BW)
    t_comm = 3 * t_hop
    t_comp = local / ntt_rate(k)
    t1 = n / ntt_rate(k)
    eff = t1 / (d * (t_comp + t_comm))
    return {"op": f"ntt-2host[{profile}]", "k": k, "d": d,
            "dcn_bytes_per_chip_per_hop": round(per_chip_dcn),
            "host_nic_bytes_per_hop": round(chips * per_chip_dcn),
            "t_comp_ms": round(t_comp * 1e3, 3),
            "t_comm_ms": round(t_comm * 1e3, 3),
            "efficiency": round(eff, 3)}


def prover_weights(k: int) -> tuple:
    """Step-table split extrapolated to size 2^k.  Measured at k=20
    (BENCH_r04 e2e20, 43.3 s): ~60% MSM-bound commits, ~37% NTT/elementwise
    domain work, ~1.3 s serial residue (transcript hashing, challenge
    squeezing, host glue).  The serial part is size-INDEPENDENT (it scales
    with commitment count, not n), so its weight shrinks as n log n grows;
    compute weights renormalize accordingly."""
    base_total = 43.3
    serial_s = 1.3
    scale = ((1 << k) * k) / ((1 << 20) * 20)
    total = (base_total - serial_s) * scale + serial_s
    serial_w = serial_s / total
    msm_w = 0.62 * (1 - serial_w)
    ntt_w = 0.38 * (1 - serial_w)
    return msm_w, ntt_w, serial_w


def prover_mix(k: int, hosts: int, chips: int,
               profile: str = "nic-dcn") -> dict:
    """Whole-prover scaling at (hosts x chips): weight the per-op
    efficiencies by the measured step-table split; the serial residue is
    the Amdahl term (it occupies every chip for its wall time)."""
    d = hosts * chips
    msm_w, ntt_w, serial_w = prover_weights(k)
    if hosts > 1:
        ntt = hybrid_ntt_model(k, hosts, chips, profile)
        msm_bw = V5P_ICI_BW if profile == "v5p-ici" else DCN_BW
    else:
        ntt = ntt_model(k, d, ICI_BW)
        msm_bw = ICI_BW
    msm = msm_model(k, d, msm_bw)
    inv_eff = (msm_w / msm["efficiency"]
               + ntt_w / ntt["efficiency"]
               + serial_w * d)             # serial part doesn't scale
    eff = 1.0 / inv_eff
    return {"op": f"prover-mix[{profile if hosts > 1 else 'ici'}]",
            "k": k, "d": d, "hosts": hosts,
            "weights": {"msm": round(msm_w, 3), "ntt": round(ntt_w, 3),
                        "serial": round(serial_w, 4)},
            "efficiency": round(eff, 3)}


def hlo_anchor(k: int = 10, d: int = 8) -> dict:
    """Compile the REAL ShardedNTT on d virtual devices — both the 1-D
    mesh and the 2-D (hosts, rows) hybrid mesh — and count all-to-all ops
    in the optimized HLO.  Checks the model's hop count against the
    compiled program."""
    # env var alone is NOT enough: this environment's sitecustomize pins a
    # remote-TPU platform; the config update must win before backend init
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < d:
        return {"skipped": f"only {len(jax.devices())} devices"}
    import re

    import numpy as np
    from jax.sharding import Mesh

    from halo2_tpu.dist import make_mesh
    from halo2_tpu.dist.ntt import ShardedNTT
    from halo2_tpu.fields import PASTA_FP as F

    def count_a2a(mesh):
        sntt = ShardedNTT(mesh, F, k)
        x = F.ones((1 << k,))
        hlo = jax.jit(sntt.forward).lower(x).compile().as_text()
        # count DEFINITION sites only: tuple-form ops read
        #   %all-to-all.N = (u32[...], ...) all-to-all(...)
        # and are then referenced by d get-tuple-elements each — a raw
        # substring count inflates 3 ops to ~30 mentions.
        return len(re.findall(r"%all-to-all[.\d]* = ", hlo))

    flat = count_a2a(make_mesh(d))
    hybrid = count_a2a(Mesh(np.array(jax.devices()[:d]).reshape(2, d // 2),
                            ("hosts", "rows")))
    return {"k": k, "d": d, "all_to_all_ops_in_hlo": flat,
            "all_to_all_ops_in_hlo_hybrid_mesh": hybrid}


def main():
    rows = []
    for k in (18, 20, 22):
        for d in (2, 4, 8):
            rows.append(ntt_model(k, d, ICI_BW))
        rows.append(msm_model(k, 8, ICI_BW))
        rows.append(hybrid_ntt_model(k, 2, 8, "v5p-ici"))
        rows.append(hybrid_ntt_model(k, 2, 8, "nic-dcn"))
        rows.append(prover_mix(k, 1, 8))
        rows.append(prover_mix(k, 2, 8, "v5p-ici"))
        rows.append(prover_mix(k, 2, 8, "nic-dcn"))
    anchor = hlo_anchor()
    out = {"params": {"wire_bytes": WIRE_BYTES, "ici_gbps": ICI_BW / 1e9,
                      "v5p_ici_gbps": V5P_ICI_BW / 1e9,
                      "dcn_gbps_per_host_nic": DCN_BW / 1e9,
                      "ntt_rate_k18": NTT_RATE_K18, "msm_rate": MSM_RATE},
           "model": rows, "hlo_anchor": anchor,
           "notes": [
               "v5p-ici is the BASELINE >=0.7 target config (2-host v5p "
               "slice; cross-host hops ride the pod ICI torus).",
               "nic-dcn is the honest NIC-host number after the round-4 "
               "ADVICE corrections (host-aggregate egress charged to the "
               "NIC; remote fraction chips*(hosts-1)/d): a single NTT "
               "sharded across 100 Gbps-NIC hosts is bandwidth-starved "
               "~26x, so NIC-class deployments should replicate NTTs "
               "per host and cross hosts only for MSM partials.",
           ]}
    hdr = f"{'op':22s} {'k':>3s} {'d':>3s} {'comp ms':>9s} " \
          f"{'comm ms':>9s} {'eff':>6s}"
    print(hdr)
    for r in rows:
        print(f"{r['op']:22s} {r['k']:3d} {r['d']:3d} "
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
