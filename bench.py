"""Headline benchmark: MSM throughput (the prover's dominant kernel).

Prints ONE JSON line:
  {"metric": "msm_points_per_sec", "value": N, "unit": "points/s",
   "vs_baseline": R}

vs_baseline compares against 1e6 points/s — the ballpark of the reference's
rayon `best_multiexp` (halo2curves Pippenger) for 2^16 BN254 points on a
multicore x86 host (the repo publishes no absolute numbers; see BASELINE.md).
Secondary timings (NTT) go to stderr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

BASELINE_POINTS_PER_SEC = 1e6


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    from halo2_tpu.curves import BN254_G1 as curve
    from halo2_tpu.fields import BN254_FR
    from halo2_tpu.msm import pippenger_msm
    from halo2_tpu.ntt import get_ntt

    log("devices:", jax.devices())
    F = curve.Fr

    # ---- MSM: n = 2^16 random-ish points (distinct multiples of G)
    k = 16
    n = 1 << k
    log(f"building {n} points ...")
    base = curve.from_affine_ints([(curve.gen_x, curve.gen_y)])[0]
    pts = jnp.broadcast_to(base, (n, 3, 16))
    # derive distinct points cheaply: P_i = [i+1]G via doubling ladder on
    # index bits (vectorized scalar_mul with i as scalar)
    idx = jnp.arange(1, n + 1, dtype=jnp.uint32)
    scalars_small = jnp.zeros((n, 16), jnp.uint32).at[:, 0].set(idx & 0xFFFF)
    scalars_small = scalars_small.at[:, 1].set(idx >> 16)
    scalars_small_mont = F.to_mont(scalars_small)
    t0 = time.time()
    pts = curve.scalar_mul(pts, scalars_small_mont)
    jax.block_until_ready(pts)
    log(f"point gen: {time.time()-t0:.1f}s")

    # pseudo-random full-width scalars from a cheap LCG in limb space
    key = jax.random.PRNGKey(0)
    limbs = jax.random.randint(key, (n, 16), 0, 1 << 16, dtype=jnp.int32)
    scalars = F.to_mont(limbs.astype(jnp.uint32))

    c, block = 8, 256
    t0 = time.time()
    out = pippenger_msm(curve, scalars, pts, c, block)
    jax.block_until_ready(out)
    log(f"msm compile+first run: {time.time()-t0:.1f}s")

    runs = 3
    t0 = time.time()
    for _ in range(runs):
        out = pippenger_msm(curve, scalars, pts, c, block)
    jax.block_until_ready(out)
    msm_time = (time.time() - t0) / runs
    pps = n / msm_time
    log(f"msm: {msm_time*1e3:.1f} ms for 2^{k} points -> {pps:,.0f} points/s")

    # ---- NTT secondary metric
    ntt_k = 18
    ntt = get_ntt(F, ntt_k)
    a = F.ones((1 << ntt_k,))
    t0 = time.time()
    out = ntt.forward(a)
    jax.block_until_ready(out)
    log(f"ntt compile+first: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(runs):
        out = ntt.forward(out)
    jax.block_until_ready(out)
    ntt_time = (time.time() - t0) / runs
    log(f"ntt 2^{ntt_k}: {ntt_time*1e3:.1f} ms -> "
        f"{(1 << ntt_k) / ntt_time:,.0f} elems/s")

    print(json.dumps({
        "metric": "msm_points_per_sec",
        "value": round(pps),
        "unit": "points/s",
        "vs_baseline": round(pps / BASELINE_POINTS_PER_SEC, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
