"""Per-component MSM wall-time breakdown on the live device.

The cached fixed-base MSM (msm_windowed_cached) is sort -> gather -> scan
-> tails -> weighted fold.  This tool times each component in isolation
(chained on-device so elapsed >> tunnel rtt) to show where the cycles go —
the evidence behind the roofline-fraction analysis in docs/msm.md.

Usage: python tools/msm_profile.py [k]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    # fetch ONE element: force completion without pulling the whole array
    # through the remote-device tunnel (a full (nw, n) fetch is ~20MB,
    # which would swamp sub-100ms timings)
    return np.asarray(x.reshape(-1)[:1])


def timed(name, fn, *args, reps=5, rtt=0.03):
    out = fn(*args)
    _fetch(jax.tree_util.tree_leaves(out)[0])          # compile + first
    while True:
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _fetch(jax.tree_util.tree_leaves(out)[0])
        el = time.time() - t0
        if el > max(0.5, 10 * rtt):
            break
        reps *= 4
    per = (el - rtt) / reps
    print(f"{name:28s} {per*1e3:9.2f} ms   ({reps} reps, {el:.2f}s)")
    return out, per


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/halo2_tpu/xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from halo2_tpu.curves import BN254_G1 as curve
    from halo2_tpu.msm.msm import CachedMSM, auto_c
    from halo2_tpu.msm import bucket_scan as bs

    F = curve.Fr
    n = 1 << k
    pts_cache = os.path.expanduser(f"~/.cache/halo2_tpu/bench-points-{k}.npy")
    if os.path.exists(pts_cache):
        pts = jnp.asarray(np.load(pts_cache))
    else:
        print("no cached points; run bench.py --stage micro first",
              file=sys.stderr)
        raise SystemExit(1)

    print(f"k={k} n={n} devices={jax.devices()}")
    t0 = time.time()
    engine = CachedMSM(curve, pts)
    _fetch(engine.rows[:1, :1])
    c = engine.c
    nw = engine.n_windows
    print(f"base-row pack: {time.time()-t0:.1f}s  c={c} nw={nw} "
          f"chunks={len(engine.bounds)} pad={engine.rows.shape[1]}")

    scal = F.to_mont(jax.random.randint(
        jax.random.PRNGKey(7), (n, 16), 0, 1 << 16,
        dtype=jnp.int32).astype(jnp.uint32))
    _fetch(scal[0])

    rows = engine.rows
    M = engine.n * nw

    # full pipeline
    _, t_full = timed("full cached MSM", engine, scal, reps=3)

    # 1. digit decomposition
    def dig(s):
        pk = bs.packed_digits(curve, s, c)
        nb_ = (1 << (c - 1)) + 1
        return (((pk >> 1) + jnp.arange(nw, dtype=jnp.int32)[:, None] * nb_)
                * 2 + (pk & 1))
    digits_fn = jax.jit(dig)
    (packed,), t_dig = timed("packed_digits+tag",
                             lambda s: (digits_fn(s),), scal)
    flat_keys = packed.reshape(-1)

    # 2. key sort (+iota permutation)
    sortf = jax.jit(lambda x: bs.sort_perm(x))
    (keys_s, perm), t_sort = timed("sort_perm (keys+iota)", sortf, flat_keys)

    # 3. row gather by permutation mod n (rows passed as an ARGUMENT: a
    # closed-over table would be captured as a jit constant and shipped
    # inside the HLO to the remote compiler)
    n_base = engine.n
    gat = jax.jit(lambda r, p: jnp.take(r, p % n_base, axis=0))
    rows_s, t_gather = timed("row gather", gat, rows, perm)

    # 4. segmented scan to bucket sums (includes tails + all levels)
    xy, inf_s = bs.unpack_affine_rows(rows_s)
    nb = (1 << (c - 1)) + 1
    bsum = jax.jit(lambda ks, a, b: bs.bucket_sums(
        curve, ks, a, b, nw * nb, engine.block, packed=True))
    buckets, t_scan = timed("bucket_sums (scan+tails)", bsum, keys_s, xy,
                            inf_s, reps=3)

    # 5. per-window weighted folds + Horner doublings
    import numpy as _np
    from halo2_tpu.fields.field import NLIMBS as _L

    def fold_all(b):
        per = jax.vmap(lambda x: bs.weighted_bucket_fold(curve, x))(
            b.reshape(nw, nb, 3, _L))
        def horner(i, acc):
            for _ in range(c):
                acc = curve.double(acc)
            return curve.add(acc, per[nw - 1 - i])
        return jax.lax.fori_loop(0, nw, horner, curve.identity(()))
    wf = jax.jit(fold_all)
    _, t_fold = timed("per-window folds + horner", wf, buckets)

    parts = t_dig + t_sort + t_gather + t_scan + t_fold
    print(f"{'sum of parts':28s} {parts*1e3:9.2f} ms  "
          f"(full {t_full*1e3:.2f} ms)")
    print(f"points/s (full): {n/t_full:,.0f}")


if __name__ == "__main__":
    main()
