"""Correctness + timing probe for the streaming scatter-bucket MSM kernel
on real TPU hardware."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    return np.asarray(x)


def main():
    print("devices:", jax.devices(), flush=True)
    from halo2_tpu.curves import BN254_G1 as curve
    from halo2_tpu.msm.msm import CachedMSM
    from halo2_tpu.msm.stream_msm import (bake_stream_table,
                                          msm_stream_baked)
    F = curve.Fr

    # --- correctness vs the sorted pipeline at k=12 ----------------------
    k = 12
    n = 1 << k

    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def gen_points(n):
        pts = jnp.broadcast_to(
            curve.from_affine_ints([(curve.gen_x, curve.gen_y)])[0],
            (n, 3, 16))
        rows = jnp.arange(n)
        ident = curve.identity((n,))

        def round_(r, x):
            d = jnp.int32(1) << r
            prev = jnp.where((rows >= d)[:, None, None],
                             jnp.roll(x, d, axis=0), ident)
            return curve.add(x, prev)

        return jax.lax.fori_loop(0, int(n).bit_length() - 1, round_, pts)

    def rand_scalars(seed, n):
        limbs = jax.random.randint(jax.random.PRNGKey(seed), (n, 16), 0,
                                   1 << 16, dtype=jnp.int32)
        return F.to_mont(limbs.astype(jnp.uint32))

    pts = gen_points(n)
    s = rand_scalars(0, n)
    ref_engine = CachedMSM(curve, pts, c=13)
    want = ref_engine(s)
    for c in (6, 7):
        t0 = time.time()
        tbl = bake_stream_table(curve, pts, c, 1024)
        got = msm_stream_baked(curve, s, tbl, c, 1024)
        ok = bool(curve.eq(got, want))
        print(f"k={k} c={c}: ok={ok} (compile+run {time.time()-t0:.1f}s)",
              flush=True)
        assert ok

    # --- timing at k=18 --------------------------------------------------
    k = int(os.environ.get("STREAM_PROBE_K", "18"))
    n = 1 << k
    cache = os.path.expanduser(f"~/.cache/halo2_tpu/bench-points-{k}.npy")
    if os.path.exists(cache):
        pts = jnp.asarray(np.load(cache))
    else:
        pts = gen_points(n)
    runs = 5
    scal = [rand_scalars(i, n) for i in range(runs)]
    _fetch(scal[-1][0])

    for c in (6, 7):
        try:
            t0 = time.time()
            tbl = bake_stream_table(curve, pts, c, 1024)
            _fetch(tbl[:1, :1, :1])
            print(f"k={k} c={c}: bake {time.time()-t0:.1f}s "
                  f"({tbl.size*4/1e9:.2f} GB)", flush=True)
            t0 = time.time()
            out = msm_stream_baked(curve, scal[0], tbl, c, 1024)
            _fetch(out)
            print(f"k={k} c={c}: compile+first {time.time()-t0:.1f}s",
                  flush=True)
            t0 = time.time()
            for i in range(runs):
                out = msm_stream_baked(curve, scal[i], tbl, c, 1024)
            _fetch(out[0])
            t = (time.time() - t0) / runs
            print(f"k={k} c={c}: {t*1e3:8.1f} ms -> "
                  f"{n/t/1e6:.2f} M pts/s", flush=True)
            del tbl
        except Exception as e:
            print(f"k={k} c={c}: FAILED {repr(e)[:300]}", flush=True)




def unbaked():
    """Timing for the unbaked per-window kernel (k>=20 path)."""
    print("devices:", jax.devices(), flush=True)
    from halo2_tpu.curves import BN254_G1 as curve
    from halo2_tpu.msm.msm import CachedMSM
    from halo2_tpu.msm.stream_msm import (pack_base_stream_table,
                                          msm_stream_unbaked)
    import functools
    F = curve.Fr

    @functools.partial(jax.jit, static_argnums=0)
    def gen_points(n):
        pts = jnp.broadcast_to(
            curve.from_affine_ints([(curve.gen_x, curve.gen_y)])[0],
            (n, 3, 16))
        rows = jnp.arange(n)
        ident = curve.identity((n,))

        def round_(r, x):
            d = jnp.int32(1) << r
            prev = jnp.where((rows >= d)[:, None, None],
                             jnp.roll(x, d, axis=0), ident)
            return curve.add(x, prev)

        return jax.lax.fori_loop(0, int(n).bit_length() - 1, round_, pts)

    def rand_scalars(seed, n):
        limbs = jax.random.randint(jax.random.PRNGKey(seed), (n, 16), 0,
                                   1 << 16, dtype=jnp.int32)
        return F.to_mont(limbs.astype(jnp.uint32))

    # correctness vs sorted pipeline at k=12
    n = 1 << 12
    pts = gen_points(n)
    s = rand_scalars(0, n)
    want = CachedMSM(curve, pts, c=13)(s)
    from halo2_tpu.msm.stream_msm import bake_stream_table  # noqa
    tbl = pack_base_stream_table(curve, pts, 1024)
    got = msm_stream_unbaked(curve, s, tbl, 6, 1024)
    ok = bool(curve.eq(got, want))
    print(f"unbaked k=12 c=6: ok={ok}", flush=True)
    assert ok

    for k in (18, 20):
        n = 1 << k
        cache = os.path.expanduser(
            f"~/.cache/halo2_tpu/bench-points-{k}.npy")
        if os.path.exists(cache):
            pts = jnp.asarray(np.load(cache))
        else:
            pts = gen_points(n)
        tbl = pack_base_stream_table(curve, pts, 1024)
        _fetch(tbl[:1, :1, :1])
        print(f"unbaked k={k}: table {tbl.size*4/1e6:.0f} MB", flush=True)
        runs = 3
        scal = [rand_scalars(i, n) for i in range(runs)]
        _fetch(scal[-1][0])
        t0 = time.time()
        out = msm_stream_unbaked(curve, scal[0], tbl, 6, 1024)
        _fetch(out)
        print(f"unbaked k={k} c=6: compile+first {time.time()-t0:.1f}s",
              flush=True)
        t0 = time.time()
        for i in range(runs):
            out = msm_stream_unbaked(curve, scal[i], tbl, 6, 1024)
        _fetch(out[0])
        t = (time.time() - t0) / runs
        print(f"unbaked k={k} c=6: {t*1e3:8.1f} ms -> "
              f"{n/t/1e6:.2f} M pts/s", flush=True)
        del pts, tbl, scal


if __name__ == "__main__":
    if "--unbaked" in sys.argv:
        unbaked()
    else:
        main()
