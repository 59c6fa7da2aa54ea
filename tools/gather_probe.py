"""Probe gather strategies for the MSM sorted-row fetch.

The MSM pipeline's dominant non-arithmetic cost is applying the sort
permutation to the affine base rows: jnp.take of 5.24M x (M,128)-padded
rows measured ~13 ns/row (72.6 ms) on v5e, plus a 21.7 ms HBM relayout to
the scan kernel's (block, nrows, nb) layout.  This probe measures the
alternatives end to end ON THE SAME LAYOUT CONTRACT the scan consumes.
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

NROWS = 34          # 2*16 limbs + flag + pad-to-even
BLOCK = 16


def _fetch(x):
    return np.asarray(x)


def time_it(fn, *args, iters=3):
    t0 = time.time()
    r = fn(*args)
    _fetch(jax.tree.leaves(r)[0].ravel()[:1])
    print(f"    (compile+first {time.time()-t0:.1f}s)", flush=True)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    _fetch(jax.tree.leaves(r)[0].ravel()[:1])
    return (time.time() - t0) / iters


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    k = 18
    n = 1 << k
    W = 20
    M = W * n
    nb = M // BLOCK
    print(f"n=2^{k}, W={W}, M={M}, nb={nb}")

    import jax.random as jr
    perm = jr.permutation(jr.PRNGKey(0), M).astype(jnp.int32)

    import functools as _ft

    @_ft.partial(jax.jit, static_argnums=(0, 1))
    def mk_tbl(rows, cols):
        # device-side deterministic fill -- host-generating + tunneling a
        # multi-GB table takes minutes; content doesn't matter for timing
        r = jax.lax.broadcasted_iota(jnp.uint32, (rows, cols), 0)
        c = jax.lax.broadcasted_iota(jnp.uint32, (rows, cols), 1)
        return (r * jnp.uint32(2654435761) + c * jnp.uint32(40503)) & jnp.uint32(0xffff)

    # ---------------- t1: row-major take, pad 128 (current) --------------
    tbl128 = mk_tbl(M, 128)

    @jax.jit
    def t1(tbl, idx):
        return jnp.take(tbl, idx, axis=0)

    t = time_it(t1, tbl128, perm)
    print(f"t1 take (M,128) rows:          {t*1e3:8.1f} ms "
          f"({t/M*1e9:5.2f} ns/row)")

    # + the relayout the scan needs today
    @jax.jit
    def t1b(tbl, idx):
        g = jnp.take(tbl, idx, axis=0)[:, :NROWS]
        return jnp.transpose(g.reshape(nb, BLOCK, NROWS), (1, 2, 0))

    t = time_it(t1b, tbl128, perm)
    print(f"t1b take+relayout (current):   {t*1e3:8.1f} ms", flush=True)
    del tbl128

    # ---------------- t2: row-major take, pad 64 -------------------------
    tbl64 = mk_tbl(M, 64)

    @jax.jit
    def t2(tbl, idx):
        return jnp.take(tbl, idx, axis=0)

    t = time_it(t2, tbl64, perm)
    print(f"t2 take (M,64) rows:           {t*1e3:8.1f} ms "
          f"({t/M*1e9:5.2f} ns/row)")
    del tbl64

    # ---------------- t3: row-major take, packed u16 pairs, pad 32 -------
    tbl32 = mk_tbl(M, 32)

    @jax.jit
    def t3(tbl, idx):
        return jnp.take(tbl, idx, axis=0)

    t = time_it(t3, tbl32, perm)
    print(f"t3 take (M,32) packed rows:    {t*1e3:8.1f} ms "
          f"({t/M*1e9:5.2f} ns/row)")
    del tbl32

    # ---------------- t4: minor-dim take from (34, M) ---------------------
    tblT = mk_tbl(NROWS, M)

    @jax.jit
    def t4(tbl, idx):
        return jnp.take(tbl, idx, axis=1)

    t = time_it(t4, tblT, perm)
    print(f"t4 take (34,M) minor dim:      {t*1e3:8.1f} ms "
          f"({t/M*1e9:5.2f} ns/row)")

    # ---------------- t5: minor take straight into scan layout -----------
    @jax.jit
    def t5(tbl, idx):
        idx2 = idx.reshape(nb, BLOCK).T.reshape(-1)    # (BLOCK*nb,)
        g = jnp.take(tbl, idx2, axis=1)               # (34, BLOCK*nb)
        return g.reshape(NROWS, BLOCK, nb)

    t = time_it(t5, tblT, perm)
    print(f"t5 minor take -> scan layout:  {t*1e3:8.1f} ms", flush=True)
    del tblT

    # ---------------- t6: packed minor take (17, M) -----------------------
    tblTP = mk_tbl(17, M)

    @jax.jit
    def t6(tbl, idx):
        idx2 = idx.reshape(nb, BLOCK).T.reshape(-1)
        g = jnp.take(tbl, idx2, axis=1)
        return g.reshape(17, BLOCK, nb)

    t = time_it(t6, tblTP, perm)
    print(f"t6 packed minor -> layout:     {t*1e3:8.1f} ms", flush=True)
    del tblTP

    # ---------------- t7: sort carrying packed value columns --------------
    # 2-operand baseline
    keys = (jr.randint(jr.PRNGKey(1), (M,), 0, 8194 * 2)).astype(jnp.int32)

    @jax.jit
    def s2(kk):
        return jax.lax.sort([kk, jnp.arange(M, dtype=jnp.int32)], num_keys=1)

    t = time_it(s2, keys)
    print(f"s2 sort key+iota:              {t*1e3:8.1f} ms", flush=True)

    cols6 = [jr.bits(jr.PRNGKey(2 + i), (M,), jnp.uint32)
             for i in range(5)]

    @jax.jit
    def s6(kk, cols):
        return jax.lax.sort([kk] + list(cols), num_keys=1)

    try:
        t = time_it(s6, keys, cols6)
        print(f"s6 sort key+5 cols:            {t*1e3:8.1f} ms", flush=True)
    except Exception as e:
        print("s6 sort key+5cols failed:", repr(e)[:120])


if __name__ == "__main__":
    main()
