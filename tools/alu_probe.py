"""Probe the TRUE per-chip Montgomery-multiply roofline.

bench.py's historical denominator chained whole-array F.mul dispatches
(fori_loop of pallas calls).  At 2^21 lanes x 4096 reps it reported
13.2G muls/s = 2.5 TB/s of implied HBM traffic -- 3x the v5e's physical
819 GB/s, so that number cannot be a real streaming rate; the XLA loop is
not executing the way the measurement assumes.  This probe measures the
two honest bounds that exist for a 16x16-bit-limb Montgomery multiply:

  alu   -- data resident in VMEM, R dependent muls per element inside ONE
           pallas kernel (grid streams tiles once; R large => pure ALU).
  hbm   -- R=1: one streamed mul, 192 B/mul of HBM traffic.

Also measures the raw u32 multiply-add rate for context.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from halo2_tpu.curves import BN254_G1 as curve
from halo2_tpu.fields.field import NLIMBS
from halo2_tpu.fields.pallas_ops import _mont_mul_body

F = curve.Fq
TILE = 2048


def _fetch(x):
    return np.asarray(x)


def mont_repeat(n, reps):
    """(16, n) a,b -> fori_loop(reps): a = mont_mul(a, b), inside kernel."""
    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i] for i in range(NLIMBS)]
        b = [b_ref[i] for i in range(NLIMBS)]

        def body(_, a):
            return _mont_mul_body(F, a, b)

        out = jax.lax.fori_loop(0, reps, body, a)
        for i in range(NLIMBS):
            o_ref[i] = out[i]

    @jax.jit
    def run(at, bt):
        return pl.pallas_call(
            kernel,
            grid=(n // TILE,),
            in_specs=[
                pl.BlockSpec((NLIMBS, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NLIMBS, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((NLIMBS, TILE), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NLIMBS, n), jnp.uint32),
        )(at, bt)
    return run


def u32_mul_repeat(n, reps):
    """raw dependent u32 multiply-accumulate chain: v = v*b + 1."""
    def kernel(a_ref, b_ref, o_ref):
        def body(_, v):
            return v * b_ref[:] + 1
        o_ref[:] = jax.lax.fori_loop(0, reps, body, a_ref[:])

    @jax.jit
    def run(at, bt):
        return pl.pallas_call(
            kernel,
            grid=(n // TILE,),
            in_specs=[pl.BlockSpec((8, TILE), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((8, TILE), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, n), jnp.uint32),
        )(at, bt)
    return run


def time_it(fn, *args, iters=3):
    _fetch(fn(*args)[0, :1])   # compile + warm
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    _fetch(r[0, :1])
    return (time.time() - t0) / iters


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    n = 1 << 21
    a = jnp.asarray(rng.integers(0, 1 << 16, (NLIMBS, n), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (NLIMBS, n), dtype=np.uint32))

    for reps in (1, 4, 16, 64):
        t = time_it(mont_repeat(n, reps), a, b)
        rate = n * reps / t
        gbs = n * 192 / t / 1e9  # if this were streamed per rep: *reps
        print(f"mont reps={reps:3d}: {t*1e3:8.2f} ms  "
              f"{rate/1e9:6.2f} G muls/s  (stream-once {gbs:.0f} GB/s)")

    a8 = a[:8]
    b8 = b[:8]
    for reps in (64, 256):
        t = time_it(u32_mul_repeat(n, reps), a8, b8)
        ops = 8 * n * reps / NLIMBS  # per (8,n) block
        print(f"u32 mul+add reps={reps}: {t*1e3:8.2f} ms  "
              f"{8*n*reps/t/1e12:.3f} T mul-adds/s")

    # the historical chained-dispatch measurement, for comparison
    rk = 1 << 21
    al = jnp.moveaxis(a.reshape(NLIMBS, rk), 0, -1)
    bl = jnp.moveaxis(b.reshape(NLIMBS, rk), 0, -1)
    al = al % jnp.uint32(1 << 15)
    for reps in (64, 256):
        @jax.jit
        def chain(x, bb, reps=reps):
            return jax.lax.fori_loop(0, reps, lambda i, v: F.mul(v, bb), x)
        _fetch(chain(al, bl)[0, :1])
        t0 = time.time()
        r = chain(al, bl)
        _fetch(r[0, :1])
        t = time.time() - t0
        print(f"chained-dispatch reps={reps}: {t*1e3:8.2f} ms  "
              f"{rk*reps/t/1e9:6.2f} G muls/s "
              f"(implied {rk*reps*192/t/1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
