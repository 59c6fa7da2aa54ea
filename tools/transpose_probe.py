"""Probe: Pallas limb-transpose (R, 16) <-> (16, R) vs XLA's ~21 GB/s.

The trick: view (R, 16) u32 as (R/8, 128) — bitwise identical — so each
128-lane row holds 8 consecutive elements' 16 limbs.  A (128, 128) block
then transposes to a (16, 1024) output block with one small in-VMEM
shuffle: reshape (128, 8, 16) -> transpose (2, 0, 1) -> (16, 128, 8) ->
reshape (16, 1024)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 16


def _fetch(x):
    return np.asarray(x)


def limb_T_fwd(R, rows_per_blk=128):
    """(R, 16) -> (16, R)."""
    assert R % (8 * rows_per_blk) == 0
    n_blk = R // (8 * rows_per_blk)
    E = 8 * rows_per_blk          # elements per block

    def kernel(x_ref, o_ref):
        blk = x_ref[...]                       # (rows, 128)
        t = blk.reshape(rows_per_blk, 8, L)
        t = jnp.transpose(t, (2, 0, 1))        # (L, rows, 8)
        o_ref[...] = t.reshape(L, E)

    @jax.jit
    def run(x):
        x2 = x.reshape(R // 8, 128)
        return pl.pallas_call(
            kernel,
            grid=(n_blk,),
            in_specs=[pl.BlockSpec((rows_per_blk, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((L, E), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, R), jnp.uint32),
        )(x2)
    return run


def limb_T_bwd(R, rows_per_blk=128):
    """(16, R) -> (R, 16)."""
    assert R % (8 * rows_per_blk) == 0
    n_blk = R // (8 * rows_per_blk)
    E = 8 * rows_per_blk

    def kernel(x_ref, o_ref):
        blk = x_ref[...]                       # (L, E)
        t = blk.reshape(L, rows_per_blk, 8)
        t = jnp.transpose(t, (1, 2, 0))        # (rows, 8, L)
        o_ref[...] = t.reshape(rows_per_blk, 128)

    @jax.jit
    def run(x):
        out = pl.pallas_call(
            kernel,
            grid=(n_blk,),
            in_specs=[pl.BlockSpec((L, E), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows_per_blk, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R // 8, 128), jnp.uint32),
        )(x)
        return out.reshape(R, L)
    return run


def main():
    print("devices:", jax.devices(), flush=True)
    R = 8 << 18                  # B=8 columns of 2^18
    x = jax.random.randint(jax.random.PRNGKey(0), (R, L), 0, 1 << 16,
                           dtype=jnp.int32).astype(jnp.uint32)
    gb = R * L * 4 / 1e9

    for rows in (64, 128, 256):
        try:
            fwd = limb_T_fwd(R, rows)
            r = fwd(x)
            _fetch(r[:1, :1])
            # correctness
            ok = bool(jnp.array_equal(r[:, : 4 * 8], x[: 4 * 8].T))
            t0 = time.time()
            for _ in range(8):
                r = fwd(x)
            _fetch(r[:1, :1])
            t = (time.time() - t0) / 8
            print(f"fwd rows={rows}: {t*1e3:7.2f} ms ({2*gb/t:5.0f} GB/s) "
                  f"ok={ok}", flush=True)
        except Exception as e:
            print(f"fwd rows={rows}: FAILED {repr(e)[:200]}", flush=True)

    xt = x.T.copy()
    for rows in (128,):
        try:
            bwd = limb_T_bwd(R, rows)
            r = bwd(xt)
            _fetch(r[:1, :1])
            ok = bool(jnp.array_equal(r, x))
            t0 = time.time()
            for _ in range(8):
                r = bwd(xt)
            _fetch(r[:1, :1])
            t = (time.time() - t0) / 8
            print(f"bwd rows={rows}: {t*1e3:7.2f} ms ({2*gb/t:5.0f} GB/s) "
                  f"ok={ok}", flush=True)
        except Exception as e:
            print(f"bwd rows={rows}: FAILED {repr(e)[:200]}", flush=True)

    # XLA baseline
    @jax.jit
    def xla_T(x):
        return x.T

    r = xla_T(x)
    _fetch(r[:1, :1])
    t0 = time.time()
    for _ in range(8):
        r = xla_T(x)
    _fetch(r[:1, :1])
    t = (time.time() - t0) / 8
    print(f"xla transpose: {t*1e3:7.2f} ms ({2*gb/t:5.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
