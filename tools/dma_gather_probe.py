"""Measure Pallas per-row DMA gather rate vs XLA's ~13.5 ns/row take.

Design under test: grid over row-blocks; each step has its R indices
streamed into SMEM (a whole-array scalar prefetch of 5M indices blows the
SMEM budget), DMAs R scattered rows from an HBM-resident table into VMEM
with a software pipeline of DEPTH in-flight copies, then writes the block
to the output (in real use the consumer kernel would fuse here instead).
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


def _fetch(x):
    return np.asarray(x)


def dma_gather(M, width, R, depth=8):
    """Gather M rows of `width` u32 from an (n_rows, width) HBM table."""

    def kernel(idx_ref, tbl_ref, out_ref, buf, sems):
        def get_dma(j):
            return pltpu.make_async_copy(
                tbl_ref.at[pl.ds(idx_ref[j], 1), :],
                buf.at[pl.ds(j % depth, 1), :],
                sems.at[j % depth],
            )

        for j in range(depth):
            get_dma(j).start()

        def body(j, _):
            get_dma(j).wait()
            out_ref[pl.ds(j, 1), :] = buf[pl.ds(j % depth, 1), :]

            @pl.when(j + depth < R)
            def _():
                get_dma(j + depth).start()
            return 0

        jax.lax.fori_loop(0, R, body, 0)

    @jax.jit
    def run(idx, tbl):
        return pl.pallas_call(
            kernel,
            grid=(M // R,),
            in_specs=[
                pl.BlockSpec((R,), lambda s: (s,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((R, width), lambda s: (s, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((depth, width), jnp.uint32),
                pltpu.SemaphoreType.DMA((depth,)),
            ],
            out_shape=jax.ShapeDtypeStruct((M, width), jnp.uint32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, tbl)

    return run


@functools.partial(jax.jit, static_argnums=(0, 1))
def mk_tbl(rows, cols):
    r = jax.lax.broadcasted_iota(jnp.uint32, (rows, cols), 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, (rows, cols), 1)
    return (r * jnp.uint32(2654435761) + c * jnp.uint32(40503))


def main():
    print("devices:", jax.devices(), flush=True)
    k = 18
    n_rows = 1 << k
    M = 20 * n_rows
    import jax.random as jr
    idx = jr.randint(jr.PRNGKey(0), (M,), 0, n_rows, dtype=jnp.int32)

    for width in (128, 64):
        tbl = mk_tbl(n_rows, width)
        for R, depth in ((512, 8), (1024, 16), (2048, 32)):
            try:
                fn = dma_gather(M, width, R, depth)
                t0 = time.time()
                r = fn(idx, tbl)
                _fetch(r[:1, :1])
                print(f"  w={width} R={R} d={depth}: compile+first "
                      f"{time.time()-t0:.1f}s", flush=True)
                t0 = time.time()
                iters = 3
                for _ in range(iters):
                    r = fn(idx, tbl)
                _fetch(r[:1, :1])
                t = (time.time() - t0) / iters
                want = np.asarray(tbl[np.asarray(idx[:4])])
                got = np.asarray(r[:4])
                ok = np.array_equal(want, got)
                print(f"  w={width} R={R} d={depth}: {t*1e3:8.1f} ms "
                      f"({t/M*1e9:5.2f} ns/row) ok={ok}", flush=True)
            except Exception as e:
                print(f"  w={width} R={R} d={depth}: FAILED "
                      f"{repr(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
