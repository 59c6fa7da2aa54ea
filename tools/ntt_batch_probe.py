"""Batched-NTT throughput probe: is the fused four-step transpose-bound
for multi-column batches (the prover's shape), and what do the boundary
transposes cost?"""
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
    from halo2_tpu.fields import BN254_FR as F
    from halo2_tpu.ntt import get_ntt

    k = 18
    n = 1 << k
    ntt = get_ntt(F, k)

    def rand(seed, B):
        limbs = jax.random.randint(jax.random.PRNGKey(seed), (B, n, 16), 0,
                                   1 << 16, dtype=jnp.int32)
        return F.to_mont(limbs.astype(jnp.uint32))

    for B in (1, 4, 8, 16):
        a = rand(B, B)
        _fetch(ntt.forward(a).ravel()[:1])    # compile
        iters = max(2, 32 // B)
        t0 = time.time()
        for _ in range(iters):
            r = ntt.forward(a)
        _fetch(r.ravel()[:1])
        t = (time.time() - t0) / iters
        rate = B * n / t
        print(f"B={B:3d}: {t*1e3:8.2f} ms  {rate/1e6:8.1f} M elems/s "
              f"({t/B*1e3:.2f} ms/col)", flush=True)

    # boundary transpose cost in isolation
    for B in (8, 16):
        a = rand(77, B)

        @jax.jit
        def tp(x):
            return jnp.transpose(x.reshape(B * n // n, n, 16), (2, 1, 0))

        _fetch(tp(a).ravel()[:1])
        t0 = time.time()
        for _ in range(4):
            r = tp(a)
        _fetch(r.ravel()[:1])
        t = (time.time() - t0) / 4
        gb = B * n * 16 * 4 / 1e9
        print(f"transpose (B={B},n,L)->(L,n,B): {t*1e3:8.2f} ms "
              f"({2*gb/t:.0f} GB/s rw)", flush=True)


if __name__ == "__main__":
    main()
