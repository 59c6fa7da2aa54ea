"""Multi-chip grand-product scans.

The reference chains running products sequentially across rayon chunks via a
`last_z` carry (halo2_backend/src/plonk/permutation/prover.rs:160-173,
lookup/prover.rs:254-265).  On a mesh the same trick crosses chips: each chip
scans its slab locally (log-depth batched field muls), all chips gather the
D slab totals (D·64 bytes on ICI), and each multiplies its slab by the
product of the totals to its left — one collective, no serial chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..fields.field import Field
from ..poly.arith import prefix_product
from .mesh import ROW_AXIS


def sharded_prefix_product(mesh, F: Field, a):
    """Inclusive running product along axis 0 of a row-sharded (n, L) array.
    Matches `poly.arith.prefix_product` on the gathered data."""
    n_dev = mesh.shape[ROW_AXIS]
    assert a.shape[0] % n_dev == 0

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=P(ROW_AXIS, None),
                       out_specs=P(ROW_AXIS, None), check_vma=False)
    def go(x):
        loc = prefix_product(F, x)                     # (n/D, L)
        totals = jax.lax.all_gather(loc[-1], ROW_AXIS)  # (D, L)
        d = jax.lax.axis_index(ROW_AXIS)
        mine = F.select(jnp.arange(n_dev) < d, totals, F.ones((n_dev,)))
        carry = prefix_product(F, mine)[-1]            # product of left slabs
        return F.mul(loc, carry)

    return jax.jit(go)(a)
