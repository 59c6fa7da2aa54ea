"""Multi-chip MSM: points row-sharded over the mesh, one Pippenger per
chip, one-point-per-chip collective reduction.

The reference's `best_multiexp` splits points over rayon threads and adds
the per-thread partials (halo2_middleware/src/zal.rs:137, halo2curves
Pippenger).  The mesh analog keeps the expensive part (bucket accumulation)
entirely chip-local — the only traffic on ICI is a single projective point
per chip (`all_gather` of (D, 3, L) uint32 = D·192 bytes), after which every
chip folds the partials redundantly.  This is the communication-optimal
layout from the scaling-book recipe: shard the batch axis, reduce a scalar.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..curves.curve import Curve
from ..fields.field import NLIMBS
from ..msm.bucket_scan import (msm_variable, msm_windowed_cached,
                               pack_affine_rows, pad_width)
from ..msm.bucket_scan import n_windows_for
from ..msm.msm import point_tree_sum, window_bases
from .mesh import ROW_AXIS


def sharded_msm(mesh, curve: Curve, scalars_mont, points, c: int = 8,
                block: int = 32):
    """Variable-base MSM with points/scalars sharded on the row axis.

    scalars_mont: (n, L) Montgomery scalars; points: (n, 3, L) projective.
    n must be divisible by the mesh size.  Returns a replicated (3, L)
    projective point equal to `pippenger_msm(scalars, points)`.
    """
    n = scalars_mont.shape[0]
    n_dev = mesh.shape[ROW_AXIS]
    assert n % n_dev == 0, f"n={n} not divisible by mesh size {n_dev}"

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(ROW_AXIS, None), P(ROW_AXIS, None, None)),
        out_specs=P(), check_vma=False)
    def go(s, p):
        local = msm_variable(curve, s, p, c, block)         # (3, L)
        parts = jax.lax.all_gather(local, ROW_AXIS)          # (D, 3, L)
        return point_tree_sum(curve, parts)

    return jax.jit(go)(scalars_mont, points)


class ShardedCachedMSM:
    """Fixed-base MSM engine with window bases sharded over the mesh —
    the multi-chip form of the ZAL descriptor cache
    (halo2_middleware/src/zal.rs:78-102): the SRS expansion lives
    partitioned in the chips' HBM; each MSM sends one point per chip.
    """

    def __init__(self, mesh, curve: Curve, points, c: int | None = None,
                 block: int = 16):
        from ..msm.msm import auto_c
        self.mesh = mesh
        self.curve = curve
        n_dev_ = mesh.shape[ROW_AXIS]
        self.c = c = auto_c(points.shape[0] // n_dev_) if c is None else c
        self.block = block
        self.n = points.shape[0]
        self.n_dev = mesh.shape[ROW_AXIS]
        assert self.n % self.n_dev == 0
        n_windows = n_windows_for(curve.Fr, c)
        wb = window_bases(curve, points, c)                  # (w, n, 3, L)
        flat = wb.reshape(-1, 3, NLIMBS)
        aff = curve.batch_normalize(flat)
        inf = curve.is_identity(flat)
        pad = pad_width(flat.shape[0] // self.n_dev)
        rows = pack_affine_rows(curve, aff[:, :2, :], inf, pad)
        rows = rows.reshape(n_windows, self.n, pad)
        # resident sharded on the POINT axis (w replicated per shard)
        shard3 = jax.sharding.NamedSharding(mesh, P(None, ROW_AXIS, None))
        self.rows = jax.device_put(rows, shard3)
        self._fn = self._build()

    def _build(self):
        curve, c, block = self.curve, self.c, self.block

        @functools.partial(
            shard_map, mesh=self.mesh,
            in_specs=(P(ROW_AXIS, None), P(None, ROW_AXIS, None)),
            out_specs=P(), check_vma=False)
        def go(s, rows):
            local = msm_windowed_cached(
                curve, s, rows.reshape(-1, rows.shape[-1]), c, block)
            parts = jax.lax.all_gather(local, ROW_AXIS)
            return point_tree_sum(curve, parts)

        return jax.jit(go)

    def __call__(self, scalars_mont):
        return self._fn(scalars_mont, self.rows)
