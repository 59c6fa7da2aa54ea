"""Multi-scalar multiplication (the reference's `best_multiexp` /
ZAL `MsmAccel::msm` seam — halo2_middleware/src/zal.rs:113-177).

TPU-native Pippenger built on two primitives that map well onto the
hardware (see bucket_scan.py): `lax.sort` carrying the affine point limbs
as value columns (sorts AND moves the data in one pass — no scatter, no
slow row-gather), and a fused Pallas segmented-scan kernel whose running
accumulator lives in VMEM scratch (one complete mixed addition per sorted
element — work-optimal).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.curve import Curve
from ..fields.field import NLIMBS
from .bucket_scan import (msm_variable, msm_windowed_cached,
                          pack_affine_rows, pad_width)


def point_tree_sum(curve: Curve, pts, axis: int = 0):
    """Sum points along axis via log-depth pairwise adds."""
    pts = jnp.moveaxis(pts, axis, 0)
    n = pts.shape[0]
    while n > 1:
        if n % 2 == 1:
            pts = jnp.concatenate(
                [pts, curve.identity((1,) + pts.shape[1:-2])], axis=0)
            n += 1
        pts = curve.add(pts[: n // 2], pts[n // 2:])
        n = pts.shape[0]
    return pts[0]


@functools.partial(jax.jit, static_argnums=0)
def naive_msm(curve: Curve, scalars_mont, points):
    """Reference implementation: per-point scalar mul + tree reduction.
    O(256 n) point ops — use only for tests / tiny n."""
    prods = curve.scalar_mul(points, scalars_mont)
    return point_tree_sum(curve, prods)


def pippenger_msm(curve: Curve, scalars_mont, points, c: int = 8,
                  block: int = 64):
    """Variable-base MSM via windowed bucket method.

    scalars_mont: (n, NLIMBS) scalar-field elements (Montgomery form)
    points:       (n, 3, NLIMBS) projective points
    c:            window bits (must divide 16)
    returns a single projective point (3, NLIMBS).
    """
    return msm_variable(curve, scalars_mont, points, c, block)


def auto_c(n: int) -> int:
    """Window width minimizing sort+gather+scan rows (~256n/c) against the
    bucket-space costs (tails gather+scan over 2^(c-1)*block rows PER
    LEVEL, and the weighted fold).  Measured end-to-end at k=18 on v5e:
    c=13 -> 156 ms, c=15/pad64 -> 189 ms, c=16 -> 232 ms (the tails
    machinery at 2^15 buckets dominates the 20%% row reduction), so the
    sweet spot stays at 13."""
    return max(4, min(13, int(n).bit_length() - 4))


@functools.partial(jax.jit, static_argnums=(0, 2))
def window_bases(curve: Curve, points, c: int = 13):
    """Precompute [2^(c*w)]P_i for every window w — the descriptor-caching
    seam of the reference's ZAL (halo2_middleware/src/zal.rs:78-102): fixed
    commitment bases (SRS) are expanded once, after which every MSM needs NO
    doubling ladder at all.

    Returns (n_windows, n, 3, NLIMBS) projective."""
    from .bucket_scan import n_windows_for
    n_windows = n_windows_for(curve.Fr, c)

    def body(cur, _):
        nxt = jax.lax.fori_loop(0, c, lambda i, a: curve.double(a), cur)
        return nxt, cur

    _, stacked = jax.lax.scan(body, points, None, length=n_windows)
    return stacked


class CachedMSM:
    """Fixed-base MSM engine with resident AFFINE bases (the `MsmAccel`
    descriptor API equivalent).  Two modes, picked by the baked table's
    memory footprint:

    - BAKED (n_windows*n rows fit `max_baked_bytes`, ~k<=18): the window
      factor 2^(c*w) is pre-doubled into the bases, so every MSM is one
      sort + one segmented scan over a single 2^(c-1)+1-bucket space —
      the fastest shape (150 ms at k=18 on v5e; the tails machinery
      scales with bucket count, so ONE shared space wins).
    - UNBAKED (k>=20): bases packed once as n rows (0.5 GB at k=20 vs
      5.4 GB baked), each window chunk tags its own bucket space and
      `msm_unbaked_rows` folds with doublings.  ~3x slower per MSM
      (82k-bucket tails), but it is the difference between fitting HBM
      alongside the prover state and OOM.

    Window CHUNKING (groups of `max_rows // n` windows) bounds the
    sort/gather transient in both modes."""

    def __init__(self, curve: Curve, points, c: int | None = None,
                 block: int = 16, max_rows: int = 1 << 23,
                 max_baked_rows: int = 1 << 23):
        from .bucket_scan import n_windows_for
        self.curve = curve
        self.c = c = auto_c(points.shape[0]) if c is None else c
        self.block = block
        self.n = n = points.shape[0]
        nw = n_windows_for(curve.Fr, c)
        self.n_windows = nw
        wc = max(1, min(nw, max_rows // max(n, 1)))
        self.window_chunk = wc
        self.bounds = [(w0, min(w0 + wc, nw)) for w0 in range(0, nw, wc)]
        # 2^23 baked rows = 2.1 GB at pad 64 (k=18: 5.24M rows, baked);
        # k>=19 overflows both the table and the build transient -> unbaked
        self.baked = nw * n <= max_baked_rows
        if not self.baked:
            # tighter chunking: the unbaked path coexists with the k>=20
            # prover's extended-domain state, so bound the per-dispatch
            # sort/gather transient at ~2 GB (4M rows x 128-lane pad)
            wc = max(1, min(nw, (1 << 22) // max(n, 1)))
            self.window_chunk = wc
            self.bounds = [(w0, min(w0 + wc, nw))
                           for w0 in range(0, nw, wc)]
        # AOT-cached programs (aot.py): the full-size MSM is ~25MB of MLIR
        # and costs minutes of host tracing per process; the exported
        # artifacts load in ~0.1s in every later process.
        from ..aot import aot
        from .bucket_scan import _lanes
        salt = f"{curve.name}-c{c}-b{block}-l{_lanes()}"

        if self.baked:
            from .bucket_scan import msm_windowed_cached as _mwc
            from .bucket_scan import msm_packed_rows as _mpr
            bounds = self.bounds

            def _build_tables(pts):
                wb = window_bases(curve, pts, c)           # (nw, n, 3, L)
                outs = []
                for w0, w1 in bounds:
                    flat = wb[w0:w1].reshape(-1, 3, NLIMBS)
                    aff = curve.batch_normalize(flat)      # (m, 2+, L)
                    inf = curve.is_identity(flat)
                    outs.append(pack_affine_rows(
                        curve, aff[:, :2, :], inf, pad_width(flat.shape[0])))
                return tuple(outs)

            self.wchunks = list(aot(
                jax.jit(_build_tables), "msm_window_tables",
                salt + f"-wc{wc}")(points))
            self._aot_single = aot(
                jax.jit(lambda s, r: _mwc(curve, s, r, c, block)),
                "msm_windowed_cached", salt)
            self._aot_chunk = aot(
                jax.jit(lambda p, r: _mpr(curve, p, r, c, block)),
                "msm_packed_rows", salt)
        else:
            from .bucket_scan import msm_unbaked_rows as _mur

            def _pack_base(pts):
                aff = curve.batch_normalize(pts)           # (n, 2+, L)
                inf = curve.is_identity(pts)
                return pack_affine_rows(curve, aff[:, :2, :], inf,
                                        pad_width(n))

            self.rows = aot(jax.jit(_pack_base), "msm_base_rows",
                            salt)(points)
            self._aot_unbaked = aot(
                jax.jit(lambda p, r: _mur(curve, p, r, c, block)),
                "msm_unbaked_rows", salt)

    @property
    def wbases(self):
        """Back-compat view for introspection/benchmarks."""
        return self.wchunks[0] if self.baked else self.rows

    def __call__(self, scalars_mont):
        from .bucket_scan import packed_digits, shift_add
        n = scalars_mont.shape[0]
        if not self.baked:
            rows = self.rows if n == self.n else self.rows[:n]
            packed = packed_digits(self.curve, scalars_mont, self.c)
            acc = None
            prev_w0 = None
            for (w0, w1) in reversed(self.bounds):
                part = self._aot_unbaked(packed[w0:w1], rows)
                if acc is None:
                    acc = part
                else:
                    acc = shift_add(self.curve, acc,
                                    self.c * (prev_w0 - w0), part)
                prev_w0 = w0
            return acc
        if len(self.bounds) == 1 and n == self.n:
            return self._aot_single(scalars_mont, self.wchunks[0])
        packed = packed_digits(self.curve, scalars_mont, self.c)
        acc = None
        for (w0, w1), rows in zip(self.bounds, self.wchunks):
            if n != self.n:
                pad = rows.shape[1]
                rows = rows.reshape(w1 - w0, self.n, pad)[:, :n
                                                          ].reshape(-1, pad)
            part = self._aot_chunk(packed[w0:w1], rows)
            acc = part if acc is None else self.curve.add(acc, part)
        return acc


def default_cached_msm(curve: Curve, bases):
    """Default fixed-base descriptor when no PlonkEngine is installed:
    the streaming scatter-bucket engine on accelerators (stream_msm.py —
    the fast path commitments use), the sorted pipeline on CPU (keeps the
    test suite on its warm compile caches)."""
    from ..fields.field import _use_pallas
    if _use_pallas():
        from .stream_msm import StreamMSM
        return StreamMSM(curve, bases)
    return CachedMSM(curve, bases)


def msm(curve: Curve, scalars_mont, points, c: int | None = None,
        block: int = 64):
    """Dispatching MSM (the `best_multiexp` equivalent)."""
    n = int(scalars_mont.shape[0])
    if n == 0:
        return curve.identity(())
    if n <= 32:
        return naive_msm(curve, scalars_mont, points)
    if c is None:
        c = 8 if n >= 1 << 12 else 4
    return pippenger_msm(curve, scalars_mont, points, c, block)
