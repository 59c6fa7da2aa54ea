"""Streaming scatter-bucket MSM — no sort, no gather.

Round-5 redesign of the fixed-base MSM (the reference's cached-base
`best_multiexp`, halo2_middleware/src/zal.rs:78-177).  The round-1..4
sort + segmented-scan pipeline was bound by data movement XLA cannot do
fast: the sorted row-gather costs ~13.5 ns/row no matter the layout, a
hand-rolled Pallas per-row DMA gather measures ~37 ns/row
(tools/dma_gather_probe.py), and the digit sort adds ~10-18 ms — at
k=18/c=13 that is ~95 ms of pure grouping overhead against a 26 ms ALU
floor.

This kernel removes the grouping entirely by making the bucket space small
enough to live in VMEM per lane:

  - balanced signed digits with a SMALL window (c=6/7 -> 33/65 buckets);
  - each of the 1024 lanes owns a private (nb, 48) projective bucket
    array in the revisited output block (VMEM-resident across the
    sequential grid);
  - the baked window table (window factor 2^(c*w) pre-doubled in, all
    windows sharing ONE bucket space) streams SEQUENTIALLY from HBM in
    (1, 18, lanes) tiles — u16 limb pairs packed two-per-u32-word, so the
    whole table is 72 B/row (vs 512 B padded rows for the gather path);
  - per element: unpack (~100 ops) + one complete mixed addition
    (RC15 Alg 8, ~11 muls) + a masked read-modify-write of the lane's
    bucket (2*nb*48 selects).

The cost model trade: W = ceil(258/c) windows means W*n mixed adds
(43n at c=6 vs 20n at c=13), but the adds run at the ALU roofline with
zero grouping overhead — measured end-to-end this beats the sorted
pipeline ~2x and scales to k>=20 with a table that actually fits HBM.

Correctness under adversarial distributions (all scalars equal, zeros,
identities) follows from the completeness of the formulas + the masked
update (identical whether a bucket receives 0 or all elements).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.curve import Curve
from ..fields.field import NLIMBS, MASK, _use_pallas
from .bucket_scan import (_signed_digits, n_windows_for, weighted_bucket_fold)

NROWS_PK = 2 * (NLIMBS // 2) + 2          # 8 x-words, 8 y-words, flag, pad
ACC_ROWS = 3 * NLIMBS                     # projective accumulator rows


def _lanes_stream() -> int:
    import os
    try:
        return int(os.environ.get("HALO2_TPU_STREAM_LANES", "1024"))
    except ValueError:
        return 1024


def pack_stream_rows(aff_xy, inf):
    """(m, 2, L) affine Montgomery coords + (m,) inf -> (m, 18) u32 rows:
    [x packed u16-pairs (8) | y packed (8) | inf | 0]."""
    m = aff_xy.shape[0]
    x = aff_xy[:, 0, :]
    y = aff_xy[:, 1, :]

    def pack(v):                           # (m, 16) -> (m, 8)
        return v[:, 0::2] | (v[:, 1::2] << 16)

    return jnp.concatenate(
        [pack(x), pack(y), inf.astype(jnp.uint32)[:, None],
         jnp.zeros((m, 1), jnp.uint32)], axis=1)


def to_stream_layout(rows, lanes):
    """(S, 18) rows -> (S//lanes, 18, lanes); S must divide by lanes."""
    S = rows.shape[0]
    assert S % lanes == 0
    return jnp.transpose(rows.reshape(S // lanes, lanes, NROWS_PK),
                         (0, 2, 1))


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def stream_keys(curve: Curve, scalars_mont, c: int, lanes: int):
    """(n, L) scalars -> (ceil(nw*n/lanes), lanes) i32 packed signed digits
    (|d|*2 + sign), in the element order e = w*n + i matching the baked
    stream table; padded tail elements get key 0 (bucket 0 = weight 0)."""
    nw = n_windows_for(curve.Fr, c)
    keys, signs = _signed_digits(curve.Fr, scalars_mont, c)   # (nw, n)
    packed = (keys * 2 + signs.astype(jnp.int32)).reshape(-1)
    S = packed.shape[0]
    pad = (-S) % lanes
    if pad:
        packed = jnp.concatenate(
            [packed, jnp.zeros((pad,), jnp.int32)])
    return packed.reshape(-1, lanes)


def _one_mont_col(curve):
    """48-entry column [0]*16 + one_mont + [0]*16 (projective identity)."""
    col = [0] * NLIMBS + [int(x) for x in curve.Fq._one_mont] + [0] * NLIMBS
    return col


ACC_ROWS_PK = 3 * (NLIMBS // 2)           # packed accumulator rows (24)


def _stream_bucket_pallas(curve: Curve, keys_t, table_t, nb: int,
                          lanes: int):
    """keys_t (S, lanes) i32; table_t (S, 18, lanes) u32.
    Returns (nb, 24, lanes) per-lane projective bucket sums with limbs
    PACKED two-per-word.

    The accumulators are stored packed (u16 limb pairs in u32 words) to
    halve the per-element bucket read-modify-write VMEM traffic — at c=6
    the unpacked RMW (33 buckets x 48 rows x 2 x 4 KB per step) was ~40%%
    of kernel time.  Canonical limbs are < 2^16, so packing is lossless."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..curves.pallas_ec import _madd_body_ec
    from ..fields.pallas_ops import _sub_body

    F = curve.Fq
    S = keys_t.shape[0]
    one_col = _one_mont_col(curve)
    # packed identity column: word q of coord c = limb[2q] | limb[2q+1]<<16
    one_col_pk = [one_col[2 * q] | (one_col[2 * q + 1] << 16)
                  for q in range(ACC_ROWS_PK)]
    H = NLIMBS // 2

    def kernel(k_ref, p_ref, acc_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            zero = k_ref[0, 0] ^ k_ref[0, 0]         # traced (lanes,) i32
            z32 = zero.astype(jnp.uint32)
            for r in range(ACC_ROWS_PK):
                # compose from 16-bit halves: a weak-typed python-int
                # constant >= 2^31 overflows the jit argument parser
                lo = one_col_pk[r] & 0xFFFF
                hi = one_col_pk[r] >> 16
                row = z32 + lo if lo else z32
                if hi:
                    row = row | ((z32 + hi) << 16)
                for j in range(nb):
                    acc_ref[j, r] = row

        k = k_ref[0, 0]                              # (lanes,) i32
        neg = (k & 1) != 0
        b = k >> 1

        # unpack u16-pair words -> 16 limbs each coordinate
        x = []
        y = []
        for j in range(H):
            wx = p_ref[0, j]
            wy = p_ref[0, H + j]
            x.append(wx & MASK)
            x.append(wx >> 16)
            y.append(wy & MASK)
            y.append(wy >> 16)
        is_inf = (p_ref[0, 2 * H] & 1) != 0

        # signed-digit negation: y := -y on odd keys
        zeros = [x[0] ^ x[0]] * NLIMBS
        ny = _sub_body(F, zeros, y)
        y = [jnp.where(neg, nv, v) for nv, v in zip(ny, y)]

        # masked packed-bucket read (cur = acc[b], per lane)
        A = [[acc_ref[j, r] for r in range(ACC_ROWS_PK)]
             for j in range(nb)]
        cur = list(A[0])
        for j in range(1, nb):
            sel = b == j
            for r in range(ACC_ROWS_PK):
                cur[r] = jnp.where(sel, A[j][r], cur[r])
        unpk = []
        for w in cur:
            unpk.append(w & MASK)
            unpk.append(w >> 16)

        X1 = unpk[:NLIMBS]
        Y1 = unpk[NLIMBS:2 * NLIMBS]
        Z1 = unpk[2 * NLIMBS:]
        X3, Y3, Z3 = _madd_body_ec(curve, (X1, Y1, Z1), (x, y), is_inf)
        flat = X3 + Y3 + Z3
        new = [flat[2 * q] | (flat[2 * q + 1] << 16)
               for q in range(ACC_ROWS_PK)]

        # masked packed write-back
        for j in range(nb):
            sel = b == j
            for r in range(ACC_ROWS_PK):
                acc_ref[j, r] = jnp.where(sel, new[r], A[j][r])

    return pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, 1, lanes), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NROWS_PK, lanes), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, ACC_ROWS_PK, lanes),
                               lambda s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, ACC_ROWS_PK, lanes),
                                       jnp.uint32),
    )(keys_t.reshape(S, 1, lanes), table_t)


def _stream_bucket_fallback(curve: Curve, keys_t, table_t, nb: int,
                            lanes: int):
    """jnp mirror of the kernel semantics (CPU tests)."""
    F = curve.Fq
    H = NLIMBS // 2

    def unpack(words):                    # (lanes, 8) -> (lanes, 16)
        lo = words & MASK
        hi = words >> 16
        return jnp.stack([lo, hi], axis=-1).reshape(words.shape[0], NLIMBS)

    def step(acc, inp):
        k, rows = inp                     # (lanes,), (18, lanes)
        rows = rows.T                     # (lanes, 18)
        x = unpack(rows[:, :H])
        y = unpack(rows[:, H:2 * H])
        inf = rows[:, 2 * H] != 0
        neg = (k & 1) == 1
        y = jnp.where(neg[:, None], F.sub(jnp.zeros_like(y), y), y)
        b = k >> 1                        # (lanes,)
        cur = jnp.take_along_axis(
            acc, b[None, :, None, None], axis=0)[0]   # (lanes, 3, L)
        new = curve.madd(cur, jnp.stack([x, y], axis=-2), inf)
        hit = jnp.arange(nb)[:, None] == b[None, :]
        acc = jnp.where(hit[..., None, None], new[None], acc)
        return acc, None

    acc0 = curve.identity((nb, lanes))
    acc, _ = jax.lax.scan(step, acc0, (keys_t, table_t))
    # (nb, lanes, 3, L) -> (nb, 48, lanes)
    return jnp.transpose(acc.reshape(nb, lanes, ACC_ROWS), (0, 2, 1))


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def stream_bucket_sums(curve: Curve, keys_t, table_t, c: int, lanes: int):
    """Per-lane bucket accumulation + cross-lane tree reduction.
    Returns (nb, 3, L) projective bucket sums."""
    from .msm import point_tree_sum
    nb = (1 << (c - 1)) + 1
    if _use_pallas():
        pk = _stream_bucket_pallas(curve, keys_t, table_t, nb, lanes)
        # unpack u16-pair words -> (nb, 48, lanes)
        lo = pk & jnp.uint32(MASK)
        hi = pk >> 16
        part = jnp.stack([lo, hi], axis=2).reshape(nb, ACC_ROWS, lanes)
    else:
        part = _stream_bucket_fallback(curve, keys_t, table_t, nb, lanes)
    # (nb, 48, lanes) -> (lanes, nb, 3, L), log-depth reduce over lanes
    pts = jnp.transpose(part, (2, 0, 1)).reshape(lanes, nb, 3, NLIMBS)
    return point_tree_sum(curve, pts, axis=0)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm_stream_baked(curve: Curve, scalars_mont, table_t, c: int,
                     lanes: int):
    """Fixed-base MSM against a baked stream-layout window table."""
    keys_t = stream_keys(curve, scalars_mont, c, lanes)
    buckets = stream_bucket_sums(curve, keys_t, table_t, c, lanes)
    return weighted_bucket_fold(curve, buckets)


def _stream_bucket_windows_pallas(curve: Curve, keys_t, table_t, nw: int,
                                  nb: int, lanes: int):
    """Per-window streaming bucket accumulation over an UNBAKED n-row
    table: grid (nw, S) — window w re-streams the same table against its
    own digit row and flushes its own (nb, 24, lanes) bucket block.

    Same streamed bytes and same madd count as the baked kernel (the
    baked table is nw*n rows streamed once; this is n rows streamed nw
    times), but the resident table is n rows (75 MB at k=20) instead of
    nw*n (3.2 GB) — the difference between fitting HBM beside the k>=20
    prover state and not.  Costs per-window folds + a Horner combine
    (~5% at k=20)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..curves.pallas_ec import _madd_body_ec
    from ..fields.pallas_ops import _sub_body

    F = curve.Fq
    S = table_t.shape[0]
    assert keys_t.shape[0] == nw * S
    one_col = _one_mont_col(curve)
    one_col_pk = [one_col[2 * q] | (one_col[2 * q + 1] << 16)
                  for q in range(ACC_ROWS_PK)]
    H = NLIMBS // 2

    def kernel(k_ref, p_ref, acc_ref):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            zero = k_ref[0, 0] ^ k_ref[0, 0]
            z32 = zero.astype(jnp.uint32)
            for r in range(ACC_ROWS_PK):
                lo = one_col_pk[r] & 0xFFFF
                hi = one_col_pk[r] >> 16
                row = z32 + lo if lo else z32
                if hi:
                    row = row | ((z32 + hi) << 16)
                for j in range(nb):
                    acc_ref[0, j, r] = row

        k = k_ref[0, 0]
        neg = (k & 1) != 0
        b = k >> 1
        x = []
        y = []
        for j in range(H):
            wx = p_ref[0, j]
            wy = p_ref[0, H + j]
            x.append(wx & MASK)
            x.append(wx >> 16)
            y.append(wy & MASK)
            y.append(wy >> 16)
        is_inf = (p_ref[0, 2 * H] & 1) != 0
        zeros = [x[0] ^ x[0]] * NLIMBS
        ny = _sub_body(F, zeros, y)
        y = [jnp.where(neg, nv, v) for nv, v in zip(ny, y)]

        A = [[acc_ref[0, j, r] for r in range(ACC_ROWS_PK)]
             for j in range(nb)]
        cur = list(A[0])
        for j in range(1, nb):
            sel = b == j
            for r in range(ACC_ROWS_PK):
                cur[r] = jnp.where(sel, A[j][r], cur[r])
        unpk = []
        for w in cur:
            unpk.append(w & MASK)
            unpk.append(w >> 16)
        X3, Y3, Z3 = _madd_body_ec(
            curve, (unpk[:NLIMBS], unpk[NLIMBS:2 * NLIMBS],
                    unpk[2 * NLIMBS:]), (x, y), is_inf)
        flat = X3 + Y3 + Z3
        new = [flat[2 * q] | (flat[2 * q + 1] << 16)
               for q in range(ACC_ROWS_PK)]
        for j in range(nb):
            sel = b == j
            for r in range(ACC_ROWS_PK):
                acc_ref[0, j, r] = jnp.where(sel, new[r], A[j][r])

    return pl.pallas_call(
        kernel,
        grid=(nw, S),
        in_specs=[
            pl.BlockSpec((1, 1, lanes), lambda w, s: (w * S + s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NROWS_PK, lanes), lambda w, s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nb, ACC_ROWS_PK, lanes),
                               lambda w, s: (w, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw, nb, ACC_ROWS_PK, lanes),
                                       jnp.uint32),
    )(keys_t.reshape(nw * S, 1, lanes), table_t)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm_stream_unbaked(curve: Curve, scalars_mont, table_t, c: int,
                       lanes: int):
    """Fixed-base MSM against an UNBAKED n-row stream table: per-window
    bucket kernels + vmapped weighted folds + Horner over windows."""
    from .msm import point_tree_sum
    nw = n_windows_for(curve.Fr, c)
    nb = (1 << (c - 1)) + 1
    # window-ALIGNED key layout: each window's digit row padded to S*lanes
    # so window w occupies key rows [w*S, (w+1)*S) (matches the kernel's
    # index map); pad digits are 0 -> bucket 0 = weight 0
    keys, signs = _signed_digits(curve.Fr, scalars_mont, c)   # (nw, n)
    packed = keys * 2 + signs.astype(jnp.int32)
    n = packed.shape[1]
    S = table_t.shape[0]
    pad = S * lanes - n
    if pad:
        packed = jnp.concatenate(
            [packed, jnp.zeros((nw, pad), jnp.int32)], axis=1)
    keys_t = packed.reshape(nw * S, lanes)
    if _use_pallas():
        pk = _stream_bucket_windows_pallas(curve, keys_t, table_t, nw, nb,
                                           lanes)
        lo = pk & jnp.uint32(MASK)
        hi = pk >> 16
        part = jnp.stack([lo, hi], axis=3).reshape(
            nw, nb, ACC_ROWS, lanes)
    else:
        # vmap over windows: a python loop of per-window scans would
        # inline nw copies of the scan into one program (CPU compile blowup)
        part = jax.vmap(
            lambda kw: _stream_bucket_fallback(curve, kw, table_t, nb,
                                               lanes)
        )(keys_t.reshape(nw, S, lanes))           # (nw, nb, 48, lanes)
    pts = jnp.transpose(part, (3, 0, 1, 2)).reshape(
        lanes, nw, nb, 3, NLIMBS)
    buckets = point_tree_sum(curve, pts, axis=0)  # (nw, nb, 3, L)
    per_window = jax.vmap(
        lambda b: weighted_bucket_fold(curve, b))(buckets)

    def horner(i, acc):
        for _ in range(c):
            acc = curve.double(acc)
        return curve.add(acc, per_window[nw - 1 - i])

    return jax.lax.fori_loop(0, nw, horner, curve.identity(()))


def pack_base_stream_table(curve: Curve, points, lanes: int):
    """(n, 3, L) projective points -> (ceil(n/lanes), 18, lanes) unbaked
    stream table (window factor NOT applied)."""
    aff = curve.batch_normalize(points)
    inf = curve.is_identity(points)
    rows = pack_stream_rows(aff[:, :2, :], inf)
    S = rows.shape[0]
    pad = (-S) % lanes
    if pad:
        pad_rows = jnp.zeros((pad, NROWS_PK), jnp.uint32
                             ).at[:, 2 * (NLIMBS // 2)].set(1)
        rows = jnp.concatenate([rows, pad_rows], axis=0)
    return to_stream_layout(rows, lanes)


def bake_stream_table(curve: Curve, points, c: int, lanes: int,
                      max_chunk_rows: int = 1 << 22):
    """[2^(c*w)]P_i for all windows, normalized to affine, packed to
    18-word rows, laid out for sequential streaming.  Built in window
    chunks to bound the projective/normalization transient.

    Returns (S//lanes, 18, lanes) u32 with S = ceil(nw*n/lanes)*lanes.
    Padding rows are marked infinity."""
    n = points.shape[0]
    nw = n_windows_for(curve.Fr, c)
    wc = max(1, min(nw, max_chunk_rows // max(n, 1)))

    @functools.partial(jax.jit, static_argnums=())
    def chunk_rows(pts):
        aff = curve.batch_normalize(pts.reshape(-1, 3, NLIMBS))
        inf = curve.is_identity(pts.reshape(-1, 3, NLIMBS))
        return pack_stream_rows(aff[:, :2, :], inf)

    @functools.partial(jax.jit, static_argnums=(1,))
    def advance(pts, steps):
        return jax.lax.fori_loop(0, steps, lambda i, a: curve.double(a),
                                 pts)

    @functools.partial(jax.jit, static_argnums=(1,))
    def expand(pts, m):
        def body(cur, _):
            return advance(cur, c), cur
        _, stacked = jax.lax.scan(body, pts, None, length=m)
        return stacked                      # (m, n, 3, L)

    out = []
    cur = points
    for w0 in range(0, nw, wc):
        m = min(wc, nw - w0)
        stacked = expand(cur, m)
        out.append(chunk_rows(stacked))
        if w0 + m < nw:
            cur = advance(stacked[-1], c)
        del stacked
    rows = jnp.concatenate(out, axis=0)
    S = rows.shape[0]
    pad = (-S) % lanes
    if pad:
        pad_rows = jnp.zeros((pad, NROWS_PK), jnp.uint32
                             ).at[:, 2 * (NLIMBS // 2)].set(1)
        rows = jnp.concatenate([rows, pad_rows], axis=0)
    return to_stream_layout(rows, lanes)


def auto_c_stream(n: int) -> int:
    """Window width for the streaming kernel: bounded by VMEM (the packed
    per-lane bucket array is (2^(c-1)+1) x 24 x lanes x 4B), and below
    that by the bucket-RMW-traffic / window-count trade.  Measured on v5e
    at k=18 (packed accumulators, 1024 lanes): c=6 -> 101 ms (2.60 M
    pts/s), c=7 -> 108 ms, c=8 fails VMEM; unpacked was c=6 124 ms /
    c=7 145 ms.  Fewer windows lose to the nb-proportional RMW traffic,
    so c=6 is the sweet spot."""
    import os
    env = os.environ.get("HALO2_TPU_STREAM_C")
    if env:
        return int(env)
    return 6 if n >= (1 << 10) else 5


class StreamMSM:
    """Drop-in fixed-base MSM engine (CachedMSM contract) built on the
    streaming scatter-bucket kernel.  Two descriptor shapes:

    - BAKED (nw*n rows <= max_baked_rows, ~k<=18): window factors
      pre-doubled in, one shared bucket space, 72 B/row * nw*n in HBM
      (0.81 GB at k=18/c=6).
    - UNBAKED (k>=19): n-row table (75 MB at k=20), per-window kernel
      passes + Horner — same streamed bytes and madd count, tiny fold
      overhead, and it coexists with the k>=20 prover state in HBM."""

    def __init__(self, curve: Curve, points, c: int | None = None,
                 lanes: int | None = None,
                 max_baked_rows: int = 1 << 24):
        # 2^24 stream rows = 1.2 GB at 72 B/row: k<=18 bakes (0.81 GB),
        # k>=19 streams the n-row table per window instead
        self.curve = curve
        self.n = n = points.shape[0]
        self.c = c = auto_c_stream(n) if c is None else c
        self.lanes = lanes = _lanes_stream() if lanes is None else lanes
        nw = n_windows_for(curve.Fr, c)
        self.baked = nw * n <= max_baked_rows
        from ..aot import aot
        salt = f"{curve.name}-stream-c{c}-l{lanes}-n{n}"
        if self.baked:
            self.table = aot(
                jax.jit(lambda p: bake_stream_table(curve, p, c, lanes)),
                "msm_stream_table", salt)(points)
            self._run = aot(
                jax.jit(lambda s, t: msm_stream_baked(
                    curve, s, t, c, lanes)),
                "msm_stream_run", salt)
        else:
            self.table = aot(
                jax.jit(lambda p: pack_base_stream_table(curve, p, lanes)),
                "msm_stream_base_table", salt)(points)
            self._run = aot(
                jax.jit(lambda s, t: msm_stream_unbaked(
                    curve, s, t, c, lanes)),
                "msm_stream_unbaked_run", salt)

    @property
    def wbases(self):
        return self.table

    def __call__(self, scalars_mont):
        n = scalars_mont.shape[0]
        if n != self.n:
            # shorter columns: zero-pad (digit 0 -> bucket 0 = weight 0)
            scalars_mont = jnp.concatenate(
                [scalars_mont,
                 jnp.zeros((self.n - n, NLIMBS), jnp.uint32)], axis=0)
        return self._run(scalars_mont, self.table)
