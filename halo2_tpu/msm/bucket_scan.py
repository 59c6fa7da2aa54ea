"""TPU-native Pippenger bucket accumulation via sort + segmented scan.

Replaces the emission/compaction MSM pipeline with a design built around two
measured TPU facts: (1) `lax.sort` carrying the point limbs as value columns
moves the data at near-sort speed, so sort-by-digit costs barely more than
sorting the digits alone — no separate 2M-row gather; (2) a fused Pallas
kernel can stream sorted (digit, point) tiles from HBM and keep the running
accumulator in VMEM scratch, so the only sequential state is one register
per lane.

Pipeline (the reference's `best_multiexp`, halo2_middleware/src/zal.rs:137):

  digits --lax.sort(key + 33 value cols)--> sorted runs, one run per bucket
         --segmented madd scan (Pallas)---> per-lane final partial sums
         --recursive scan over lane sums--> per-bucket sums B_beta
         --tail fix (gather <= keys*block rows, masked fold)
         --double suffix sum-------------> sum beta * B_beta

Every bucket's points form a contiguous run after the sort, so a lane
(a contiguous chunk of `block` sorted elements) contains at most
(transitions inside it + 1) runs; per-lane partials that end at a lane
boundary surface in the lane-final output, and the <= n_keys partials that
end mid-lane ("tails") are recomputed exactly from the <= block trailing
elements of each run — no full accumulator trace is ever materialized.

The scan is always-correct for adversarial scalar distributions (a single
bucket may own every element); completeness of the Renes-Costello formulas
means no add can mis-handle equal/inverse/identity operands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.curve import Curve
from ..fields.field import NLIMBS, _use_pallas

def _lanes() -> int:
    """Lane-tile width for the Pallas scan kernel.  Each grid step runs one
    full mixed addition over this many independent lanes; wider tiles
    amortize op issue + pipeline latency over more VPU registers (the scan
    is issue-bound, not HBM-bound).  Env-tunable for calibration."""
    import os
    try:
        return int(os.environ.get("HALO2_TPU_SCAN_LANES", "1024"))
    except ValueError:
        return 1024


LANES = 1024     # back-compat alias; the kernel reads _lanes()
SENTINEL_KEY = 1 << 30   # sorts after every real bucket key; marked inf


# ----------------------------------------------------------------------
# segmented scan level (Pallas kernel + jnp fallback)
# ----------------------------------------------------------------------

def _lift_affine(curve, xy, inf):
    """(…, 2, L) affine + inf mask -> projective (identity where inf)."""
    return curve.from_affine_coords(xy, inf)


def _as_xy(p):
    """(…, 2L) flat affine limb rows -> (…, 2, L) coordinate view."""
    return p.reshape(p.shape[:-1] + (2, NLIMBS))


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _scan_level(curve: Curve, keys, pts, inf, block: int, affine: bool,
                packed: bool = False):
    """One segmented-scan level.

    keys: (M,) int32, non-decreasing; M divisible by block.
    pts:  (M, 2*L) flat affine Montgomery limb rows if `affine` else
          (M, 3, L) projective.
    inf:  (M,) bool — identity flags (only consulted when affine).
    packed: signed-digit MSM mode — keys are 2*bucket + sign; segmentation
          uses bucket = key >> 1 and the kernel negates y (y := -y) on odd
          keys, so the sign needs NO separate per-element gather and the
          bucket space does not grow.

    Returns (finals, lane_keys): finals (M//block, 3, L) — the running sum of
    the LAST run-piece in each lane; lane_keys (M//block,) — that run's
    (unpacked) key.
    """
    M = keys.shape[0]
    nb = M // block
    assert nb * block == M

    if _use_pallas() and nb % 8 == 0 and nb >= 8:
        return _scan_level_pallas(curve, keys, pts, inf, block, affine,
                                  packed)
    if affine and packed:
        pts = _negate_y_where(curve.Fq, pts, (keys & 1) == 1)
        keys = keys >> 1

    # jnp fallback: lax.scan over the block dimension
    kT = jnp.moveaxis(keys.reshape(nb, block), 1, 0)          # (block, nb)
    pT = jnp.moveaxis(pts.reshape((nb, block) + pts.shape[1:]), 1, 0)
    iT = jnp.moveaxis(inf.reshape(nb, block), 1, 0)

    def step(carry, x):
        seg, acc = carry
        k, p, is_inf = x
        fresh = k != seg
        if affine:
            started = _lift_affine(curve, _as_xy(p), is_inf)
            added = curve.madd(acc, _as_xy(p), is_inf)
        else:
            started = p
            added = curve.add(acc, p)
        acc = jnp.where(fresh[..., None, None], started, added)
        return (k, acc), None

    init = (jnp.full((nb,), -2, jnp.int32), curve.identity((nb,)))
    (lane_keys, finals), _ = jax.lax.scan(step, init, (kT, pT, iT))
    return finals, lane_keys


def _scan_level_pallas(curve, keys, pts, inf, block, affine, packed=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..curves.pallas_ec import _madd_body_ec, _add_body_ec
    from ..fields.pallas_ops import _mont_mul_body, _sub_body  # noqa: F401

    M = keys.shape[0]
    nb = M // block
    LANES = _lanes()
    # Mosaic tiling: the lane (last) dim of a block must be a multiple of
    # 128 or equal to the whole array dim.  nb <= LANES: one tile, lanes=nb
    # (equal-to-array).  Else pad nb to a multiple of 128 with sentinel
    # lanes (key = SENTINEL_KEY > any bucket key, so the stream stays
    # sorted for the next level's searchsorted) and pick a dividing tile.
    if nb > LANES:
        # pad to a multiple of 512 so tiles keep >= 4 full sublane groups
        # (a 128-lane tile runs the whole limb kernel at 1/8 VPU width)
        pad_nb = (-nb) % 512
        if pad_nb:
            keys = jnp.concatenate(
                [keys, jnp.full((pad_nb * block,), SENTINEL_KEY, jnp.int32)])
            pts = jnp.concatenate(
                [pts, jnp.zeros((pad_nb * block,) + pts.shape[1:],
                                pts.dtype)])
            inf = jnp.concatenate(
                [inf, jnp.ones((pad_nb * block,), jnp.bool_)])
            nb += pad_nb
            M = nb * block
        lanes = LANES
        while nb % lanes:
            lanes //= 2
    else:
        lanes = nb
    n_tiles = nb // lanes
    F = curve.Fq
    ncoord = 2 if affine else 3
    nrows = ncoord * NLIMBS + 1    # +1 row: flags (affine) / unused

    # layout: (block, nrows, nb) — step-major so each grid step streams one
    # (1, nrows, lanes) tile; limb rows map onto sublanes, lanes onto lanes.
    flat = pts.reshape(nb, block, ncoord * NLIMBS)
    extra = (inf if affine else jnp.zeros_like(inf)).astype(jnp.uint32)
    flat = jnp.concatenate(
        [flat, extra.reshape(nb, block, 1)], axis=-1)
    pT = jnp.transpose(flat, (1, 2, 0))                    # (block, nrows, nb)
    kT = jnp.moveaxis(keys.reshape(nb, block), 1, 0)       # (block, nb)
    kT = kT.reshape(block, 1, nb)

    one_mont = [np.uint32(int(x)) for x in curve.Fq._one_mont]

    def kernel(k_ref, p_ref, fin_ref, lk_ref, acc_ref, seg_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            seg_ref[0] = jnp.full((lanes,), -2, jnp.int32)

        k = k_ref[0, 0]                                    # (lanes,) i32
        if packed:
            neg = (k & 1) != 0
            k = k >> 1
        fresh = k != seg_ref[0]
        X1 = [acc_ref[i] for i in range(NLIMBS)]
        Y1 = [acc_ref[NLIMBS + i] for i in range(NLIMBS)]
        Z1 = [acc_ref[2 * NLIMBS + i] for i in range(NLIMBS)]
        if affine:
            x2 = [p_ref[0, i] for i in range(NLIMBS)]
            y2 = [p_ref[0, NLIMBS + i] for i in range(NLIMBS)]
            flags = p_ref[0, 2 * NLIMBS]
            is_inf = (flags & 1) != 0
            if packed:
                zeros = [jnp.zeros((lanes,), jnp.uint32)] * NLIMBS
                ny = _sub_body(F, zeros, y2)
                y2 = [jnp.where(neg, nv, v) for nv, v in zip(ny, y2)]
            X3, Y3, Z3 = _madd_body_ec(curve, (X1, Y1, Z1), (x2, y2), is_inf)
            zero = jnp.zeros((lanes,), jnp.uint32)
            sx = [jnp.where(is_inf, zero, v) for v in x2]
            sy = [jnp.where(is_inf, jnp.full((lanes,), o), v)
                  for o, v in zip(one_mont, y2)]
            sz = [jnp.where(is_inf, zero, jnp.full((lanes,), o))
                  for o in one_mont]
        else:
            sx = [p_ref[0, i] for i in range(NLIMBS)]
            sy = [p_ref[0, NLIMBS + i] for i in range(NLIMBS)]
            sz = [p_ref[0, 2 * NLIMBS + i] for i in range(NLIMBS)]
            X3, Y3, Z3 = _add_body_ec(curve, (X1, Y1, Z1), (sx, sy, sz))
        for i in range(NLIMBS):
            acc_ref[i] = jnp.where(fresh, sx[i], X3[i])
            acc_ref[NLIMBS + i] = jnp.where(fresh, sy[i], Y3[i])
            acc_ref[2 * NLIMBS + i] = jnp.where(fresh, sz[i], Z3[i])
        seg_ref[0] = k
        # revisited output blocks: last write (t == block-1) is what lands
        for i in range(3 * NLIMBS):
            fin_ref[0, i] = acc_ref[i]
        lk_ref[0, 0] = k

    grid = (n_tiles, block)
    finals, lane_keys = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, lanes), lambda l, t: (t, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nrows, lanes), lambda l, t: (t, 0, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3 * NLIMBS, lanes), lambda l, t: (0, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lanes), lambda l, t: (0, 0, l),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 3 * NLIMBS, nb), jnp.uint32),
            jax.ShapeDtypeStruct((1, 1, nb), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3 * NLIMBS, lanes), jnp.uint32),
            pltpu.VMEM((1, lanes), jnp.int32),
        ],
    )(kT, pT)
    finals = jnp.transpose(finals[0], (1, 0)).reshape(nb, 3, NLIMBS)
    return finals, lane_keys[0, 0]


# ----------------------------------------------------------------------
# tails: per-key partials that end mid-lane, recomputed from raw elements
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6, 7))
def _tails(curve: Curve, keys, pts, inf, block: int, n_keys: int,
           affine: bool, packed: bool = False):
    """For each key k, the sum of the trailing run elements that do NOT end
    at a lane boundary: elements [max(start_k, block*floor((end_k-1)/block)),
    end_k).  Returns (n_keys, 3, L) projective points (identity when the
    run is empty or ends lane-aligned).  pts is (M, 2L) flat affine when
    `affine` else (M, 3, L) projective."""
    M = keys.shape[0]
    seg_keys = (keys >> 1) if packed else keys
    s = jnp.searchsorted(seg_keys, jnp.arange(n_keys + 1, dtype=jnp.int32))
    start, end = s[:-1], s[1:]
    nonempty = end > start
    aligned = (end % block) == 0
    lane_start = ((end - 1) // block) * block
    a = jnp.maximum(start, lane_start)
    take = jnp.where(nonempty & ~aligned, end - a, 0)     # (n_keys,) <= block
    pos = a[:, None] + jnp.arange(block)[None, :]          # (n_keys, block)
    valid = jnp.arange(block)[None, :] < take[:, None]
    pos = jnp.clip(pos, 0, M - 1)
    flat_pos = pos.reshape(-1)
    g_pts = jnp.take(pts, flat_pos, axis=0)
    g_inf = (jnp.take(inf, flat_pos, axis=0)
             | ~valid.reshape(-1))                         # (n_keys*block,)
    if affine and packed:
        g_par = jnp.take(keys, flat_pos, axis=0) & 1
        g_pts = _negate_y_where(curve.Fq, g_pts, g_par == 1)
    if not affine:
        # the projective scan path trusts the point data (complete formulas,
        # no flag row): invalid rows must BE the identity
        g_pts = jnp.where(g_inf[:, None, None], curve.identity(()), g_pts)

    # each key's tail occupies EXACTLY one block-sized lane of the gathered
    # stream, so one segmented-scan level over it yields the per-key tail
    # sums directly as the lane finals (vs. a block-step lax.scan of madds,
    # which dispatches block sequential adds on a (n_keys,) array)
    nk_pad = -(-n_keys // 8) * 8
    if nk_pad != n_keys:
        extra = (nk_pad - n_keys) * block
        g_pts = jnp.concatenate(
            [g_pts, jnp.zeros((extra,) + g_pts.shape[1:], g_pts.dtype)])
        g_inf = jnp.concatenate([g_inf, jnp.ones((extra,), jnp.bool_)])
    lane_keys_in = jnp.repeat(jnp.arange(nk_pad, dtype=jnp.int32), block)
    finals, _lk = _scan_level(curve, lane_keys_in, g_pts, g_inf, block,
                              affine)
    return finals[:n_keys]


# ----------------------------------------------------------------------
# bucket reduction: sorted (key, point) stream -> per-key sums
# ----------------------------------------------------------------------

def bucket_sums(curve: Curve, keys, pts, inf, n_keys: int, block: int = 64,
                packed: bool = False):
    """Sum points grouped by key.  keys (M,) int32 SORTED non-decreasing —
    plain bucket ids in [0, n_keys), or (packed=True) 2*bucket + sign with
    negation applied in-kernel.  pts (M, 2L) flat affine Montgomery limb
    rows; inf (M,) bool.  Returns (n_keys, 3, L) projective bucket sums."""
    M = keys.shape[0]
    total = curve.identity((n_keys,))
    affine = True
    level = 0
    while M > block:
        pad = (-M) % (block * 8)
        if pad:
            pad_key = 2 * n_keys if packed else n_keys
            keys = jnp.concatenate(
                [keys, jnp.full((pad,), pad_key, jnp.int32)])
            if affine:
                pts = jnp.concatenate(
                    [pts, jnp.zeros((pad, 2 * NLIMBS), jnp.uint32)], axis=0)
            else:
                pts = jnp.concatenate([pts, curve.identity((pad,))], axis=0)
            inf = jnp.concatenate([inf, jnp.ones((pad,), jnp.bool_)])
            M += pad
        t = _tails(curve, keys, pts, inf, block, n_keys, affine, packed)
        total = curve.add(total, t)
        pts, keys = _scan_level(curve, keys, pts, inf, block, affine, packed)
        inf = curve.is_identity(pts) | (keys >= n_keys) | (keys < 0)
        affine = False
        packed = False
        M = keys.shape[0]
        level += 1
        assert level < 8, "bucket_sums failed to converge"

    if affine and packed:
        pts = _negate_y_where(curve.Fq, pts, (keys & 1) == 1)
        keys = keys >> 1

    # final <= block elements: one-hot accumulate over all keys at once
    def step(acc, x):
        k, p, is_inf = x
        hit = (jnp.arange(n_keys) == k) & ~is_inf
        pp = _lift_affine(curve, _as_xy(p), is_inf) if affine else p
        cand = curve.add(acc, jnp.broadcast_to(pp, acc.shape))
        return jnp.where(hit[..., None, None], cand, acc), None

    total, _ = jax.lax.scan(step, total, (keys, pts, inf))
    return total


def weighted_bucket_fold(curve: Curve, buckets):
    """sum_{j>=1} j * B_j (reference folds buckets serially — poly/ipa & kzg
    commit MSMs).

    Small bucket spaces: two suffix-sum passes (Hillis-Steele doubling
    inside one fori_loop so the point-add kernel appears once; W(x) =
    suffix(suffix(x))[0] = sum (i+1)*x_i).  Doubling is n*log n work, so
    large spaces (wide windows) first split j-1 = Q*h + l on a (H, Q) grid:
    sum j*B_j = Q*(W(R) - S(R)) + W(C) with R/C the work-efficient row/col
    tree sums — O(n) adds + two tiny suffix folds."""
    def suffix(arr):
        k = arr.shape[0]
        rows = jnp.arange(k)
        ident = curve.identity((k,))

        def round_(r, x):
            d = jnp.int32(1) << r
            shifted = jnp.where((rows + d < k)[:, None, None],
                                jnp.roll(x, -d, axis=0), ident)
            return curve.add(x, shifted)

        return jax.lax.fori_loop(0, max((k - 1).bit_length(), 1), round_, arr)

    def W(arr):
        return suffix(suffix(arr))[0]

    def tree_sum(arr, axis):
        arr = jnp.moveaxis(arr, axis, 0)
        k = arr.shape[0]
        while k > 1:
            if k % 2:
                arr = jnp.concatenate(
                    [arr, curve.identity((1,) + arr.shape[1:-2])], axis=0)
                k += 1
            arr = curve.add(arr[: k // 2], arr[k // 2:])
            k = arr.shape[0]
        return arr[0]

    b = buckets[1:]               # b[i] = B_{i+1}
    m = b.shape[0]
    if m <= 256:
        return W(b)
    qbits = m.bit_length() // 2
    Q = 1 << qbits
    H = -(-m // Q)
    if H * Q != m:
        b = jnp.concatenate([b, curve.identity((H * Q - m,))], axis=0)
    grid = b.reshape(H, Q, 3, NLIMBS)
    R = tree_sum(grid, 1)                                  # (H, 3, L)
    C = tree_sum(grid, 0)                                  # (Q, 3, L)
    SR = tree_sum(R, 0)                                    # sum of all
    # sum (Qh + l + 1) b_{Qh+l} = Q*(W(R) - S(R)) + W(C)
    acc = curve.add(W(R), curve.neg(SR))
    for _ in range(qbits):
        acc = curve.double(acc)
    return curve.add(acc, W(C))


# ----------------------------------------------------------------------
# MSM entry points
# ----------------------------------------------------------------------

def _digits(Fr, scalars_mont, c: int):
    """(n, L) Montgomery scalars -> (n_windows, n) int32 digit matrix."""
    assert 16 % c == 0
    limbs = Fr.from_mont(scalars_mont)
    n_windows = 256 // c
    digits_per_limb = 16 // c
    w = jnp.arange(n_windows)
    limb_idx = w // digits_per_limb
    shift = (w % digits_per_limb) * c
    return ((limbs[:, limb_idx].astype(jnp.int32) >> shift[None, :])
            & ((1 << c) - 1)).T                            # (n_windows, n)


def n_windows_for(Fr, c: int) -> int:
    """Window count for the signed-digit decomposition: c*nw >= bits+2
    guarantees the top balanced digit absorbs the final carry (the top raw
    digit is < 2^(c-2), so raw+carry < 2^(c-1) and no new carry is born)."""
    return -(-(Fr.p.bit_length() + 2) // c)


def _signed_digits(Fr, scalars_mont, c: int):
    """Balanced (signed) base-2^c decomposition — halves the bucket space:
    scalar = sum_w d_w * 2^(c*w) with d_w in [-2^(c-1), 2^(c-1)-1] (plus the
    non-negative top digit).  Returns (keys, signs): keys (nw, n) int32 =
    |d_w| in [0, 2^(c-1)]; signs (nw, n) bool.  Any 2 <= c <= 16."""
    assert 2 <= c <= 16
    limbs = Fr.from_mont(scalars_mont)                     # (n, 16) uint32
    n = limbs.shape[0]
    nw = n_windows_for(Fr, c)
    limbs = jnp.concatenate(
        [limbs, jnp.zeros((n, 1), jnp.uint32)], axis=1)    # guard limb
    off = np.arange(nw) * c
    li, sh = off // 16, off % 16
    lo = limbs[:, li]
    hi = limbs[:, li + 1]
    raw = (((lo | (hi << 16)) >> sh[None, :])
           & jnp.uint32((1 << c) - 1)).astype(jnp.int32)    # (n, nw)
    half, full = 1 << (c - 1), 1 << c

    # unrolled carry chain (nw <= 64 steps, fused into one XLA kernel —
    # lax.scan pays a dynamic-update-slice round trip per step)
    ds = []
    carry = jnp.zeros((n,), jnp.int32)
    for w in range(nw):
        d = raw[:, w] + carry
        over = d >= half
        ds.append(jnp.where(over, d - full, d))
        carry = over.astype(jnp.int32)
    ds = jnp.stack(ds)                                      # (nw, n)
    return jnp.abs(ds), ds < 0                              # (nw, n) each


def _negate_y_where(Fq, xy, signs):
    """(M, 2L) flat affine rows -> same with y := -y on flagged lanes."""
    x, y = xy[:, :NLIMBS], xy[:, NLIMBS:]
    neg = Fq.sub(jnp.zeros_like(y), y)
    return jnp.concatenate(
        [x, jnp.where(signs[:, None], neg, y)], axis=1)


def pad_width(rows: int) -> int:
    """Lane-padded row width for the affine gather.

    TPU gathers move whole 128-lane tiles per row: a (M, 33) uint32 row
    gather reads the full 512B tile but does unaligned sub-tile writes —
    measured 91 ms for 2^21 rows on v5e vs 22 ms when the rows are padded
    to a full 128-lane tile (and 27 ms at 64).  Pad to 128 lanes while the
    table stays under ~1 GB, 64 under ~2 GB, else store unpadded."""
    if rows * 512 <= (1 << 31):
        return 128
    if rows * 256 <= (1 << 31):
        return 64
    return 2 * NLIMBS + 1


def pack_affine_rows(curve: Curve, aff_xy, inf, pad: int):
    """(n, 2, L) affine Montgomery coords + (n,) inf mask -> (n, pad)
    uint32 rows laid out [x limbs | y limbs | inf | zeros] for tile-aligned
    gathering."""
    n = aff_xy.shape[0]
    flat = aff_xy.reshape(n, 2 * NLIMBS)
    cols = [flat, inf.astype(jnp.uint32)[:, None]]
    extra = pad - (2 * NLIMBS + 1)
    if extra > 0:
        cols.append(jnp.zeros((n, extra), jnp.uint32))
    return jnp.concatenate(cols, axis=1)


def unpack_affine_rows(rows):
    """(M, pad) gathered rows -> ((M, 2L) xy limbs, (M,) inf mask)."""
    return rows[:, : 2 * NLIMBS], rows[:, 2 * NLIMBS] != 0


def sort_perm(keys):
    """(keys_sorted, permutation) via a 2-operand stable sort."""
    n = keys.shape[0]
    return jax.lax.sort([keys, jnp.arange(n, dtype=jnp.int32)], num_keys=1)


@functools.partial(jax.jit, static_argnums=(0, 2))
def packed_digits(curve: Curve, scalars_mont, c: int):
    """(n, L) scalars -> (n_windows, n) int32 packed signed digits
    (|d|*2 + sign), the key stream for `msm_packed_rows`."""
    keys, signs = _signed_digits(curve.Fr, scalars_mont, c)
    return keys * 2 + signs.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm_packed_rows(curve: Curve, packed_keys, padded_rows, c: int,
                    block: int = 16):
    """One sort + segmented-scan reduction over an arbitrary slab of
    (key, base-row) pairs sharing the 2^(c-1)+1 bucket space.  The window
    factor is baked into the rows, so ANY subset of windows reduces
    independently and partial results point-add — the seam that lets
    `CachedMSM` chunk its dispatch at k>=20, where the full 21M-row sort +
    gather working set would not fit HBM alongside the prover state."""
    keys_s, perm = sort_perm(packed_keys.reshape(-1))
    xy, inf_s = unpack_affine_rows(jnp.take(padded_rows, perm, axis=0))
    nb = (1 << (c - 1)) + 1
    buckets = bucket_sums(curve, keys_s, xy, inf_s, nb, block, packed=True)
    return weighted_bucket_fold(curve, buckets)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm_windowed_cached(curve: Curve, scalars_mont, padded_rows, c: int = 13,
                        block: int = 16):
    """Fixed-base MSM against precomputed window bases in AFFINE form.

    padded_rows: (n_windows*n_max, pad) uint32 tile-aligned rows from
    `pack_affine_rows` — the window factor 2^(c*w) is baked into the bases,
    so all windows share one bucket space (the ZAL descriptor-cache seam,
    halo2_middleware/src/zal.rs:78-102).  Balanced signed digits halve the
    bucket space to 2^(c-1)+1 and allow any window width c: negating a
    gathered base (y := -y) is one masked vector pass."""
    n = scalars_mont.shape[0]
    n_windows = n_windows_for(curve.Fr, c)
    pad = padded_rows.shape[1]
    n_max = padded_rows.shape[0] // n_windows
    keys, signs = _signed_digits(curve.Fr, scalars_mont, c)
    if n != n_max:
        padded_rows = padded_rows.reshape(
            n_windows, n_max, pad)[:, :n].reshape(-1, pad)
    # sign packed into the key's low bit: travels through the sort for free
    # and the scan kernel negates by key parity — no per-element sign gather
    packed = (keys * 2 + signs.astype(jnp.int32)).reshape(-1)
    keys_s, perm = sort_perm(packed)
    xy, inf_s = unpack_affine_rows(jnp.take(padded_rows, perm, axis=0))
    nb = (1 << (c - 1)) + 1
    buckets = bucket_sums(curve, keys_s, xy, inf_s, nb, block, packed=True)
    return weighted_bucket_fold(curve, buckets)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm_unbaked_rows(curve: Curve, packed_keys, base_rows, c: int,
                     block: int = 16):
    """Window-chunk MSM over UNBAKED base rows.

    packed_keys: (wc, n) signed-packed digits (|d|*2 + sign) for wc
    consecutive windows; base_rows: (n, pad) tile-aligned affine base
    table with the window factor NOT baked in (the gather indexes
    perm % n).  Each window gets its own tagged bucket space; one sort +
    one scan reduces all wc windows, then per-window weighted folds and a
    Horner combine with c doublings per window.  Returns
    sum_{i<wc} fold_i * 2^(c*i) — the caller scales by 2^(c*w0) when
    combining chunks.

    Replaces the baked `window_bases` tables for large fixed-base MSMs:
    at k=20 the baked tables cost nw*n padded rows resident in HBM
    (5.4 GB per base set at c=13) plus a multi-GB build transient — the
    unbaked table is n rows (0.5 GB), at the price of c doublings per
    window in the fold (trivial)."""
    wc, n = packed_keys.shape
    nb = (1 << (c - 1)) + 1
    bucket = packed_keys >> 1
    sign = packed_keys & 1
    keys = ((bucket + jnp.arange(wc, dtype=jnp.int32)[:, None] * nb) * 2
            + sign).reshape(-1)
    keys_s, perm = sort_perm(keys)
    xy, inf_s = unpack_affine_rows(jnp.take(base_rows, perm % n, axis=0))
    buckets = bucket_sums(curve, keys_s, xy, inf_s, wc * nb, block,
                          packed=True)
    buckets = buckets.reshape(wc, nb, 3, NLIMBS)
    per_window = jax.vmap(
        lambda b: weighted_bucket_fold(curve, b))(buckets)

    def horner(i, acc):
        for _ in range(c):
            acc = curve.double(acc)
        return curve.add(acc, per_window[wc - 1 - i])

    return jax.lax.fori_loop(0, wc, horner, curve.identity(()))


@functools.partial(jax.jit, static_argnums=(0, 2))
def shift_add(curve: Curve, acc, k_doublings: int, part):
    """acc * 2^k_doublings + part (chunk combine for msm_unbaked_rows)."""
    for _ in range(k_doublings):
        acc = curve.double(acc)
    return curve.add(acc, part)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm_variable(curve: Curve, scalars_mont, points, c: int = 8,
                 block: int = 64):
    """Variable-base MSM (the general `best_multiexp`): per-window bucket
    spaces tagged into one key stream, one sort + one scan, then a Horner
    fold over windows with c doublings per step.  Signed digits as above."""
    n = scalars_mont.shape[0]
    n_windows = n_windows_for(curve.Fr, c)
    nb_keys = (1 << (c - 1)) + 1
    keys, signs = _signed_digits(curve.Fr, scalars_mont, c)
    aff = curve.batch_normalize(points)
    inf0 = curve.is_identity(points)
    padded = pack_affine_rows(curve, aff[:, :2, :], inf0, pad_width(n))
    keys = ((keys + jnp.arange(n_windows, dtype=jnp.int32)[:, None]
             * nb_keys) * 2 + signs.astype(jnp.int32)).reshape(-1)
    keys_s, perm = sort_perm(keys)
    # the window-tiled point stream is aff[row % n]; gather straight from
    # the n-row padded affine table instead of materializing the tile
    xy, inf_s = unpack_affine_rows(jnp.take(padded, perm % n, axis=0))
    buckets = bucket_sums(curve, keys_s, xy, inf_s,
                          n_windows * nb_keys, block, packed=True)
    buckets = buckets.reshape(n_windows, nb_keys, 3, NLIMBS)

    # per-window weighted fold, then Horner over windows (high to low)
    per_window = jax.vmap(
        lambda b: weighted_bucket_fold(curve, b))(buckets)

    def horner(w, acc):
        for _ in range(c):
            acc = curve.double(acc)
        return curve.add(acc, per_window[n_windows - 1 - w])

    return jax.lax.fori_loop(0, n_windows, horner, curve.identity(()))
