"""Multi-scalar multiplication (the reference's `best_multiexp` /
ZAL `MsmAccel::msm` seam — halo2_middleware/src/zal.rs:113-177).

TPU-native Pippenger: the scatter-heavy bucket accumulation (which GPUs do
with atomics) is reorganized as  sort-by-digit -> blocked segmented scan ->
compact partials -> segmented combine -> one scatter-SET per bucket, so every
step is either a sort/gather (fast on TPU) or a batched branchless EC add over
thousands of lanes.  Work is n point-adds per window (work-optimal), with
log-depth combines for the small partial/bucket arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.curve import Curve
from ..fields.field import NLIMBS


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


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def pippenger_msm(curve: Curve, scalars_mont, points, c: int = 8,
                  block: int = 256):
    """MSM via windowed bucket method.

    scalars_mont: (n, NLIMBS) scalar-field elements (Montgomery form)
    points:       (n, 3, NLIMBS) Jacobian points
    c:            window bits (must divide 16)
    returns a single Jacobian point (3, NLIMBS).
    """
    assert 16 % c == 0
    Fr = curve.Fr
    n = scalars_mont.shape[0]
    n_windows = 256 // c
    limbs = Fr.from_mont(scalars_mont)            # canonical 16-bit limbs
    digits_per_limb = 16 // c

    # pad to a multiple of `block`; padded entries get digit 0 (skipped)
    nb = -(-n // block)
    n_pad = nb * block
    if n_pad != n:
        limbs = jnp.concatenate(
            [limbs, jnp.zeros((n_pad - n, NLIMBS), jnp.uint32)], axis=0)
        points = jnp.concatenate(
            [points, curve.identity((n_pad - n,))], axis=0)

    def window_digits(w):
        # w is a traced scalar so the whole window body compiles once and is
        # scanned over the 256/c windows
        limb = jnp.take(limbs, w // digits_per_limb, axis=1).astype(jnp.int32)
        shift = (w % digits_per_limb) * c
        return (limb >> shift) & ((1 << c) - 1)      # (n_pad,) int32

    m_max = nb + (1 << c) + 2   # tight bound on emitted partials (see below)

    def window_sum(w):
        d = window_digits(w)
        order = jnp.argsort(d, stable=True)
        ds = d[order].reshape(nb, block)
        Ps = jnp.take(points, order, axis=0).reshape(nb, block, 3, NLIMBS)

        # ---- blocked segmented accumulation: `block` sequential steps,
        # each a batched EC add over nb lanes (work = n adds total)
        ds_t = jnp.moveaxis(ds, 1, 0)               # (block, nb)
        Ps_t = jnp.moveaxis(Ps, 1, 0)               # (block, nb, 3, L)

        def step(carry, inp):
            seg, acc = carry
            dt, pt = inp
            fresh = dt != seg
            emit_digit = jnp.where(fresh, seg, -1)
            emit_point = acc
            acc = jnp.where(fresh[..., None, None], pt, curve.add(acc, pt))
            return (dt, acc), (emit_digit, emit_point)

        init = (ds_t[0], curve.identity((nb,)))
        (fin_seg, fin_acc), (e_digit, e_point) = jax.lax.scan(
            step, init, (ds_t, Ps_t))

        # flatten emissions in (block-major, step) order == global digit order
        e_digit = jnp.concatenate(
            [jnp.moveaxis(e_digit, 0, 1), fin_seg[:, None]], axis=1).reshape(-1)
        e_point = jnp.concatenate(
            [jnp.moveaxis(e_point, 0, 1), fin_acc[:, None]], axis=1).reshape(
                -1, 3, NLIMBS)

        # ---- compact: valid partials first (stable), truncate to m_max.
        # Bound: per-block segments sum to nb + (within-block digit
        # boundaries) <= nb + 2**c, so emissions <= nb + 2**c + 1.
        perm = jnp.argsort(e_digit < 0, stable=True)[:m_max]
        pd = e_digit[perm]
        pp = e_point[perm]
        m = pd.shape[0]   # = min(m_max, nb * (block + 1))

        # ---- segmented combine across blocks via Hillis-Steele doubling:
        # fori_loop over log2(m) rounds whose body holds ONE batched EC add
        # (dynamic shift via roll+mask), keeping the XLA graph small — both
        # associative_scan and an unrolled python loop inline the EC-add
        # operator once per tree level and explode compile time.
        flags = jnp.concatenate(
            [jnp.array([True]), pd[1:] != pd[:-1]])  # segment starts
        rows = jnp.arange(m)

        def seg_round(r, carry):
            flags, vals = carry
            d = jnp.int32(1) << r
            valid = rows >= d
            pf = jnp.where(valid, jnp.roll(flags, d), False)
            pv = jnp.where(valid[:, None, None], jnp.roll(vals, d, axis=0),
                           curve.identity((m,)))
            added = curve.add(pv, vals)
            vals = jnp.where(flags[..., None, None], vals, added)
            return flags | pf, vals

        log_m = max((m - 1).bit_length(), 1)
        _, summed = jax.lax.fori_loop(0, log_m, seg_round, (flags, pp))
        is_end = jnp.concatenate([pd[:-1] != pd[1:], jnp.array([True])])

        # ---- one scatter-SET per digit (end positions are unique per digit)
        n_buckets = 1 << c
        idx = jnp.where(is_end & (pd > 0), pd, n_buckets)  # junk row at end
        buckets = curve.identity((n_buckets + 1,))
        buckets = buckets.at[idx].set(summed)[1:n_buckets]  # drop 0 and junk

        # ---- sum_j j * B_j = sum_k S_k where S_k = sum_{j>=k} B_j:
        # two applications of a doubling suffix-sum (one add per round)
        def suffix_sums(arr):
            k = arr.shape[0]
            rws = jnp.arange(k)

            def round_(r, a):
                d = jnp.int32(1) << r
                nxt = jnp.where((rws < k - d)[:, None, None],
                                jnp.roll(a, -d, axis=0),
                                curve.identity((k,)))
                return curve.add(a, nxt)

            return jax.lax.fori_loop(0, max((k - 1).bit_length(), 1),
                                     round_, arr)

        return suffix_sums(suffix_sums(buckets))[0]

    # Horner over windows, high to low, as a scan (window body traced once)
    def horner_step(acc, w):
        # identity doubles to identity on iteration 0
        acc = jax.lax.fori_loop(0, c, lambda _, a: curve.double(a), acc)
        return curve.add(acc, window_sum(w)), None

    acc, _ = jax.lax.scan(
        horner_step, curve.identity(()),
        jnp.arange(n_windows - 1, -1, -1, dtype=jnp.int32))
    return acc


@functools.partial(jax.jit, static_argnums=(0, 2))
def window_bases(curve: Curve, points, c: int = 8):
    """Precompute [2^(c*w)]P_i for every window w — the descriptor-caching
    seam of the reference's ZAL (halo2_middleware/src/zal.rs:78-102): fixed
    commitment bases (SRS) are expanded once, after which every MSM needs NO
    sequential doubling chain at all.

    Returns (n_windows, n, 3, NLIMBS)."""
    n_windows = 256 // c

    def body(cur, _):
        nxt = jax.lax.fori_loop(0, c, lambda i, a: curve.double(a), cur)
        return nxt, cur

    _, stacked = jax.lax.scan(body, points, None, length=n_windows)
    return stacked


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def pippenger_msm_windowed(curve: Curve, scalars_mont, wbases, c: int = 8,
                           block: int = 64):
    """MSM against precomputed window bases: all windows' digits form ONE
    flat (digit, point) list over 2^c buckets, so the sequential EC-op chain
    is just `block` scan steps + O(log) combine rounds — independent of n.

    scalars_mont: (n, NLIMBS); wbases: (256/c, n, 3, NLIMBS).
    """
    assert 16 % c == 0
    Fr = curve.Fr
    n = scalars_mont.shape[0]
    n_windows = 256 // c
    assert wbases.shape[0] == n_windows and wbases.shape[1] >= n
    limbs = Fr.from_mont(scalars_mont)           # canonical 16-bit limbs
    digits_per_limb = 16 // c

    # digits (n_windows, n): window w takes bits [w*c, (w+1)*c)
    w_idx = jnp.arange(n_windows)
    limb_idx = w_idx // digits_per_limb
    shift = (w_idx % digits_per_limb) * c
    digits = (limbs[:, limb_idx].astype(jnp.int32) >> shift[None, :]) \
        & ((1 << c) - 1)                         # (n, n_windows)
    flat_d = digits.T.reshape(-1)                # (n_windows * n,)
    flat_p = wbases[:, :n].reshape(-1, 3, NLIMBS)

    total = flat_d.shape[0]
    nb = -(-total // block)
    pad = nb * block - total
    if pad:
        flat_d = jnp.concatenate([flat_d, jnp.zeros((pad,), jnp.int32)])
        flat_p = jnp.concatenate([flat_p, curve.identity((pad,))], axis=0)

    order = jnp.argsort(flat_d, stable=True)
    ds = flat_d[order].reshape(nb, block)
    Ps = jnp.take(flat_p, order, axis=0).reshape(nb, block, 3, NLIMBS)

    ds_t = jnp.moveaxis(ds, 1, 0)
    Ps_t = jnp.moveaxis(Ps, 1, 0)

    def step(carry, inp):
        seg, acc = carry
        dt, pt = inp
        fresh = dt != seg
        emit_digit = jnp.where(fresh, seg, -1)
        emit_point = acc
        acc = jnp.where(fresh[..., None, None], pt, curve.add(acc, pt))
        return (dt, acc), (emit_digit, emit_point)

    init = (ds_t[0], curve.identity((nb,)))
    (fin_seg, fin_acc), (e_digit, e_point) = jax.lax.scan(
        step, init, (ds_t, Ps_t))

    e_digit = jnp.concatenate(
        [jnp.moveaxis(e_digit, 0, 1), fin_seg[:, None]], axis=1).reshape(-1)
    e_point = jnp.concatenate(
        [jnp.moveaxis(e_point, 0, 1), fin_acc[:, None]], axis=1).reshape(
            -1, 3, NLIMBS)

    m_max = nb + (1 << c) + 2
    perm = jnp.argsort(e_digit < 0, stable=True)[:m_max]
    pd = e_digit[perm]
    pp = e_point[perm]
    m = pd.shape[0]

    flags = jnp.concatenate([jnp.array([True]), pd[1:] != pd[:-1]])
    rows = jnp.arange(m)

    def seg_round(r, carry):
        flags, vals = carry
        d = jnp.int32(1) << r
        valid = rows >= d
        pf = jnp.where(valid, jnp.roll(flags, d), False)
        pv = jnp.where(valid[:, None, None], jnp.roll(vals, d, axis=0),
                       curve.identity((m,)))
        added = curve.add(pv, vals)
        vals = jnp.where(flags[..., None, None], vals, added)
        return flags | pf, vals

    _, summed = jax.lax.fori_loop(0, max((m - 1).bit_length(), 1),
                                  seg_round, (flags, pp))
    is_end = jnp.concatenate([pd[:-1] != pd[1:], jnp.array([True])])

    n_buckets = 1 << c
    idx = jnp.where(is_end & (pd > 0), pd, n_buckets)
    buckets = curve.identity((n_buckets + 1,))
    buckets = buckets.at[idx].set(summed)[1:n_buckets]

    def suffix_sums(arr):
        kk = arr.shape[0]
        rws = jnp.arange(kk)

        def round_(r, a):
            d = jnp.int32(1) << r
            nxt = jnp.where((rws < kk - d)[:, None, None],
                            jnp.roll(a, -d, axis=0), curve.identity((kk,)))
            return curve.add(a, nxt)

        return jax.lax.fori_loop(0, max((kk - 1).bit_length(), 1),
                                 round_, arr)

    return suffix_sums(suffix_sums(buckets))[0]


class CachedMSM:
    """Fixed-base MSM engine with resident window bases (the `MsmAccel`
    descriptor API equivalent)."""

    def __init__(self, curve: Curve, points, c: int = 8, block: int = 64):
        self.curve = curve
        self.c = c
        self.block = block
        self.n = points.shape[0]
        self.wbases = window_bases(curve, points, c)

    def __call__(self, scalars_mont):
        n = scalars_mont.shape[0]
        return pippenger_msm_windowed(
            self.curve, scalars_mont, self.wbases[:, :n], self.c, self.block)


def msm(curve: Curve, scalars_mont, points, c: int | None = None):
    """Dispatching MSM (the `best_multiexp` equivalent)."""
    n = int(scalars_mont.shape[0])
    if n == 0:
        return curve.identity(())
    if n <= 32:
        return naive_msm(curve, scalars_mont, points)
    if c is None:
        c = 8 if n >= 1 << 12 else 4
    block = min(256, max(32, 1 << ((n.bit_length() - 1) // 2)))
    return pippenger_msm(curve, scalars_mont, points, c, block)
