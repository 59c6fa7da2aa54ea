"""Host-side MSM over Python big ints for VERIFIER-scale inputs.

The reference's verifier is explicitly the cheap side ("verification is
cheap", halo2_backend/src/poly/kzg/strategy.rs:140-143): its deferred MSMs
have tens of terms.  Dispatching those to the device costs a fresh
kernel compile per padded shape (minutes through a remote-TPU tunnel) for
micro-seconds of arithmetic — a category error.  This module evaluates them
on the host: Jacobian-coordinate Pippenger over Python ints, fast enough
(<0.1 s for 128 terms) that the device is reserved for prover-scale MSMs.

Curves here are short Weierstrass with a=0 (BN254 G1, Pallas, Vesta), so
the doubling formula needs no `a` term.  Points are affine int pairs
(`None` = identity), matching the verifier accumulators' host
representation (commit/kzg.py MSMKZG, commit/ipa.py MSMIPA).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

Affine = Optional[Tuple[int, int]]


def _jac_double(P, p: int):
    """Jacobian doubling, a=0: 2*(X,Y,Z)."""
    X, Y, Z = P
    if not Y:
        return (0, 1, 0)
    A = X * X % p
    B = Y * Y % p
    C = B * B % p
    D = 2 * ((X + B) * (X + B) - A - C) % p
    E = 3 * A % p
    F = E * E % p
    X3 = (F - 2 * D) % p
    Y3 = (E * (D - X3) - 8 * C) % p
    Z3 = 2 * Y * Z % p
    return (X3, Y3, Z3)


def _jac_add(P, Q, p: int):
    """General Jacobian addition (handles doubling/identity cases)."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    if not Z1:
        return Q
    if not Z2:
        return P
    Z1Z1 = Z1 * Z1 % p
    Z2Z2 = Z2 * Z2 % p
    U1 = X1 * Z2Z2 % p
    U2 = X2 * Z1Z1 % p
    S1 = Y1 * Z2 * Z2Z2 % p
    S2 = Y2 * Z1 * Z1Z1 % p
    if U1 == U2:
        if S1 != S2:
            return (0, 1, 0)
        return _jac_double(P, p)
    H = (U2 - U1) % p
    I = 4 * H * H % p
    J = H * I % p
    r = 2 * (S2 - S1) % p
    V = U1 * I % p
    X3 = (r * r - J - 2 * V) % p
    Y3 = (r * (V - X3) - 2 * S1 * J) % p
    Z3 = ((Z1 + Z2) * (Z1 + Z2) - Z1Z1 - Z2Z2) % p * H % p
    return (X3, Y3, Z3)


def _jac_add_affine(P, Q_aff, p: int):
    """Mixed addition P (Jacobian) + Q (affine, Z=1)."""
    X1, Y1, Z1 = P
    if not Z1:
        return (Q_aff[0], Q_aff[1], 1)
    x2, y2 = Q_aff
    Z1Z1 = Z1 * Z1 % p
    U2 = x2 * Z1Z1 % p
    S2 = y2 * Z1 * Z1Z1 % p
    if U2 == X1:
        if S2 != Y1:
            return (0, 1, 0)
        return _jac_double(P, p)
    H = (U2 - X1) % p
    HH = H * H % p
    I = 4 * HH % p
    J = H * I % p
    r = 2 * (S2 - Y1) % p
    V = X1 * I % p
    X3 = (r * r - J - 2 * V) % p
    Y3 = (r * (V - X3) - 2 * Y1 * J) % p
    Z3 = (Z1 + H) * (Z1 + H) % p
    Z3 = (Z3 - Z1Z1 - HH) % p
    return (X3, Y3, Z3)


def _to_affine(P, p: int) -> Affine:
    X, Y, Z = P
    if not Z:
        return None
    zinv = pow(Z, p - 2, p)
    zinv2 = zinv * zinv % p
    return (X * zinv2 % p, Y * zinv2 * zinv % p)


def host_msm(curve, scalars: Sequence[int],
             points: Sequence[Affine]) -> Affine:
    """sum scalars[i] * points[i] -> affine ints (None = identity).

    Pippenger bucket method with window size adapted to n; Jacobian
    accumulation throughout, one inversion at the end.  Replaces the
    device dispatch for verifier-scale MSMs (best_multiexp's small-n
    regime, halo2_middleware/src/zal.rs:137)."""
    p = curve.Fq.p
    q = curve.Fr.p
    pairs = [(s % q, pt) for s, pt in zip(scalars, points)
             if pt is not None and s % q]
    if not pairs:
        return None
    n = len(pairs)
    if n == 1:
        s, pt = pairs[0]
        return _to_affine(_scalar_mul((pt[0], pt[1], 1), s, p), p)
    c = 3 if n < 4 else max(3, n.bit_length() - 2)
    c = min(c, 8)   # keep the per-window bucket-fold loop bounded
    nbits = q.bit_length()
    n_windows = -(-nbits // c)
    acc = (0, 1, 0)
    for w in range(n_windows - 1, -1, -1):
        for _ in range(c):
            acc = _jac_double(acc, p)
        buckets = {}
        shift = w * c
        mask = (1 << c) - 1
        for s, pt in pairs:
            d = (s >> shift) & mask
            if d:
                cur = buckets.get(d)
                buckets[d] = (pt[0], pt[1], 1) if cur is None \
                    else _jac_add_affine(cur, pt, p)
        # running-sum fold: sum_d d * bucket[d]
        running = (0, 1, 0)
        window_sum = (0, 1, 0)
        for d in range((1 << c) - 1, 0, -1):
            b = buckets.get(d)
            if b is not None:
                running = _jac_add(running, b, p)
            window_sum = _jac_add(window_sum, running, p)
        acc = _jac_add(acc, window_sum, p)
    return _to_affine(acc, p)


def _scalar_mul(P, k: int, p: int):
    acc = (0, 1, 0)
    add = P
    while k:
        if k & 1:
            acc = _jac_add(acc, add, p)
        add = _jac_double(add, p)
        k >>= 1
    return acc
