"""Fused Pallas TPU kernels for the complete projective group law.

curve.add/double in curve.py lower to many separate field-op dispatches, each
round-tripping every limb through HBM.  These kernels inline the whole
Renes–Costello complete-addition formula (eprint 2015/1060, Algs 7–9, a = 0)
over VMEM-resident limb vectors: one HBM read per point operand, one write
per result.  Completeness means there is no per-lane branching at all —
identity/double/inverse cases all flow through the same straight-line code.

Layout: a batch of N points (..., 3, NLIMBS) is flattened and transposed to
(3*NLIMBS, N) so each limb row occupies full 8x128 VPU tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.field import NLIMBS
from ..fields.pallas_ops import (
    _add_body, _mont_mul_body, _sub_body,
)

TILE = 512   # lanes per grid step; ~40 live field temps * 16 rows * TILE * 4B


def _mul_b3_body(curve, F, x):
    """Multiply limb-vector list by 3b via the same chain as Curve._mul_b3."""
    b3 = curve.b3
    if b3 == 9:
        x2 = _add_body(F, x, x)
        x4 = _add_body(F, x2, x2)
        x8 = _add_body(F, x4, x4)
        return _add_body(F, x8, x)
    if b3 == 15:
        x2 = _add_body(F, x, x)
        x4 = _add_body(F, x2, x2)
        x8 = _add_body(F, x4, x4)
        return _sub_body(F, _add_body(F, x8, x8), x)
    const = [jnp.full_like(x[0], int(l))
             for l in _b3_mont_limbs(curve)]
    return _mont_mul_body(F, x, const)


def _b3_mont_limbs(curve):
    import numpy as np
    F = curve.Fq
    v = F.to_mont_int(curve.b3)
    return [(v >> (16 * i)) & 0xFFFF for i in range(NLIMBS)]


def _add_body_ec(curve, P, Q):
    """Complete projective addition (RC15 Alg 7, a = 0)."""
    F = curve.Fq
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    t0 = _mont_mul_body(F, X1, X2)
    t1 = _mont_mul_body(F, Y1, Y2)
    t2 = _mont_mul_body(F, Z1, Z2)
    t3 = _mont_mul_body(F, _add_body(F, X1, Y1), _add_body(F, X2, Y2))
    t3 = _sub_body(F, t3, _add_body(F, t0, t1))
    t4 = _mont_mul_body(F, _add_body(F, Y1, Z1), _add_body(F, Y2, Z2))
    t4 = _sub_body(F, t4, _add_body(F, t1, t2))
    Y3 = _mont_mul_body(F, _add_body(F, X1, Z1), _add_body(F, X2, Z2))
    Y3 = _sub_body(F, Y3, _add_body(F, t0, t2))
    t0 = _add_body(F, _add_body(F, t0, t0), t0)
    t2 = _mul_b3_body(curve, F, t2)
    Z3 = _add_body(F, t1, t2)
    t1 = _sub_body(F, t1, t2)
    Y3 = _mul_b3_body(curve, F, Y3)
    X3 = _sub_body(F, _mont_mul_body(F, t3, t1), _mont_mul_body(F, t4, Y3))
    Y3 = _add_body(F, _mont_mul_body(F, Y3, t0), _mont_mul_body(F, t1, Z3))
    Z3 = _add_body(F, _mont_mul_body(F, Z3, t4), _mont_mul_body(F, t0, t3))
    return X3, Y3, Z3


def _madd_body_ec(curve, P, Q_aff, q_inf=None):
    """Complete mixed addition (RC15 Alg 8): P projective + (x2, y2, Z2=1).
    Handles P = identity natively.  ``q_inf``: optional (T,) bool vector —
    lanes where Q is the identity pass P through."""
    F = curve.Fq
    X1, Y1, Z1 = P
    X2, Y2 = Q_aff
    t0 = _mont_mul_body(F, X1, X2)
    t1 = _mont_mul_body(F, Y1, Y2)
    t3 = _mont_mul_body(F, _add_body(F, X2, Y2), _add_body(F, X1, Y1))
    t3 = _sub_body(F, t3, _add_body(F, t0, t1))
    t4 = _add_body(F, _mont_mul_body(F, Y2, Z1), Y1)
    Y3 = _add_body(F, _mont_mul_body(F, X2, Z1), X1)
    t0 = _add_body(F, _add_body(F, t0, t0), t0)
    t2 = _mul_b3_body(curve, F, Z1)
    Z3 = _add_body(F, t1, t2)
    t1 = _sub_body(F, t1, t2)
    Y3 = _mul_b3_body(curve, F, Y3)
    X3 = _sub_body(F, _mont_mul_body(F, t3, t1), _mont_mul_body(F, t4, Y3))
    Y3 = _add_body(F, _mont_mul_body(F, Y3, t0), _mont_mul_body(F, t1, Z3))
    Z3 = _add_body(F, _mont_mul_body(F, Z3, t4), _mont_mul_body(F, t0, t3))
    if q_inf is not None:
        sel = lambda a, b: [jnp.where(q_inf, x, y) for x, y in zip(a, b)]
        X3 = sel(X1, X3)
        Y3 = sel(Y1, Y3)
        Z3 = sel(Z1, Z3)
    return X3, Y3, Z3


def _double_body(curve, X, Y, Z):
    """Complete projective doubling (RC15 Alg 9, a = 0)."""
    F = curve.Fq
    t0 = _mont_mul_body(F, Y, Y)
    Z3 = _add_body(F, t0, t0)
    Z3 = _add_body(F, Z3, Z3)
    Z3 = _add_body(F, Z3, Z3)
    t1 = _mont_mul_body(F, Y, Z)
    t2 = _mont_mul_body(F, Z, Z)
    t2 = _mul_b3_body(curve, F, t2)
    X3 = _mont_mul_body(F, t2, Z3)
    Y3 = _add_body(F, t0, t2)
    Z3 = _mont_mul_body(F, t1, Z3)
    t1 = _add_body(F, t2, t2)
    t2 = _add_body(F, t1, t2)
    t0 = _sub_body(F, t0, t2)
    Y3 = _add_body(F, X3, _mont_mul_body(F, t0, Y3))
    t1 = _mont_mul_body(F, X, Y)
    X3 = _mont_mul_body(F, t0, t1)
    X3 = _add_body(F, X3, X3)
    return X3, Y3, Z3


def _rows(ref, ncoords=3):
    out = []
    for c in range(ncoords):
        out.append([ref[c * NLIMBS + i] for i in range(NLIMBS)])
    return out


def _store(ref, XYZ):
    X, Y, Z = XYZ
    for i in range(NLIMBS):
        ref[i] = X[i]
        ref[NLIMBS + i] = Y[i]
        ref[2 * NLIMBS + i] = Z[i]


def _flatten(P, ncoords=3):
    """(..., ncoords, NLIMBS) -> (ncoords*NLIMBS, n), n, batch_shape."""
    batch = P.shape[:-2]
    n = 1
    for d in batch:
        n *= d
    flat = P.reshape(n, ncoords * NLIMBS)
    return jnp.moveaxis(flat, -1, 0), n, batch


def _unflatten(out, n, batch):
    return jnp.moveaxis(out[:, :n], 0, -1).reshape(batch + (3, NLIMBS))


ROWS = 3 * NLIMBS


@functools.partial(jax.jit, static_argnums=(0,))
def ec_add(curve, P, Q):
    """Fused complete projective add over broadcast-batched point arrays."""
    P, Q = jnp.broadcast_arrays(P, Q)
    pt, n, batch = _flatten(P)
    qt, _, _ = _flatten(Q)
    n_pad = -(-max(n, 1) // TILE) * TILE
    if n_pad != n:
        pt = jnp.pad(pt, [(0, 0), (0, n_pad - n)])
        qt = jnp.pad(qt, [(0, 0), (0, n_pad - n)])

    def kernel(p_ref, q_ref, o_ref):
        P3, = (_rows(p_ref),)
        Q3 = _rows(q_ref)
        _store(o_ref, _add_body_ec(curve, P3, Q3))

    out = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((ROWS, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, n_pad), jnp.uint32),
    )(pt, qt)
    return _unflatten(out, n, batch)


@functools.partial(jax.jit, static_argnums=(0,))
def ec_madd(curve, P, Q_aff, q_inf=None):
    """Fused complete mixed add: P (..., 3, L) projective + Q (..., 2, L)
    affine Montgomery coords, with optional (...,) bool infinity mask."""
    batch = jnp.broadcast_shapes(P.shape[:-2], Q_aff.shape[:-2])
    P = jnp.broadcast_to(P, batch + (3, NLIMBS))
    Q_aff = jnp.broadcast_to(Q_aff, batch + (2, NLIMBS))
    pt, n, batch = _flatten(P)
    qt, _, _ = _flatten(Q_aff, 2)
    if q_inf is None:
        q_inf = jnp.zeros(batch, dtype=jnp.bool_)
    qi = jnp.broadcast_to(jnp.asarray(q_inf), batch).reshape(
        1, n).astype(jnp.uint32)
    n_pad = -(-max(n, 1) // TILE) * TILE
    if n_pad != n:
        pt = jnp.pad(pt, [(0, 0), (0, n_pad - n)])
        qt = jnp.pad(qt, [(0, 0), (0, n_pad - n)])
        qi = jnp.pad(qi, [(0, 0), (0, n_pad - n)])

    def kernel(p_ref, q_ref, i_ref, o_ref):
        P3 = _rows(p_ref)
        Q2 = _rows(q_ref, 2)
        inf = i_ref[0] != 0
        _store(o_ref, _madd_body_ec(curve, P3, Q2, inf))

    out = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((ROWS, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * NLIMBS, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, n_pad), jnp.uint32),
    )(pt, qt, qi)
    return _unflatten(out, n, batch)


@functools.partial(jax.jit, static_argnums=(0,))
def ec_double(curve, P):
    pt, n, batch = _flatten(P)
    n_pad = -(-max(n, 1) // TILE) * TILE
    if n_pad != n:
        pt = jnp.pad(pt, [(0, 0), (0, n_pad - n)])

    def kernel(p_ref, o_ref):
        X, Y, Z = _rows(p_ref)
        _store(o_ref, _double_body(curve, X, Y, Z))

    out = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((ROWS, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, n_pad), jnp.uint32),
    )(pt)
    return _unflatten(out, n, batch)
