"""Fused Pallas TPU kernels for the Jacobian group law.

curve.add/double in curve.py lower to ~23 separate field-op dispatches, each
round-tripping every limb through HBM.  These kernels inline the whole
complete-addition formula over VMEM-resident limb vectors: one HBM read per
point operand, one write per result — the same treatment fields/pallas_ops
gives a single Montgomery multiply, applied to the full group law.

Layout: a batch of N Jacobian points (..., 3, NLIMBS) is flattened and
transposed to (3*NLIMBS, N) so each limb row occupies full 8x128 VPU tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.field import Field, NLIMBS
from ..fields.pallas_ops import (
    _add_body, _mont_mul_body, _sub_body,
)

TILE = 512   # lanes per grid step; ~40 live field temps * 16 rows * TILE * 4B


def _is_zero(limbs):
    acc = limbs[0]
    for l in limbs[1:]:
        acc = acc | l
    return acc == 0


def _select(cond, a, b):
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def _dbl_f(F, a):
    return _add_body(F, a, a)


def _double_body(F: Field, X, Y, Z):
    """Jacobian doubling, a = 0 (identity-safe: Z stays 0).  Mirrors
    curve.py double / halo2curves dbl formula."""
    A = _mont_mul_body(F, X, X)
    B = _mont_mul_body(F, Y, Y)
    C = _mont_mul_body(F, B, B)
    XB = _add_body(F, X, B)
    t = _mont_mul_body(F, XB, XB)
    D = _dbl_f(F, _sub_body(F, _sub_body(F, t, A), C))
    E = _add_body(F, _add_body(F, A, A), A)
    Fv = _mont_mul_body(F, E, E)
    X3 = _sub_body(F, Fv, _dbl_f(F, D))
    eightC = _dbl_f(F, _dbl_f(F, _dbl_f(F, C)))
    Y3 = _sub_body(F, _mont_mul_body(F, E, _sub_body(F, D, X3)), eightC)
    Z3 = _dbl_f(F, _mont_mul_body(F, Y, Z))
    return X3, Y3, Z3


def _add_body_ec(F: Field, P, Q):
    """Complete Jacobian addition (identity / equal / inverse cases),
    mirroring curve.py add."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = _mont_mul_body(F, Z1, Z1)
    Z2Z2 = _mont_mul_body(F, Z2, Z2)
    U1 = _mont_mul_body(F, X1, Z2Z2)
    U2 = _mont_mul_body(F, X2, Z1Z1)
    S1 = _mont_mul_body(F, Y1, _mont_mul_body(F, Z2, Z2Z2))
    S2 = _mont_mul_body(F, Y2, _mont_mul_body(F, Z1, Z1Z1))
    H = _sub_body(F, U2, U1)
    r = _sub_body(F, S2, S1)

    HH = _mont_mul_body(F, H, H)
    HHH = _mont_mul_body(F, H, HH)
    V = _mont_mul_body(F, U1, HH)
    rr = _mont_mul_body(F, r, r)
    X3 = _sub_body(F, _sub_body(F, rr, HHH), _dbl_f(F, V))
    Y3 = _sub_body(F, _mont_mul_body(F, r, _sub_body(F, V, X3)),
                   _mont_mul_body(F, S1, HHH))
    Z3 = _mont_mul_body(F, _mont_mul_body(F, Z1, Z2), H)

    DX, DY, DZ = _double_body(F, X1, Y1, Z1)

    p_inf = _is_zero(Z1)
    q_inf = _is_zero(Z2)
    h_zero = _is_zero(H)
    r_zero = _is_zero(r)
    both = (~p_inf) & (~q_inf)
    is_double = both & h_zero & r_zero
    is_inf = both & h_zero & (~r_zero)

    zero = [jnp.zeros_like(X1[0])] * NLIMBS
    # curve.identity() encodes infinity as (1, 1, 0) in Montgomery form
    one = [jnp.full_like(X1[0], int(F._one_mont[i])) for i in range(NLIMBS)]
    outX, outY, outZ = X3, Y3, Z3
    outX = _select(is_double, DX, outX)
    outY = _select(is_double, DY, outY)
    outZ = _select(is_double, DZ, outZ)
    outX = _select(is_inf, one, outX)
    outY = _select(is_inf, one, outY)
    outZ = _select(is_inf, zero, outZ)
    outX = _select(p_inf, X2, outX)
    outY = _select(p_inf, Y2, outY)
    outZ = _select(p_inf, Z2, outZ)
    outX = _select(q_inf, X1, outX)
    outY = _select(q_inf, Y1, outY)
    outZ = _select(q_inf, Z1, outZ)
    return outX, outY, outZ


def _rows(ref):
    X = [ref[i] for i in range(NLIMBS)]
    Y = [ref[NLIMBS + i] for i in range(NLIMBS)]
    Z = [ref[2 * NLIMBS + i] for i in range(NLIMBS)]
    return X, Y, Z


def _store(ref, XYZ):
    X, Y, Z = XYZ
    for i in range(NLIMBS):
        ref[i] = X[i]
        ref[NLIMBS + i] = Y[i]
        ref[2 * NLIMBS + i] = Z[i]


def _make_add_kernel(F: Field):
    def kernel(p_ref, q_ref, o_ref):
        _store(o_ref, _add_body_ec(F, _rows(p_ref), _rows(q_ref)))
    return kernel


def _make_double_kernel(F: Field):
    def kernel(p_ref, o_ref):
        X, Y, Z = _rows(p_ref)
        _store(o_ref, _double_body(F, X, Y, Z))
    return kernel


def _flatten_points(P):
    """(..., 3, NLIMBS) -> (3*NLIMBS, n), n, batch_shape."""
    batch = P.shape[:-2]
    n = 1
    for d in batch:
        n *= d
    flat = P.reshape(n, 3 * NLIMBS)
    return jnp.moveaxis(flat, -1, 0), n, batch


def _unflatten_points(out, n, batch):
    return jnp.moveaxis(out[:, :n], 0, -1).reshape(batch + (3, NLIMBS))


ROWS = 3 * NLIMBS


@functools.partial(jax.jit, static_argnums=(0,))
def ec_add(F: Field, P, Q):
    """Fused complete Jacobian add over broadcast-batched point arrays."""
    P, Q = jnp.broadcast_arrays(P, Q)
    pt, n, batch = _flatten_points(P)
    qt, _, _ = _flatten_points(Q)
    n_pad = -(-max(n, 1) // TILE) * TILE
    if n_pad != n:
        pt = jnp.pad(pt, [(0, 0), (0, n_pad - n)])
        qt = jnp.pad(qt, [(0, 0), (0, n_pad - n)])
    out = pl.pallas_call(
        _make_add_kernel(F),
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
    return _unflatten_points(out, n, batch)


@functools.partial(jax.jit, static_argnums=(0,))
def ec_double(F: Field, P):
    pt, n, batch = _flatten_points(P)
    n_pad = -(-max(n, 1) // TILE) * TILE
    if n_pad != n:
        pt = jnp.pad(pt, [(0, 0), (0, n_pad - n)])
    out = pl.pallas_call(
        _make_double_kernel(F),
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((ROWS, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, n_pad), jnp.uint32),
    )(pt)
    return _unflatten_points(out, n, batch)
