"""Pallas TPU kernels for the hot field ops.

The pure-jnp limb arithmetic in field.py lowers to ~250 elementwise XLA ops
per Montgomery multiply, each round-tripping HBM — measured ~100x off the
bandwidth roofline on v5e.  These kernels keep the full limb computation in
VMEM: one HBM read per operand, one write per result.

Layout: kernels work limb-major (NLIMBS, T) so each limb row maps onto full
8x128 VPU tiles; wrappers transpose at the boundary (cheap, bandwidth-bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .field import Field, NLIMBS, LIMB_BITS, MASK, _use_pallas

TILE = 2048  # lanes per grid step; VMEM use ~ 33 rows * TILE * 4B ~ 270KB


def _mont_mul_body(F: Field, a, b):
    """a, b: lists of NLIMBS (T,) uint32 vectors. Returns list of NLIMBS
    result vectors (Montgomery product, canonical < p)."""
    # NOTE(kernel constants): all constants in these bodies must be Python
    # ints (weak-typed -> jaxpr Literals) and zeros must derive from a
    # traced operand — a `jnp.uint32(..)`/`jnp.zeros(..)` created while an
    # OUTER jit trace is ambient becomes an outer-trace tracer that the
    # kernel would "capture", which pallas rejects ("captures constants").
    zero = a[0] ^ a[0]
    acc = [zero] * (2 * NLIMBS + 1)
    # schoolbook product, per-product lo/hi split; each column accumulates
    # <= 2*NLIMBS products per phase (bounded < 2**22, exact in uint32)
    for j in range(NLIMBS):
        bj = b[j]
        for i in range(NLIMBS):
            prod = a[i] * bj
            acc[i + j] = acc[i + j] + (prod & MASK)
            acc[i + j + 1] = acc[i + j + 1] + (prod >> LIMB_BITS)
    # Montgomery reduction: clear limbs 0..NLIMBS-1
    n0 = F.n0
    p_limbs = [int(x) for x in F.p_limbs]
    for i in range(NLIMBS):
        m = ((acc[i] & MASK) * n0) & MASK
        for j in range(NLIMBS):
            prod = m * p_limbs[j]
            acc[i + j] = acc[i + j] + (prod & MASK)
            acc[i + j + 1] = acc[i + j + 1] + (prod >> LIMB_BITS)
        acc[i + 1] = acc[i + 1] + (acc[i] >> LIMB_BITS)
    # carry-normalize limbs NLIMBS..2*NLIMBS
    res = []
    carry = zero
    for i in range(NLIMBS, 2 * NLIMBS):
        v = acc[i] + carry
        res.append(v & MASK)
        carry = v >> LIMB_BITS
    # conditional subtract p (result < 2p)
    return _cond_sub_p(F, res, carry)


def _cond_sub_p(F: Field, limbs, extra_carry=None):
    """limbs: NLIMBS (T,) uint32 < 2**16; subtract p if >= p.
    (Python-int constants only — see the kernel-constants note above.)"""
    borrow = limbs[0] ^ limbs[0]
    diff = []
    big = 1 << LIMB_BITS
    for i in range(NLIMBS):
        v = limbs[i] + big - int(F.p_limbs[i]) - borrow
        diff.append(v & MASK)
        borrow = 1 - (v >> LIMB_BITS)
    ge_p = borrow == 0
    if extra_carry is not None:
        ge_p = ge_p | (extra_carry > 0)
    return [jnp.where(ge_p, d, l) for d, l in zip(diff, limbs)]


def _add_body(F: Field, a, b):
    carry = a[0] ^ a[0]
    out = []
    for i in range(NLIMBS):
        v = a[i] + b[i] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return _cond_sub_p(F, out, carry)


def _sub_body(F: Field, a, b):
    big = 1 << LIMB_BITS
    borrow = a[0] ^ a[0]
    diff = []
    for i in range(NLIMBS):
        v = a[i] + big - b[i] - borrow
        diff.append(v & MASK)
        borrow = 1 - (v >> LIMB_BITS)
    # if borrowed, add p back
    carry = a[0] ^ a[0]
    fixed = []
    for i in range(NLIMBS):
        v = diff[i] + int(F.p_limbs[i]) + carry
        fixed.append(v & MASK)
        carry = v >> LIMB_BITS
    need_fix = borrow == 1
    return [jnp.where(need_fix, f, d) for f, d in zip(fixed, diff)]


def _make_kernel(F: Field, body):
    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i] for i in range(NLIMBS)]
        b = [b_ref[i] for i in range(NLIMBS)]
        out = body(F, a, b)
        for i in range(NLIMBS):
            o_ref[i] = out[i]

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1))
def _binop_pallas(F: Field, which: str, a, b):
    """a, b: (..., NLIMBS) uint32 broadcastable; runs the tiled kernel."""
    a, b = jnp.broadcast_arrays(a, b)
    shape = a.shape
    n = 1
    for d in shape[:-1]:
        n *= d
    at = jnp.moveaxis(a.reshape(n, NLIMBS), -1, 0)   # (NLIMBS, n)
    bt = jnp.moveaxis(b.reshape(n, NLIMBS), -1, 0)
    n_pad = -(-max(n, 1) // TILE) * TILE
    if n_pad != n:
        at = jnp.pad(at, [(0, 0), (0, n_pad - n)])
        bt = jnp.pad(bt, [(0, 0), (0, n_pad - n)])

    body = {"mul": _mont_mul_body, "add": _add_body, "sub": _sub_body}[which]
    kernel = _make_kernel(F, body)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((NLIMBS, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMBS, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NLIMBS, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NLIMBS, n_pad), jnp.uint32),
    )(at, bt)
    out = jnp.moveaxis(out[:, :n], 0, -1).reshape(shape)
    return out


@functools.partial(jax.jit, static_argnums=(0, 1))
def _binop_pallas_lm(F: Field, which: str, a, b):
    """Limb-major variant: a, b are (NLIMBS, ...) broadcastable.  Skips the
    boundary moveaxis relayouts of `_binop_pallas` — inside the fused NTT
    the data already lives limb-major, and each moveaxis is a full-array
    HBM round trip."""
    a, b = jnp.broadcast_arrays(a, b)
    shape = a.shape
    n = 1
    for d in shape[1:]:
        n *= d
    at = a.reshape(NLIMBS, n)
    bt = b.reshape(NLIMBS, n)
    n_pad = -(-max(n, 1) // TILE) * TILE
    if n_pad != n:
        at = jnp.pad(at, [(0, 0), (0, n_pad - n)])
        bt = jnp.pad(bt, [(0, 0), (0, n_pad - n)])
    body = {"mul": _mont_mul_body, "add": _add_body, "sub": _sub_body}[which]
    kernel = _make_kernel(F, body)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((NLIMBS, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMBS, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NLIMBS, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NLIMBS, n_pad), jnp.uint32),
    )(at, bt)
    return out[:, :n].reshape(shape)


def mont_mul_lm(F: Field, a, b):
    """Montgomery product on LIMB-MAJOR (NLIMBS, ...) arrays."""
    if _use_pallas():
        return _binop_pallas_lm(F, "mul", a, b)
    # jnp fallback: route through the limb-last implementation
    out = F.mul(jnp.moveaxis(a, 0, -1), jnp.moveaxis(b, 0, -1))
    return jnp.moveaxis(out, -1, 0)


def mont_mul(F: Field, a, b):
    return _binop_pallas(F, "mul", a, b)


def mod_add(F: Field, a, b):
    return _binop_pallas(F, "add", a, b)


def mod_sub(F: Field, a, b):
    return _binop_pallas(F, "sub", a, b)
