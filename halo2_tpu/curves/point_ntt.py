"""NTT over curve points (the reference's `FftGroup` generality:
halo2_backend/src/arithmetic.rs:17-54, used by `g_to_lagrange` to build
Lagrange-basis generator vectors).  Butterfly twiddle products are batched
scalar multiplications; used only in parameter generation, so throughput is
secondary to keeping it a one-time cost (params are cached on disk)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import NLIMBS
from ..ntt.ntt import bit_reverse_indices
from .curve import Curve


@functools.partial(jax.jit, static_argnums=(0, 2))
def _point_transform(curve: Curve, pts, log_n: int, tw_table):
    n = 1 << log_n
    rev = jnp.asarray(bit_reverse_indices(log_n))
    a = jnp.take(pts, rev, axis=0)
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        tw = tw_table[:: n // m][:half]               # (half, NLIMBS) scalars
        a = a.reshape(n // m, m, 3, NLIMBS)
        e = a[:, :half]
        o = a[:, half:]
        t = curve.scalar_mul(o, tw[None])             # broadcast over blocks
        a = jnp.concatenate([curve.add(e, t), curve.add(e, curve.neg(t))],
                            axis=1)
        a = a.reshape(n, 3, NLIMBS)
    return a


def g_to_lagrange(curve: Curve, pts, log_n: int):
    """[G_j] coeff-basis generators -> Lagrange-basis generators (iFFT over
    the group, scaled by 1/n).  arithmetic.rs:30-54 equivalent."""
    F = curve.Fr
    n = 1 << log_n
    omega = pow(F.root_of_unity, 1 << (F.S - log_n), F.p)
    omega_inv = pow(omega, F.p - 2, F.p)
    n_inv = pow(n, F.p - 2, F.p)
    from ..ntt import powers
    tw = powers(F, F.encode_int(omega_inv), max(n // 2, 1))
    out = _point_transform(curve, pts, log_n, tw)
    return curve.scalar_mul(out, jnp.broadcast_to(F.encode_int(n_inv),
                                                  (n, NLIMBS)))
