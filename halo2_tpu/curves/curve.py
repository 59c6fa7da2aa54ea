"""Batched elliptic-curve arithmetic (short Weierstrass, a = 0).

Replaces the reference's `halo2curves` point types (`CurveAffine`/`CurveExt`)
with array-of-points arithmetic: a batch of points is one array of shape
(..., 3, NLIMBS) — X, Y, Z coordinate rows in Montgomery form — in
**homogeneous projective coordinates** with the Renes–Costello–Batina
*complete* addition formulas for j-invariant-0 curves (eprint 2015/1060,
Algs 7–9).  Complete means one straight-line formula covers identity,
doubling, and inverse cases with NO lane-wise branching — exactly what the
TPU VPU wants — and is valid because every supported curve group (BN254 G1,
Pallas, Vesta) has odd prime order.

The identity is (0 : 1 : 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import Field, NLIMBS, _use_pallas

_jit = functools.partial(jax.jit, static_argnums=0)


class Curve:
    """y^2 = x^3 + b over base field Fq, with scalar field Fr (odd order)."""

    def __init__(self, name: str, Fq: Field, Fr: Field, b: int, gen_xy):
        self.name = name
        self.Fq = Fq
        self.Fr = Fr
        self.b = b
        self.b3 = (3 * b) % Fq.p
        self.gen_x, self.gen_y = gen_xy
        assert (self.gen_y ** 2 - self.gen_x ** 3 - b) % Fq.p == 0

    # ------------------------------------------------------------------
    # constructors
    # ------------------------------------------------------------------

    def identity(self, shape=()) -> jnp.ndarray:
        F = self.Fq
        zero = F.zeros(tuple(shape))
        one = F.ones(tuple(shape))
        return jnp.stack([zero, one, zero], axis=-2)

    def generator(self, shape=()) -> jnp.ndarray:
        return self.from_affine_ints([(self.gen_x, self.gen_y)]).reshape(
            tuple(shape) + (3, NLIMBS)) if shape == () or shape == (1,) else \
            jnp.broadcast_to(self.from_affine_ints([(self.gen_x, self.gen_y)])[0],
                             tuple(shape) + (3, NLIMBS))

    def from_affine_ints(self, pts) -> jnp.ndarray:
        """[(x, y) or None (identity), ...] -> (n, 3, NLIMBS)."""
        F = self.Fq
        xs, ys, zs = [], [], []
        for pt in pts:
            if pt is None:
                xs.append(0); ys.append(1); zs.append(0)
            else:
                x, y = pt
                xs.append(x % F.p); ys.append(y % F.p); zs.append(1)
        return jnp.stack(
            [F.encode_ints(xs), F.encode_ints(ys), F.encode_ints(zs)], axis=-2)

    def to_affine_ints(self, pts) -> list:
        """(..., 3, NLIMBS) -> [(x, y) or None, ...] host ints."""
        F = self.Fq
        pts = pts.reshape(-1, 3, NLIMBS)
        zs = F.decode_ints(pts[:, 2])
        xs = F.decode_ints(pts[:, 0])
        ys = F.decode_ints(pts[:, 1])
        out = []
        for x, y, z in zip(xs, ys, zs):
            if z == 0:
                out.append(None)
            else:
                zi = pow(z, F.p - 2, F.p)
                out.append(((x * zi) % F.p, (y * zi) % F.p))
        return out

    # ------------------------------------------------------------------
    # group law (complete, branchless, batched)
    # ------------------------------------------------------------------

    def _mul_b3(self, F, x):
        """Multiply by the small constant 3b via an addition chain."""
        b3 = self.b3
        if b3 == 9:          # bn254 G1 (b = 3): 9x = 8x + x
            x2 = F.add(x, x)
            x4 = F.add(x2, x2)
            x8 = F.add(x4, x4)
            return F.add(x8, x)
        if b3 == 15:         # pasta (b = 5): 15x = 16x - x
            x2 = F.add(x, x)
            x4 = F.add(x2, x2)
            x8 = F.add(x4, x4)
            return F.sub(F.add(x8, x8), x)
        return F.mul(x, F.full(x.shape[:-1], b3))

    @_jit
    def add(self, P, Q):
        """Complete addition (Renes–Costello Alg 7, a = 0)."""
        if _use_pallas():
            from . import pallas_ec
            return pallas_ec.ec_add(self, P, Q)
        F = self.Fq
        X1, Y1, Z1 = P[..., 0, :], P[..., 1, :], P[..., 2, :]
        X2, Y2, Z2 = Q[..., 0, :], Q[..., 1, :], Q[..., 2, :]
        t0 = F.mul(X1, X2)
        t1 = F.mul(Y1, Y2)
        t2 = F.mul(Z1, Z2)
        t3 = F.mul(F.add(X1, Y1), F.add(X2, Y2))
        t3 = F.sub(t3, F.add(t0, t1))           # X1Y2 + X2Y1
        t4 = F.mul(F.add(Y1, Z1), F.add(Y2, Z2))
        t4 = F.sub(t4, F.add(t1, t2))           # Y1Z2 + Y2Z1
        Y3 = F.mul(F.add(X1, Z1), F.add(X2, Z2))
        Y3 = F.sub(Y3, F.add(t0, t2))           # X1Z2 + X2Z1
        t0 = F.add(F.add(t0, t0), t0)           # 3 X1X2
        t2 = self._mul_b3(F, t2)                # b3 Z1Z2
        Z3 = F.add(t1, t2)
        t1 = F.sub(t1, t2)
        Y3 = self._mul_b3(F, Y3)
        X3 = F.sub(F.mul(t3, t1), F.mul(t4, Y3))
        Y3 = F.add(F.mul(Y3, t0), F.mul(t1, Z3))
        Z3 = F.add(F.mul(Z3, t4), F.mul(t0, t3))
        return jnp.stack([X3, Y3, Z3], axis=-2)

    @_jit
    def madd(self, P, Q_affine, q_inf=None):
        """Complete mixed addition (Renes–Costello Alg 8): P projective +
        Q affine (x2, y2, with Z2 = 1 implied).  Handles P = identity
        natively; Q at infinity must be flagged via ``q_inf`` (bool mask)
        since affine coordinates cannot encode it."""
        if _use_pallas():
            from . import pallas_ec
            return pallas_ec.ec_madd(self, P, Q_affine, q_inf)
        F = self.Fq
        X1, Y1, Z1 = P[..., 0, :], P[..., 1, :], P[..., 2, :]
        X2, Y2 = Q_affine[..., 0, :], Q_affine[..., 1, :]
        t0 = F.mul(X1, X2)
        t1 = F.mul(Y1, Y2)
        t3 = F.mul(F.add(X2, Y2), F.add(X1, Y1))
        t3 = F.sub(t3, F.add(t0, t1))           # X1Y2 + X2Y1
        t4 = F.add(F.mul(Y2, Z1), Y1)           # Y2Z1 + Y1
        Y3 = F.add(F.mul(X2, Z1), X1)           # X2Z1 + X1
        t0 = F.add(F.add(t0, t0), t0)           # 3 X1X2
        t2 = self._mul_b3(F, Z1)                # b3 Z1
        Z3 = F.add(t1, t2)
        t1 = F.sub(t1, t2)
        Y3 = self._mul_b3(F, Y3)
        X3 = F.sub(F.mul(t3, t1), F.mul(t4, Y3))
        Y3 = F.add(F.mul(Y3, t0), F.mul(t1, Z3))
        Z3 = F.add(F.mul(Z3, t4), F.mul(t0, t3))
        out = jnp.stack([X3, Y3, Z3], axis=-2)
        if q_inf is not None:
            out = jnp.where(jnp.asarray(q_inf)[..., None, None], P, out)
        return out

    @_jit
    def double(self, P):
        """Complete doubling (Renes–Costello Alg 9, a = 0);
        identity-safe by completeness."""
        if _use_pallas():
            from . import pallas_ec
            return pallas_ec.ec_double(self, P)
        F = self.Fq
        X, Y, Z = P[..., 0, :], P[..., 1, :], P[..., 2, :]
        t0 = F.mul(Y, Y)
        Z3 = F.add(t0, t0)
        Z3 = F.add(Z3, Z3)
        Z3 = F.add(Z3, Z3)                      # 8 Y^2
        t1 = F.mul(Y, Z)
        t2 = F.mul(Z, Z)
        t2 = self._mul_b3(F, t2)                # b3 Z^2
        X3 = F.mul(t2, Z3)
        Y3 = F.add(t0, t2)
        Z3 = F.mul(t1, Z3)
        t1 = F.add(t2, t2)
        t2 = F.add(t1, t2)                      # 3 b3 Z^2
        t0 = F.sub(t0, t2)                      # Y^2 - 3 b3 Z^2
        Y3 = F.add(X3, F.mul(t0, Y3))
        t1 = F.mul(X, Y)
        X3 = F.mul(t0, t1)
        X3 = F.add(X3, X3)
        return jnp.stack([X3, Y3, Z3], axis=-2)

    @_jit
    def neg(self, P):
        F = self.Fq
        return jnp.stack(
            [P[..., 0, :], F.neg(P[..., 1, :]), P[..., 2, :]], axis=-2)

    @_jit
    def eq(self, P, Q):
        """Projective equality (cross-multiplied), identity-aware."""
        F = self.Fq
        X1, Y1, Z1 = P[..., 0, :], P[..., 1, :], P[..., 2, :]
        X2, Y2, Z2 = Q[..., 0, :], Q[..., 1, :], Q[..., 2, :]
        x_eq = F.eq(F.mul(X1, Z2), F.mul(X2, Z1))
        y_eq = F.eq(F.mul(Y1, Z2), F.mul(Y2, Z1))
        p_inf = F.is_zero(Z1)
        q_inf = F.is_zero(Z2)
        return (p_inf & q_inf) | (~p_inf & ~q_inf & x_eq & y_eq)

    def is_identity(self, P):
        return self.Fq.is_zero(P[..., 2, :])

    # ------------------------------------------------------------------
    # scalar multiplication
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0,))
    def scalar_mul(self, P, k_mont):
        """[k]P with k an encoded scalar (..., NLIMBS) in Montgomery form of
        the SCALAR field; double-and-add over 256 bits via scan."""
        Fr = self.Fr
        k_canon = Fr.from_mont(k_mont)          # 16-bit limbs of canonical k
        # bits LSB-first: (256, ...)
        limbs = jnp.moveaxis(k_canon, -1, 0)    # (16, ...)
        shifts = jnp.arange(16, dtype=jnp.uint32).reshape(
            (1, 16) + (1,) * (limbs.ndim - 1))
        bits = (limbs[:, None, ...] >> shifts) & 1   # (16, 16, ...)
        bits = bits.reshape((256,) + k_canon.shape[:-1])

        def step(carry, bit):
            acc, base = carry
            added = self.add(acc, base)
            acc = jnp.where(bit[..., None, None] == 1, added, acc)
            return (acc, self.double(base)), None

        (acc, _), _ = jax.lax.scan(
            step, (self.identity(P.shape[:-2]), P), bits)
        return acc

    def scalar_mul_int(self, P, k: int):
        """[k]P for a host int scalar (used in param generation/tests)."""
        k = int(k) % self.Fr.p
        return self.scalar_mul(P, jnp.broadcast_to(
            self.Fr.encode_int(k), P.shape[:-2] + (NLIMBS,)))

    # ------------------------------------------------------------------
    # batched affine conversion (Montgomery-trick inversion of Z)
    # ------------------------------------------------------------------

    @_jit
    def batch_normalize(self, P):
        """(n, 3, L) projective -> (n, 2, L) affine (identity -> (0, 0)),
        one field inversion total."""
        F = self.Fq
        Z = P[..., 2, :]
        zinv = F.batch_inv(Z.reshape(-1, NLIMBS), axis=0).reshape(Z.shape)
        x = F.mul(P[..., 0, :], zinv)
        y = F.mul(P[..., 1, :], zinv)
        return jnp.stack([x, y], axis=-2)

    def from_affine_coords(self, xy, inf_mask=None):
        """(n, 2, NLIMBS) Montgomery affine (+ optional infinity mask) ->
        (n, 3, NLIMBS) projective."""
        F = self.Fq
        x = xy[..., 0, :]
        y = xy[..., 1, :]
        one = F.ones(x.shape[:-1])
        zero = F.zeros(x.shape[:-1])
        if inf_mask is None:
            inf_mask = F.is_zero(x) & F.is_zero(y)
        m = jnp.asarray(inf_mask)[..., None]
        X = jnp.where(m, zero, x)
        Y = jnp.where(m, one, y)
        Z = jnp.where(m, zero, one)
        return jnp.stack([X, Y, Z], axis=-2)

    # ------------------------------------------------------------------
    # serialization (32-byte compressed; x LE with y-parity in top bit)
    # ------------------------------------------------------------------

    def point_to_bytes(self, pt) -> bytes:
        """Affine (x, y) ints or None -> 32-byte compressed encoding,
        byte-identical to halo2curves/pasta_curves `C::to_bytes()` for the
        supported curves (consumed at transcript.rs:160,360): x little-endian
        with the y-parity sign in bit 255; identity is all-zeros."""
        if pt is None:
            return b"\x00" * 32
        x, y = pt
        buf = bytearray(int(x).to_bytes(32, "little"))
        if y & 1:
            buf[31] |= 0x80
        return bytes(buf)

    def point_from_bytes(self, b: bytes):
        if b == b"\x00" * 32:
            return None
        buf = bytearray(b)
        sign = (buf[31] & 0x80) >> 7
        buf[31] &= 0x7F
        x = int.from_bytes(bytes(buf), "little")
        F = self.Fq
        if x >= F.p:
            raise ValueError("invalid x coordinate")
        rhs = (x * x * x + self.b) % F.p
        y = self._sqrt_int(rhs)
        if y is None:
            raise ValueError("not on curve")
        if (y & 1) != sign:
            y = F.p - y
        return (x, y)

    def _sqrt_int(self, a: int):
        """Tonelli-Shanks over python ints (host-side, serde only)."""
        p = self.Fq.p
        if a == 0:
            return 0
        if pow(a, (p - 1) // 2, p) != 1:
            return None
        if p % 4 == 3:
            return pow(a, (p + 1) // 4, p)
        # general Tonelli-Shanks
        S, t = self.Fq.S, self.Fq.t_odd
        z = pow(self.Fq.generator, t, p)  # non-residue^t = 2^S-order element
        M, c, t_, R = S, z, pow(a, t, p), pow(a, (t + 1) // 2, p)
        while t_ != 1:
            i, tmp = 0, t_
            while tmp != 1:
                tmp = (tmp * tmp) % p
                i += 1
            b = pow(c, 1 << (M - i - 1), p)
            M, c = i, (b * b) % p
            t_ = (t_ * c) % p
            R = (R * b) % p
        return R

    def __hash__(self):
        return hash((self.name, self.Fq.p, self.b))

    def __eq__(self, other):
        return (isinstance(other, Curve) and other.Fq == self.Fq
                and other.b == self.b)

    def __repr__(self):
        return f"Curve({self.name})"
