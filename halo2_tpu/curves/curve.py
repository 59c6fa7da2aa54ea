"""Batched elliptic-curve arithmetic (short Weierstrass, a = 0).

Replaces the reference's `halo2curves` point types (`CurveAffine`/`CurveExt`)
with array-of-points Jacobian arithmetic: a batch of points is one array of
shape (..., 3, NLIMBS) — X, Y, Z coordinate rows in Montgomery form — and
add/double are branchless (edge cases resolved with lane-wise selects), which
is what the TPU VPU wants.

The identity is encoded as Z = 0 (X = Y = 1), matching Jacobian convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import Field, NLIMBS, _use_pallas

_jit = functools.partial(jax.jit, static_argnums=0)


class Curve:
    """y^2 = x^3 + b over base field Fq, with scalar field Fr."""

    def __init__(self, name: str, Fq: Field, Fr: Field, b: int, gen_xy):
        self.name = name
        self.Fq = Fq
        self.Fr = Fr
        self.b = b
        self.gen_x, self.gen_y = gen_xy
        assert (self.gen_y ** 2 - self.gen_x ** 3 - b) % Fq.p == 0

    # ------------------------------------------------------------------
    # constructors
    # ------------------------------------------------------------------

    def identity(self, shape=()) -> jnp.ndarray:
        F = self.Fq
        x = F.ones(tuple(shape))
        z = F.zeros(tuple(shape))
        return jnp.stack([x, x, z], axis=-2)

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
                xs.append(1); ys.append(1); zs.append(0)
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
                out.append(((x * zi * zi) % F.p, (y * zi * zi * zi) % F.p))
        return out

    # ------------------------------------------------------------------
    # group law (branchless, batched)
    # ------------------------------------------------------------------

    @_jit
    def double(self, P):
        """Jacobian doubling for a = 0; identity-safe (Z stays 0)."""
        if _use_pallas():
            from . import pallas_ec
            return pallas_ec.ec_double(self.Fq, P)
        F = self.Fq
        X, Y, Z = P[..., 0, :], P[..., 1, :], P[..., 2, :]
        A = F.square(X)
        B = F.square(Y)
        C = F.square(B)
        t = F.square(F.add(X, B))
        D = F.double(F.sub(F.sub(t, A), C))
        E = F.add(F.add(A, A), A)
        Fv = F.square(E)
        X3 = F.sub(Fv, F.double(D))
        eightC = F.double(F.double(F.double(C)))
        Y3 = F.sub(F.mul(E, F.sub(D, X3)), eightC)
        Z3 = F.double(F.mul(Y, Z))
        return jnp.stack([X3, Y3, Z3], axis=-2)

    @_jit
    def add(self, P, Q):
        """Complete Jacobian addition: handles identity, P == Q, P == -Q."""
        if _use_pallas():
            from . import pallas_ec
            return pallas_ec.ec_add(self.Fq, P, Q)
        F = self.Fq
        X1, Y1, Z1 = P[..., 0, :], P[..., 1, :], P[..., 2, :]
        X2, Y2, Z2 = Q[..., 0, :], Q[..., 1, :], Q[..., 2, :]

        Z1Z1 = F.square(Z1)
        Z2Z2 = F.square(Z2)
        U1 = F.mul(X1, Z2Z2)
        U2 = F.mul(X2, Z1Z1)
        S1 = F.mul(Y1, F.mul(Z2, Z2Z2))
        S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
        H = F.sub(U2, U1)
        r = F.sub(S2, S1)

        HH = F.square(H)
        HHH = F.mul(H, HH)
        V = F.mul(U1, HH)
        X3 = F.sub(F.sub(F.square(r), HHH), F.double(V))
        Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.mul(S1, HHH))
        Z3 = F.mul(F.mul(Z1, Z2), H)
        general = jnp.stack([X3, Y3, Z3], axis=-2)

        p_inf = F.is_zero(Z1)
        q_inf = F.is_zero(Z2)
        h_zero = F.is_zero(H)
        r_zero = F.is_zero(r)
        both = ~p_inf & ~q_inf
        is_double = both & h_zero & r_zero
        is_inf_result = both & h_zero & ~r_zero

        out = general
        dbl = self.double(P)
        sel = lambda c, a, b: jnp.where(c[..., None, None], a, b)
        out = sel(is_double, dbl, out)
        out = sel(is_inf_result, self.identity(out.shape[:-2]), out)
        out = sel(p_inf, Q, out)
        out = sel(q_inf, P, out)
        return out

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
        Z1Z1 = F.square(Z1)
        Z2Z2 = F.square(Z2)
        x_eq = F.eq(F.mul(X1, Z2Z2), F.mul(X2, Z1Z1))
        y_eq = F.eq(F.mul(Y1, F.mul(Z2, Z2Z2)), F.mul(Y2, F.mul(Z1, Z1Z1)))
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
        """(n, 3, L) Jacobian -> (n, 2, L) affine (identity -> (0, 0)),
        one field inversion total."""
        F = self.Fq
        Z = P[..., 2, :]
        zinv = F.batch_inv(Z.reshape(-1, NLIMBS), axis=0).reshape(Z.shape)
        zinv2 = F.square(zinv)
        x = F.mul(P[..., 0, :], zinv2)
        y = F.mul(P[..., 1, :], F.mul(zinv, zinv2))
        return jnp.stack([x, y], axis=-2)

    # ------------------------------------------------------------------
    # serialization (32-byte compressed; x LE with y-parity in top bit)
    # ------------------------------------------------------------------

    def point_to_bytes(self, pt) -> bytes:
        """Affine (x, y) ints or None -> 32-byte compressed encoding.
        Identity is all-zeros. Sign bit = y parity, stored in bit 255.
        NOTE: documented encoding of this framework; halo2curves
        byte-compat is tracked separately (compat/)."""
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
