"""Evaluation domains for polynomial arithmetic.

Behavioral port of `halo2_backend/src/poly/domain.rs:18-467` (EvaluationDomain)
re-designed around batched device arrays: every transform accepts shape
(..., n, NLIMBS) so whole column sets move through the FFT pipeline in one
compiled call, and the constants (t-evaluation inverses, coset scalars) live
on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import Field, NLIMBS
from ..ntt import get_ntt, powers
from .poly import COEFF, EXTENDED, LAGRANGE, Poly, take


class Rotation:
    """Mirrors halo2_middleware/src/poly.rs:5-22."""

    __slots__ = ("i",)

    def __init__(self, i: int):
        self.i = int(i)

    @staticmethod
    def cur():
        return Rotation(0)

    @staticmethod
    def prev():
        return Rotation(-1)

    @staticmethod
    def next():
        return Rotation(1)

    def __repr__(self):
        return f"Rotation({self.i})"

    def __eq__(self, other):
        return isinstance(other, Rotation) and other.i == self.i

    def __hash__(self):
        return hash(("Rotation", self.i))


class EvaluationDomain:
    """Precomputed constants for the 2^k domain and the 2^extended_k coset
    domain (quotient computations). See domain.rs:38-144 for the constant
    derivations mirrored here."""

    def __init__(self, F: Field, j: int, k: int):
        self.F = F
        self.k = k
        self.n = 1 << k
        self.quotient_poly_degree = j - 1

        extended_k = k
        while (1 << extended_k) < self.n * self.quotient_poly_degree:
            extended_k += 1
        assert extended_k <= F.S, "field 2-adicity too small for extended domain"
        self.extended_k = extended_k
        self.extended_n = 1 << extended_k

        p = F.p
        self.omega = pow(F.root_of_unity, 1 << (F.S - k), p)
        self.omega_inv = pow(self.omega, p - 2, p)
        self.extended_omega = pow(F.root_of_unity, 1 << (F.S - extended_k), p)
        self.extended_omega_inv = pow(self.extended_omega, p - 2, p)
        self.g_coset = F.zeta                      # ZETA
        self.g_coset_inv = (F.zeta * F.zeta) % p   # ZETA^2 (= ZETA^{-1})
        self.barycentric_weight = pow(self.n, p - 2, p)

        # t(X) = X^n - 1 evaluated over the coset domain; repeats with period
        # 2^(extended_k - k).  Stored inverted (we divide by them).
        t_evals = []
        orig = pow(F.zeta, self.n, p)
        step = pow(self.extended_omega, self.n, p)
        cur = orig
        while True:
            t_evals.append((cur - 1) % p)
            cur = (cur * step) % p
            if cur == orig:
                break
        assert len(t_evals) == 1 << (extended_k - k)
        self.t_evaluations_inv = F.encode_ints(
            [pow(t, p - 2, p) for t in t_evals])

        self._ntt = get_ntt(F, k)
        self._ntt_ext = get_ntt(F, extended_k)
        self._mesh = None
        self._sharded = {}    # (log_n,) -> ShardedNTT
        # zeta power pattern for distribute_powers_zeta: period 3
        self._zeta_fwd = F.encode_ints([1, self.g_coset, self.g_coset_inv])
        self._zeta_inv = F.encode_ints([1, self.g_coset_inv, self.g_coset])

    # ------------------------------------------------------------------
    # constructors
    # ------------------------------------------------------------------

    def empty_lagrange(self, batch=()):
        return self.F.zeros(tuple(batch) + (self.n,))

    def empty_coeff(self, batch=()):
        return self.F.zeros(tuple(batch) + (self.n,))

    def empty_extended(self, batch=()):
        return self.F.zeros(tuple(batch) + (self.extended_n,))

    def constant_lagrange(self, x: int):
        return self.F.full((self.n,), x)

    def constant_extended(self, x: int):
        return self.F.full((self.extended_n,), x)

    # ------------------------------------------------------------------
    # transforms (all batched over leading dims; poly axis = -2)
    # ------------------------------------------------------------------

    def set_mesh(self, mesh):
        """Route all transforms through the distributed NTT (dist/ntt.py:
        local four-step stages + all-to-all exchanges) — the multi-chip
        scaling seam (SURVEY §5.7-5.8).  Must be called before the first
        transform trace; row counts must be divisible by the mesh size."""
        from ..dist.ntt import ShardedNTT
        self._mesh = mesh
        if mesh is not None:
            self._sharded[self.k] = ShardedNTT(
                mesh, self.F, self.k, self.omega)
            self._sharded[self.extended_k] = ShardedNTT(
                mesh, self.F, self.extended_k, self.extended_omega)

    def _chunk_batched(self, fn, a, out_rows: int):
        """Apply transform `fn` over the batch dims of `a` in chunks whose
        per-dispatch footprint stays under HALO2_TPU_NTT_CHUNK_MB (default
        512).  A whole stacked column set at k>=18 over the extended domain
        otherwise compiles to an executable whose working set alone
        overflows HBM (the batched four-step NTT keeps several
        batch-sized temporaries live); equal-size chunks share one
        compiled executable."""
        if a.ndim <= 2:
            return fn(a)
        import os
        per_col = out_rows * NLIMBS * 4
        limit = int(float(os.environ.get(
            "HALO2_TPU_NTT_CHUNK_MB", "256")) * 1e6)
        batch = 1
        for d in a.shape[:-2]:
            batch *= d
        chunk = max(1, limit // max(per_col, 1))
        if batch <= chunk:
            return fn(a)
        flat = a.reshape((-1,) + a.shape[-2:])
        outs = [fn(flat[i:i + chunk]) for i in range(0, batch, chunk)]
        out = jnp.concatenate(outs, axis=0)
        return out.reshape(a.shape[:-2] + out.shape[-2:])

    def _apply_sharded(self, log_n, a, inverse: bool):
        """Apply the sharded transform along axis -2, unrolling any batch
        dims (each column is one shard_map call)."""
        sn = self._sharded[log_n]
        fn = sn.inverse if inverse else sn.forward
        if a.ndim == 2:
            return fn(a)
        batch = a.shape[:-2]
        flat = a.reshape((-1,) + a.shape[-2:])
        out = jnp.stack([fn(flat[i]) for i in range(flat.shape[0])], axis=0)
        return out.reshape(batch + out.shape[-2:])

    def lagrange_to_coeff(self, a):
        a, typed = take(a, LAGRANGE, "lagrange_to_coeff")
        assert a.shape[-2] == self.n
        if self._mesh is not None:
            out = self._apply_sharded(self.k, a, inverse=True)
        else:
            out = self._chunk_batched(self._ntt.inverse, a, self.n)
        return Poly.coeff(out) if typed else out

    def coeff_to_lagrange(self, a):
        a, typed = take(a, COEFF, "coeff_to_lagrange")
        assert a.shape[-2] == self.n
        if self._mesh is not None:
            out = self._apply_sharded(self.k, a, inverse=False)
        else:
            out = self._chunk_batched(self._ntt.forward, a, self.n)
        return Poly.lagrange(out) if typed else out

    @functools.partial(jax.jit, static_argnums=0)
    def _distribute_zeta(self, a, pattern):
        n = a.shape[-2]
        reps = (n + 2) // 3
        scal = jnp.tile(pattern, (reps, 1))[:n]
        return self.F.mul(a, scal)

    def coeff_to_extended(self, a):
        """Coefficients -> evaluations over the zeta-coset extended domain
        (domain.rs:230-244)."""
        a, typed = take(a, COEFF, "coeff_to_extended")
        assert a.shape[-2] == self.n

        def one_chunk(c):
            c = self._distribute_zeta(c, self._zeta_fwd)
            pad = [(0, 0)] * c.ndim
            pad[-2] = (0, self.extended_n - self.n)
            c = jnp.pad(c, pad)
            if self._mesh is not None:
                return self._apply_sharded(self.extended_k, c, inverse=False)
            return self._ntt_ext.forward(c)

        out = self._chunk_batched(one_chunk, a, self.extended_n)
        return Poly.extended(out) if typed else out

    def extended_to_coeff(self, a):
        """Extended coset evaluations -> coefficient vector, truncated to
        n * quotient_poly_degree (domain.rs:271-293)."""
        a, typed = take(a, EXTENDED, "extended_to_coeff")
        assert a.shape[-2] == self.extended_n

        def one_chunk(c):
            if self._mesh is not None:
                c = self._apply_sharded(self.extended_k, c, inverse=True)
            else:
                c = self._ntt_ext.inverse(c)
            c = self._distribute_zeta(c, self._zeta_inv)
            return c[..., : self.n * self.quotient_poly_degree, :]

        out = self._chunk_batched(one_chunk, a, self.extended_n)
        return Poly.coeff(out) if typed else out

    def divide_by_vanishing_poly(self, a):
        a, typed = take(a, EXTENDED, "divide_by_vanishing_poly")
        out = self._divide_by_vanishing_jit(a)
        return Poly.extended(out) if typed else out

    @functools.partial(jax.jit, static_argnums=0)
    def _divide_by_vanishing_jit(self, a):
        assert a.shape[-2] == self.extended_n
        t = self.t_evaluations_inv
        reps = self.extended_n // t.shape[0]
        return self.F.mul(a, jnp.tile(t, (reps, 1)))

    def rotate_extended(self, a, rotation: Rotation):
        """Rotate over the original domain viewed inside the extended domain
        (domain.rs:247-263)."""
        a, typed = take(a, EXTENDED, "rotate_extended")
        shift = (1 << (self.extended_k - self.k)) * rotation.i
        out = jnp.roll(a, -shift, axis=-2)
        return Poly.extended(out) if typed else out

    def rotate_lagrange(self, a, rotation: Rotation):
        a, typed = take(a, LAGRANGE, "rotate_lagrange")
        out = jnp.roll(a, -rotation.i, axis=-2)
        return Poly.lagrange(out) if typed else out

    # ------------------------------------------------------------------
    # host-side scalar helpers (python ints)
    # ------------------------------------------------------------------

    def rotate_omega_int(self, value: int, rotation: Rotation) -> int:
        p = self.F.p
        if rotation.i >= 0:
            return (value * pow(self.omega, rotation.i, p)) % p
        return (value * pow(self.omega_inv, -rotation.i, p)) % p

    def l_i_range_int(self, x: int, xn: int, rotations) -> list:
        """Barycentric Lagrange-basis evaluations l_i(x) for each rotation i
        (domain.rs:425-450); host-side python ints, verifier-scale work."""
        p = self.F.p
        common = ((xn - 1) * self.barycentric_weight) % p
        out = []
        for rot in rotations:
            r = Rotation(rot) if not isinstance(rot, Rotation) else rot
            denom = (x - self.rotate_omega_int(1, r)) % p
            inv = pow(denom, p - 2, p)
            out.append(self.rotate_omega_int((inv * common) % p, r))
        return out

    def get_quotient_poly_degree(self) -> int:
        return self.quotient_poly_degree

    def __hash__(self):
        return hash((self.F.p, self.k, self.extended_k))

    def __eq__(self, other):
        return (isinstance(other, EvaluationDomain) and other.F == self.F
                and other.k == self.k and other.extended_k == self.extended_k)
