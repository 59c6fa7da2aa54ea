"""Fused Pallas NTT: four-step (Bailey) decomposition with VMEM-resident
butterfly stages.

The XLA stage-per-op NTT in ntt.py round-trips the whole array through HBM
~3x per stage (log n stages).  This path instead splits the transform as
n = n1 * n2 (recursively, n1 <= 512): each size-n1 column NTT runs entirely
inside one Pallas kernel — bit-reversed load, log(n1) butterfly stages over
VMEM-resident limbs, twiddle tables staged once — so HBM sees only a few
linear passes regardless of n.  The mid twiddle w^(i2*k1) and the axis
transpose between the two half-transforms are plain XLA ops.

Replaces the hot path of the reference's `best_fft`
(halo2_backend/src/arithmetic.rs:11, halo2curves fft).  The four-step
structure is also the multi-chip story: local column NTTs + all-to-all
transpose (SURVEY.md §5.7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import Field, NLIMBS
from .ntt import bit_reverse_indices  # noqa: F401 (kept for plain-path callers)

MAX_BASE = 128       # largest single-kernel NTT (sublane dim of the block);
                     # 128 keeps the kernel's live temps (~6 x 16*m*tile*4B)
                     # + double-buffered I/O well under the 16MB scoped-VMEM
                     # limit with full 128-lane tiles
LANE_TILE = 128      # lanes per grid step
LOG_MAX_BASE = 7


def _pow_table_host(F: Field, base_int: int, n: int) -> np.ndarray:
    """[base^0 .. base^{n-1}] as (n, NLIMBS) Montgomery uint32 (host build)."""
    out = np.zeros((n, NLIMBS), np.uint32)
    cur = F.to_mont_int(1)
    base_m = F.to_mont_int(base_int)
    rinv = F.R_inv
    for i in range(n):
        for l in range(NLIMBS):
            out[i, l] = (cur >> (16 * l)) & 0xFFFF
        cur = (cur * base_m % F.p) * rinv % F.p
    return out


@functools.partial(jax.jit, static_argnums=(0, 3))
def _base_ntt_jnp(F: Field, x, table, log_m: int):
    """Pure-jnp base NTT (CPU fallback), same contract as _base_ntt:
    Stockham radix-2, NATURAL input and output order."""
    m = 1 << log_m
    xt = jnp.moveaxis(x, 0, -1)                         # (m, B, L)
    tb = jnp.moveaxis(table, 0, -1)                     # (log_m, m//2, L)
    for t in range(log_m):
        a = xt[: m // 2]
        b = xt[m // 2:]
        s = F.add(a, b)
        d = F.sub(a, b)
        if t < log_m - 1:          # last stage's twiddles are all 1
            d = F.mul(d, tb[t][:, None, :])
        l = m >> (t + 1)
        r = 1 << t
        xt = jnp.stack([s.reshape(l, r, -1, NLIMBS),
                        d.reshape(l, r, -1, NLIMBS)],
                       axis=1).reshape(m, -1, NLIMBS)
    return jnp.moveaxis(xt, -1, 0)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _base_ntt(F: Field, x, table, log_m: int):
    """Single-kernel NTT along axis 1 of x: (NLIMBS, m, B) with m = 2^log_m
    <= MAX_BASE.  `table` (NLIMBS, log_m, m//2): per-stage EXPANDED
    Stockham twiddles (row t holds w^(r*floor(j/r)) for j < m/2, r = 2^t).

    Stockham radix-2 (self-sorting): natural-order input AND output — the
    DIT kernel this replaces needed a bit-reversal `take` on the m axis
    before every base call, a full-array HBM gather per recursion level.
    Per stage: split the m axis in halves a/b, then s = a+b,
    d = (a-b)*w, written interleaved as (l, 2, r) -> m."""
    if jax.default_backend() == "cpu":
        return _base_ntt_jnp(F, x, table, log_m)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..fields.pallas_ops import _mont_mul_body, _add_body, _sub_body

    m = 1 << log_m
    B = x.shape[2]
    half = m // 2
    tile = min(LANE_TILE, B)
    while B % tile:
        tile //= 2
    grid = (B // tile,)

    def kernel(x_ref, t_ref, o_ref, v_ref):
        # each stage round-trips through the v_ref scratch so Mosaic's stack
        # allocator can reuse the butterfly temporaries between the unrolled
        # stages (pure-value chaining kept ALL stages' temps live at once
        # and blew the 16MB scoped-VMEM limit)
        for t in range(log_m):
            src = x_ref if t == 0 else v_ref
            a = [src[i][:half] for i in range(NLIMBS)]
            b = [src[i][half:] for i in range(NLIMBS)]
            s = _add_body(F, a, b)
            d = _sub_body(F, a, b)
            if t < log_m - 1:      # last stage's twiddles are all 1
                tw = [t_ref[i][t][:, None] for i in range(NLIMBS)]
                d = _mont_mul_body(F, d, tw)
            l = m >> (t + 1)
            r = 1 << t
            dst = o_ref if t == log_m - 1 else v_ref
            for i in range(NLIMBS):
                dst[i] = jnp.stack(
                    [s[i].reshape(l, r, tile), d[i].reshape(l, r, tile)],
                    axis=1).reshape(m, tile)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((NLIMBS, m, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMBS, max(log_m, 1), half), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NLIMBS, m, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NLIMBS, m, B), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((NLIMBS, m, tile), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            # Mosaic's stack estimate keeps every unrolled stage's butterfly
            # temps live; the default 16MB scoped-VMEM cap rejects that even
            # though the true working set fits easily (v5e VMEM = 128MB)
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, table)


class FusedNTT:
    """Cached tables + four-step transform for one (field, n, omega).

    The twiddle tables are passed to the jitted transform as ARGUMENTS, not
    closed-over constants: a captured device array is embedded into the
    MLIR module at every lowering, which (a) fetches the array to the host
    — the top-level mid table at 2^21 is 134MB, minutes through the
    remote-TPU tunnel — and (b) bloats the HLO so the persistent compile
    cache stores giant entries keyed per-constant.  As parameters the
    tables stay device-resident and lowering is instant."""

    def __init__(self, F: Field, log_n: int, omega_int: int):
        assert pow(omega_int, 1 << log_n, F.p) == 1
        self.F = F
        self.log_n = log_n
        self.n = 1 << log_n
        self.omega_int = omega_int
        self.omega_inv_int = pow(omega_int, F.p - 2, F.p)
        with jax.ensure_compile_time_eval():
            self.n_inv = F.encode_int(pow(self.n, F.p - 2, F.p))
        self._plan_info: dict = {}     # log_m -> ("base",) | ("split",l1,l2)
        self._arrays: dict = {}        # str key -> device array (jit args)
        self._plan(log_n)

    def _plan(self, log_m: int):
        """Precompute tables for every recursion level."""
        if log_m in self._plan_info:
            return
        if log_m <= LOG_MAX_BASE:
            half = max(1 << (log_m - 1), 1)
            for inv in (False, True):
                w = self.omega_inv_int if inv else self.omega_int
                wm = pow(w, self.n >> log_m, self.F.p)
                ptab = _pow_table_host(self.F, wm, half)   # (half, L)
                # Stockham stage twiddles, EXPANDED per stage: row t holds
                # wm^(r * floor(j/r)) for j < m/2 with r = 2^t (natural
                # in/out order — no bit-reversal gather anywhere)
                stage = np.zeros((max(log_m, 1), half, NLIMBS), np.uint32)
                j = np.arange(half)
                for t in range(log_m):
                    r = 1 << t
                    stage[t] = ptab[(j // r) * r]
                with jax.ensure_compile_time_eval():
                    self._arrays[f"{log_m}:{int(inv)}:base"] = jnp.asarray(
                        np.moveaxis(stage, -1, 0))         # (L, log_m, half)
            self._plan_info[log_m] = ("base",)
            return
        l1 = min(LOG_MAX_BASE, (log_m + 1) // 2)
        l2 = log_m - l1
        n1, n2 = 1 << l1, 1 << l2
        from .ntt import powers
        from ..aot import trace_state_clean
        in_trace = not trace_state_clean()
        for inv in (False, True):
            w = self.omega_inv_int if inv else self.omega_int
            wm = pow(w, self.n >> log_m, self.F.p)
            # mid twiddle w_m^{k1*i2}: gather from the full power table via
            # exponent (k1*i2 mod m) — one-time build, cached.  The tables
            # must be CONCRETE device arrays (they are jit arguments of the
            # transform): when the plan is built lazily from inside an
            # ambient jit trace (e.g. ntt.forward chained in a caller's
            # fori_loop) the device build would leak tracers, so fall back
            # to a pure-numpy host build there.
            expo = (np.arange(n1, dtype=np.int64)[:, None]
                    * np.arange(n2, dtype=np.int64)[None, :]) % (1 << log_m)
            if in_trace:
                # pure numpy build (device ops would trace); the final
                # asarray runs under ensure_compile_time_eval so the stored
                # table is a CONCRETE array, not a trace-scoped constant
                full = _pow_table_host(self.F, wm, 1 << log_m)   # (m, L)
                tw_np = full[expo.reshape(-1)].reshape(n1, n2, NLIMBS)
                with jax.ensure_compile_time_eval():
                    tw = jnp.asarray(np.moveaxis(tw_np, -1, 0).copy())
            else:
                full = powers(self.F, self.F.encode_int(wm), 1 << log_m)
                tw = jnp.moveaxis(
                    jnp.take(full, jnp.asarray(expo.reshape(-1), jnp.int32),
                             axis=0).reshape(n1, n2, NLIMBS), -1, 0)
            self._arrays[f"{log_m}:{int(inv)}:mid"] = tw
        self._plan_info[log_m] = ("split", l1, l2)
        self._plan(l1)
        self._plan(l2)

    def _ntt_mid(self, x, log_m: int, inv: bool, arrays):
        """NTT along axis 1 of (NLIMBS, m, B)."""
        F = self.F
        plan = self._plan_info[log_m]
        if plan[0] == "base":
            return _base_ntt(F, x, arrays[f"{log_m}:{int(inv)}:base"], log_m)
        _, l1, l2 = plan
        n1, n2 = 1 << l1, 1 << l2
        B = x.shape[2]
        x = x.reshape(NLIMBS, n1, n2 * B)
        x = self._ntt_mid(x, l1, inv, arrays)             # over i1
        x = x.reshape(NLIMBS, n1, n2, B)
        tw = arrays[f"{log_m}:{int(inv)}:mid"]            # (L, n1, n2)
        # limb-major fused multiply: the data is already (L, ...) here, and
        # the limb-last F.mul would moveaxis the whole array to (..., L)
        # and back — two full HBM round trips per twiddle stage
        from ..fields.pallas_ops import mont_mul_lm
        x = mont_mul_lm(F, x, tw[..., None])
        x = jnp.swapaxes(x, 1, 2)                         # (L, n2, n1, B)
        x = x.reshape(NLIMBS, n2, n1 * B)
        x = self._ntt_mid(x, l2, inv, arrays)             # over i2
        return x.reshape(NLIMBS, n2 * n1, B)              # k2*n1 + k1 = k

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def _transform_jit(self, inv: bool, a, arrays, n_inv):
        # jitted end-to-end (per input shape): the mid twiddles, transposes
        # and base kernels fuse into one executable — the eager version paid
        # ~30 dispatch round-trips per transform, which dominated wall time
        # through the remote-TPU tunnel.
        #
        # Batch layout (round 5): the limb boundary transposes are done as
        # 2-D (B*n, L) <-> (L, B*n) transposes and the batch rides MAJOR
        # inside the four-step.  The natural 3-D form
        # (B, n, L) -> (L, n, B) leaves B (= a handful of columns) on the
        # minor dim and measured only ~21 GB/s on v5e; the 2-D form hits
        # XLA's fast path (~59 GB/s) and every internal exchange then
        # keeps a LARGE minor dim (tools/ntt_batch_probe.py,
        # tools/transpose_probe.py — at B=8/k=18 the boundary was ~64% of
        # the whole batched transform).
        F, n = self.F, self.n
        assert a.shape[-2] == n
        batch = a.shape[:-2]
        B = 1
        for d in batch:
            B *= d
        x = a.reshape(B * n, NLIMBS).T                     # (L, B*n) fast 2-D
        plan = self._plan_info[self.log_n]
        if plan[0] == "base" or B == 1:
            x = x.reshape(NLIMBS, B, n)
            x = jnp.swapaxes(x, 1, 2).reshape(NLIMBS, n, B)
            x = self._ntt_mid(x, self.log_n, inv, arrays)
            x = jnp.swapaxes(x.reshape(NLIMBS, n, B), 1, 2)
        else:
            _, l1, l2 = plan
            n1, n2 = 1 << l1, 1 << l2
            x = x.reshape(NLIMBS, B, n1, n2)
            x = jnp.swapaxes(x, 1, 2)                      # (L, n1, B, n2)
            x = self._ntt_mid(x.reshape(NLIMBS, n1, B * n2), l1, inv,
                              arrays)                      # over i1
            x = x.reshape(NLIMBS, n1, B, n2)
            tw = arrays[f"{self.log_n}:{int(inv)}:mid"]    # (L, n1, n2)
            from ..fields.pallas_ops import mont_mul_lm
            x = mont_mul_lm(F, x, tw[:, :, None, :])
            x = jnp.transpose(x, (0, 3, 2, 1))             # (L, n2, B, n1)
            x = self._ntt_mid(x.reshape(NLIMBS, n2, B * n1), l2, inv,
                              arrays)                      # over i2
            x = x.reshape(NLIMBS, n2, B, n1)
            x = jnp.swapaxes(x, 1, 2)                      # (L, B, n2, n1)
        x = x.reshape(NLIMBS, B * n).T                     # fast 2-D back
        x = x.reshape(batch + (n, NLIMBS))
        if inv:
            x = F.mul(x, n_inv)
        return x

    def _needed(self, inv: bool) -> dict:
        """The argument subset for one direction (the other direction's mid
        tables are as large as the data — don't bind them needlessly)."""
        key = f"_needed_{int(inv)}"
        if not hasattr(self, key):
            setattr(self, key, {
                k: v for k, v in self._arrays.items()
                if k.endswith(":rev") or f":{int(inv)}:" in k})
        return getattr(self, key)

    def _aot(self, inv: bool):
        """AOT-export wrapper per direction (aot.py): the fused transform is
        a large trace at big n; fresh processes load the artifact instead."""
        key = f"_aot_{int(inv)}"
        if not hasattr(self, key):
            from ..aot import aot
            setattr(self, key, aot(
                jax.jit(lambda a, arrays, n_inv:
                        self._transform_jit(inv, a, arrays, n_inv)),
                f"fused_ntt_{'inv' if inv else 'fwd'}",
                salt=f"{self.F.name}-n{self.n}-w{self.omega_int}"))
        return getattr(self, key)

    def forward(self, a):
        return self._aot(False)(a, self._needed(False), self.n_inv)

    def inverse(self, a):
        return self._aot(True)(a, self._needed(True), self.n_inv)
