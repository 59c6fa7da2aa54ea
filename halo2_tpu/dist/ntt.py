"""Multi-chip NTT: four-step decomposition with all-to-all stage exchange.

The reference's `best_fft` (halo2_backend/src/arithmetic.rs:11) splits
butterfly stages over rayon threads in shared memory.  Across a TPU mesh the
natural factorization is the four-step algorithm: view the length-n array as
an (n1, n2) matrix with i = i1·n2 + i2; then

    NTT_n(x)[k2·n1 + k1] = NTT_n2( w^(i2·k1) · NTT_n1(x[:, i2])[k1] )[k2]

Each chip owns a row slab.  Three `all_to_all`s ride ICI: one to turn the
row slab into a column slab (so the length-n1 transform is chip-local), one
to return to row slabs for the length-n2 transform, and one for the final
global transpose so the output comes back in natural order, sharded on the
same row axis it arrived on.  All compute between exchanges is the same
single-chip NTT code (Pallas-fused for large local sizes).

Multi-host: pass a 2-D ``(hosts, rows)`` mesh (dist/multihost.py
``hybrid_mesh``) and the array shards over BOTH axes jointly — the
all-to-alls run over the combined axis tuple, so on a multi-host v5p
slice XLA routes them over the pod's ICI torus (hosts in a v5p pod are
ICI-connected; DCN is only crossed between pods).  On NIC-connected
hosts (v5e-style) each of the three exchanges moves (H-1)/H of the slab
over the NIC — tools/scaling_model.py models both profiles honestly; a
blocked-natural-order four-step cannot do better than three global
exchanges (one-exchange variants require cyclic input/output layouts,
which the prover's natural-order polynomial contract does not use).

The inter-step twiddle w^(i2·k1) depends on the chip's i2 slice, so it is
fed in as a sharded argument (the w^(i2) bases) and expanded on-chip by
log(n1) batched squarings — never materialized globally.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..fields.field import Field
from ..ntt.ntt import get_ntt, powers, fused_min_logn
from .mesh import ROW_AXIS


def _col_powers(F: Field, base, n: int):
    """Per-column power table: base (m, L) -> (n, m, L) with
    out[j, i] = base[i]^j, built by log(n) doubling rounds."""
    out = F.ones((1,) + base.shape[:-1])
    cur = base
    while out.shape[0] < n:
        take = min(out.shape[0], n - out.shape[0])
        out = jnp.concatenate([out, F.mul(out[:take], cur)], axis=0)
        cur = F.square(cur)
    return out


def _local_forward(ntt, x):
    """Forward transform along axis -2 using the plain or fused path.
    (`ntt` may be built on an inverse root — the CALLER owns 1/n.)"""
    if ntt.log_n >= fused_min_logn():
        f = ntt._fused()
        # direct jitted transform (inlines under the ambient shard_map
        # trace); inv=False so the trailing 1/n multiply is skipped
        return f._transform_jit(False, x, f._needed(False), f.n_inv)
    return ntt._transform(x, False)


class ShardedNTT:
    """Distributed NTT over a row-sharded (n, L) array.

    Matches `get_ntt(F, log_n)` on the same data: forward maps coefficients
    (natural order) to evaluations at w^k (natural order); inverse includes
    the 1/n divisor.  The mesh size must divide both n1 and n2.
    """

    def __init__(self, mesh, F: Field, log_n: int,
                 omega_int: int | None = None, log_n1: int | None = None):
        self.mesh = mesh
        self.F = F
        self.log_n = log_n
        self.n = 1 << log_n
        # 1-D ("rows") or multi-axis ((hosts, rows)) meshes: shard and
        # exchange over ALL mesh axes jointly
        self.axes = tuple(mesh.axis_names)
        self.n_dev = 1
        for a in self.axes:
            self.n_dev *= mesh.shape[a]
        if omega_int is None:
            assert log_n <= F.S
            omega_int = pow(F.root_of_unity, 1 << (F.S - log_n), F.p)
        self.omega_int = omega_int
        omega_inv = pow(omega_int, F.p - 2, F.p)

        if log_n1 is None:
            logd = (self.n_dev - 1).bit_length()
            log_n1 = max(log_n // 2, logd)
        self.log_n1, self.log_n2 = log_n1, log_n - log_n1
        n1, n2 = 1 << self.log_n1, 1 << self.log_n2
        assert n1 % self.n_dev == 0 and n2 % self.n_dev == 0, (
            f"mesh size {self.n_dev} must divide n1={n1} and n2={n2}")
        self.n1, self.n2 = n1, n2

        # chip-local transforms (twiddle tables built eagerly, outside jit);
        # the inverse pipeline runs FORWARD transforms on the inverse root
        # and applies the single 1/n divisor at the end.
        self.ntt1_f = get_ntt(F, self.log_n1, pow(omega_int, n2, F.p))
        self.ntt2_f = get_ntt(F, self.log_n2, pow(omega_int, n1, F.p))
        self.ntt1_i = get_ntt(F, self.log_n1, pow(omega_inv, n2, F.p))
        self.ntt2_i = get_ntt(F, self.log_n2, pow(omega_inv, n1, F.p))
        for ntt in (self.ntt1_f, self.ntt2_f, self.ntt1_i, self.ntt2_i):
            if ntt.log_n >= fused_min_logn():
                ntt._fused()
        # w^(i2) bases for the inter-step twiddle, sharded on i2
        shard = jax.sharding.NamedSharding(mesh, P(self.axes, None))
        self.tw_f = jax.device_put(powers(F, F.encode_int(omega_int), n2),
                                   shard)
        self.tw_i = jax.device_put(powers(F, F.encode_int(omega_inv), n2),
                                   shard)
        self.n_inv = F.encode_int(pow(self.n, F.p - 2, F.p))
        self._fwd = self._build(False)
        self._inv = self._build(True)

    def _build(self, inverse: bool):
        F, n1 = self.F, self.n1
        ntt1 = self.ntt1_i if inverse else self.ntt1_f
        ntt2 = self.ntt2_i if inverse else self.ntt2_f
        n_inv = self.n_inv
        axes = self.axes
        ax = axes if len(axes) > 1 else axes[0]

        @functools.partial(
            shard_map, mesh=self.mesh,
            in_specs=(P(axes, None, None), P(axes, None)),
            out_specs=P(axes, None), check_vma=False)
        def go(x, tw_base):
            # x: (n1/D, n2, L) row slab; tw_base: (n2/D, L) = w^(i2) slice
            x = jax.lax.all_to_all(x, ax, split_axis=1, concat_axis=0,
                                   tiled=True)               # (n1, n2/D, L)
            # length-n1 transform down the columns
            x = jnp.swapaxes(x, 0, 1)                        # (n2/D, n1, L)
            x = _local_forward(ntt1, x)
            x = jnp.swapaxes(x, 0, 1)                        # (n1, n2/D, L)
            # inter-step twiddle w^(i2·k1): per-column powers of w^(i2)
            x = F.mul(x, _col_powers(F, tw_base, n1))
            x = jax.lax.all_to_all(x, ax, split_axis=0, concat_axis=1,
                                   tiled=True)               # (n1/D, n2, L)
            # length-n2 transform along the rows
            x = _local_forward(ntt2, x)
            # global transpose -> natural order, row-sharded on k
            x = jax.lax.all_to_all(x, ax, split_axis=1, concat_axis=0,
                                   tiled=True)               # (n1, n2/D, L)
            x = jnp.swapaxes(x, 0, 1)                        # (n2/D, n1, L)
            x = x.reshape(-1, x.shape[-1])
            if inverse:
                x = F.mul(x, n_inv)
            return x

        return jax.jit(go)

    def forward(self, a):
        """a: (n, L) row-sharded coefficients -> (n, L) evaluations."""
        return self._fwd(a.reshape(self.n1, self.n2, -1), self.tw_f)

    def inverse(self, a):
        """a: (n, L) evaluations -> coefficients (includes 1/n)."""
        return self._inv(a.reshape(self.n1, self.n2, -1), self.tw_i)
