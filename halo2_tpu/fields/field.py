"""TPU-native prime-field arithmetic.

Field elements are represented as arrays of 16 unsigned 16-bit limbs stored in
``uint32`` lanes (little-endian limb order), kept in Montgomery form with
R = 2**256.  All arithmetic stays inside uint32 — products of 16-bit limbs fit
exactly, and column accumulations are bounded well below 2**32 — so the kernels
run unmodified on TPU (which has no native 64-bit integer multiply) and on CPU
with x64 disabled.

This layer replaces the reference's external ``halo2curves`` field arithmetic
(see /root/reference SURVEY: `halo2_middleware/src/zal.rs`,
`halo2_backend/src/arithmetic.rs`) with batched, jit-friendly JAX ops: every
operation is elementwise over an arbitrary leading batch shape, so the natural
unit of work is a whole polynomial column rather than a scalar.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Method-level jit: `self` (a Field) is hashable and static, so each field's
# ops compile once per input shape.  Without this, eager dispatch of the limb
# scans dominates (~1000x slower than the compiled op).
_jit = functools.partial(jax.jit, static_argnums=0)

NLIMBS = 16
LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1
NBITS = NLIMBS * LIMB_BITS  # 256


def _int_to_limbs(x: int) -> np.ndarray:
    return np.array([(x >> (LIMB_BITS * i)) & MASK for i in range(NLIMBS)],
                    dtype=np.uint32)


def _limbs_to_int(limbs) -> int:
    out = 0
    for i in range(NLIMBS):
        out |= int(limbs[i]) << (LIMB_BITS * i)
    return out



def _use_pallas() -> bool:
    """Use the fused Pallas limb kernels on accelerators (fields/pallas_ops
    keeps the whole Montgomery multiply in VMEM — ~100x less HBM traffic
    than the elementwise jnp lowering)."""
    try:
        import os
        if os.environ.get("HALO2_TPU_NO_PALLAS"):
            return False
        if jax.default_backend() == "cpu":
            return False
    except Exception:
        return False
    try:
        # under jax.ensure_compile_time_eval (= eager_constant_folding) a
        # pallas kernel trace materializes every scalar as a captured
        # constant, which pallas_call rejects — use the jnp lowering for
        # those one-time table builds.  The flag is include_in_jit_key so
        # the two paths never share a cached executable.
        from jax._src import config as _cfg
        if _cfg.eager_constant_folding.value:
            return False
    except Exception:
        pass  # private-API drift: assume not in a cte context
    return True


def _unroll() -> bool:
    """Unroll limb loops on accelerators (fusion >> compile time there);
    keep rolled scans on CPU where XLA compile time dominates test latency."""
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False

def _carry_propagate(acc):
    """Normalize relaxed limbs (< 2**32) to 16-bit limbs with full carry chain.

    acc: (..., L) uint32 with arbitrary per-limb magnitudes.  Returns
    (limbs (..., L) each < 2**16, carry_out (...,)).
    """
    limbs = jnp.moveaxis(acc, -1, 0)  # (L, ...)

    def step(carry, limb):
        v = limb + carry
        return v >> LIMB_BITS, v & MASK

    carry_out, out = jax.lax.scan(step, jnp.zeros_like(limbs[0]), limbs, unroll=_unroll())
    return jnp.moveaxis(out, 0, -1), carry_out


def _sub_limbs(a, b):
    """(a - b) over 16-bit limb arrays; returns (diff, borrow_out in {0,1})."""
    a, b = jnp.broadcast_arrays(a, b)
    al = jnp.moveaxis(a, -1, 0)
    bl = jnp.moveaxis(b, -1, 0)

    def step(borrow, ab):
        x, y = ab
        v = x + jnp.uint32(1 << LIMB_BITS) - y - borrow
        return jnp.uint32(1) - (v >> LIMB_BITS), v & MASK

    borrow, out = jax.lax.scan(step, jnp.zeros_like(al[0]), (al, bl), unroll=_unroll())
    return jnp.moveaxis(out, 0, -1), borrow


def _geq(a, b):
    """a >= b for canonical 16-bit limb arrays; returns bool (...)."""
    _, borrow = _sub_limbs(a, b)
    return borrow == 0


class Field:
    """A prime field instance with device-ready constants and batched ops.

    Mirrors the capability surface of `ff::PrimeField`/`ff::WithSmallOrderMulGroup`
    as used by the reference (ROOT_OF_UNITY, DELTA, ZETA, TWO_INV, S — see
    `halo2_backend/src/poly/domain.rs:56-126`).
    """

    def __init__(self, name: str, modulus: int, generator: int,
                 zeta: int = None):
        assert modulus < (1 << 255)
        self.name = name
        self.p = modulus
        self.generator = generator

        # 2-adicity: p - 1 = 2**S * t with t odd
        t = modulus - 1
        s = 0
        while t % 2 == 0:
            t //= 2
            s += 1
        self.S = s
        self.t_odd = t
        self.root_of_unity = pow(generator, t, modulus)
        self.root_of_unity_inv = pow(self.root_of_unity, modulus - 2, modulus)
        self.delta = pow(generator, 1 << s, modulus)
        self.two_inv = pow(2, modulus - 2, modulus)
        # primitive cube root of unity.  The two nontrivial roots are both
        # valid; each reference field PINS one (consensus-critical: it is
        # the extended-domain coset generator, domain.rs:83).  Callers pass
        # the pinned value (fields/constants.py documents provenance);
        # absent that, default to generator^((p-1)/3).
        if zeta is not None:
            assert zeta != 1 and pow(zeta, 3, modulus) == 1
            self.zeta = zeta
        elif (modulus - 1) % 3 == 0:
            self.zeta = pow(generator, (modulus - 1) // 3, modulus)
        else:
            self.zeta = None

        # Montgomery constants
        self.R = (1 << NBITS) % modulus
        self.R2 = (self.R * self.R) % modulus
        self.R_inv = pow(self.R, modulus - 2, modulus)
        # n0 = -p^{-1} mod 2**16
        self.n0 = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)

        self.p_limbs = _int_to_limbs(modulus)
        self._one_mont = _int_to_limbs(self.R)
        self._r2_mont = _int_to_limbs(self.R2)
        self._zero = np.zeros(NLIMBS, dtype=np.uint32)

    # ------------------------------------------------------------------
    # host-side conversions (python ints <-> limb arrays)
    # ------------------------------------------------------------------

    def to_mont_int(self, x: int) -> int:
        return (x * self.R) % self.p

    def from_mont_int(self, x: int) -> int:
        return (x * self.R_inv) % self.p

    def encode_ints(self, xs) -> jnp.ndarray:
        """Python ints (canonical) -> Montgomery limb array (n, NLIMBS).
        Bulk path: serialize via int.to_bytes (C-speed), reinterpret as
        16-bit limbs, and run the canonical->Montgomery multiply on device
        (one batched mul by R^2) instead of per-value python bigint math."""
        vals = [int(x) % self.p for x in np.asarray(xs, dtype=object).ravel()]
        if not vals:
            return jnp.zeros((0, NLIMBS), jnp.uint32)
        buf = b"".join(v.to_bytes(32, "little") for v in vals)
        # ship 16-bit limbs (2B each) and upcast ON DEVICE: host->device
        # transfer is the cost at prover scale (remote-TPU tunnel)
        arr = np.frombuffer(buf, dtype="<u2").reshape(len(vals), NLIMBS)
        return self.to_mont(jnp.asarray(arr).astype(jnp.uint32))

    def encode_ints_cols(self, cols) -> jnp.ndarray:
        """List of m equal-length columns of python ints -> (m, n, NLIMBS)
        Montgomery limb array with ONE host serialization pass and ONE
        device to-Montgomery dispatch (the per-column encode_ints loop in
        the prover's commit_phase was the dominant host cost at k=18)."""
        m = len(cols)
        if m == 0:
            return jnp.zeros((0, 0, NLIMBS), jnp.uint32)
        n = len(cols[0])
        p = self.p
        buf = b"".join((v % p).to_bytes(32, "little")
                       for col in cols for v in col)
        arr = np.frombuffer(buf, dtype="<u2").reshape(m, n, NLIMBS)
        return self.to_mont(jnp.asarray(arr).astype(jnp.uint32))

    def encode_int(self, x: int) -> jnp.ndarray:
        return jnp.asarray(_int_to_limbs(self.to_mont_int(int(x) % self.p)))

    def decode_ints(self, arr) -> list:
        """Montgomery limb array (..., NLIMBS) -> list of canonical python
        ints.  Montgomery reduction runs batched on device; the host just
        reassembles 32-byte little-endian integers."""
        if arr.size == 0:
            return []
        # cast to 16-bit ON DEVICE: the device->host fetch is the cost at
        # prover scale (remote-TPU tunnel), and limbs are < 2^16 canonical
        canon = jax.device_get(self._from_mont_u16(arr))
        a = np.asarray(canon).reshape(-1, NLIMBS)
        buf = a.astype("<u2").tobytes()
        return [int.from_bytes(buf[i * 32:(i + 1) * 32], "little")
                for i in range(a.shape[0])]

    def decode_int(self, arr) -> int:
        return self.decode_ints(arr)[0]

    # canonical (non-Montgomery) byte serialization, matching the reference's
    # `to_repr` little-endian 32-byte form (halo2_backend/src/transcript.rs:241)
    def to_repr(self, x: int) -> bytes:
        return int(x % self.p).to_bytes(32, "little")

    def from_repr(self, b: bytes) -> int:
        x = int.from_bytes(b, "little")
        if x >= self.p:
            raise ValueError(f"non-canonical field repr for {self.name}")
        return x

    def from_uniform_bytes(self, b: bytes) -> int:
        """64 uniform bytes -> field element (little-endian wide reduction),
        matching halo2curves `FromUniformBytes<64>` as used by Challenge255
        (halo2_backend/src/transcript.rs:508-540)."""
        assert len(b) == 64
        return int.from_bytes(b, "little") % self.p

    # ------------------------------------------------------------------
    # device constants / constructors
    # ------------------------------------------------------------------

    def zeros(self, shape=()) -> jnp.ndarray:
        return jnp.zeros(tuple(shape) + (NLIMBS,), dtype=jnp.uint32)

    def ones(self, shape=()) -> jnp.ndarray:
        return jnp.broadcast_to(jnp.asarray(self._one_mont),
                                tuple(shape) + (NLIMBS,))

    def full(self, shape, x: int) -> jnp.ndarray:
        limbs = _int_to_limbs(self.to_mont_int(int(x) % self.p))
        return jnp.broadcast_to(jnp.asarray(limbs), tuple(shape) + (NLIMBS,))

    # ------------------------------------------------------------------
    # batched modular arithmetic (Montgomery form, canonical < p)
    # ------------------------------------------------------------------

    def _cond_sub_p(self, limbs):
        p = jnp.asarray(self.p_limbs)
        p = jnp.broadcast_to(p, limbs.shape)
        diff, borrow = _sub_limbs(limbs, p)
        return jnp.where((borrow == 0)[..., None], diff, limbs)

    @_jit
    def add(self, a, b):
        if _use_pallas():
            from . import pallas_ops
            return pallas_ops.mod_add(self, a, b)
        s = a + b  # limbs < 2**17, exact in uint32
        s, _ = _carry_propagate(s)
        return self._cond_sub_p(s)

    @_jit
    def sub(self, a, b):
        if _use_pallas():
            from . import pallas_ops
            return pallas_ops.mod_sub(self, a, b)
        d, borrow = _sub_limbs(a, b)
        # if borrowed, add p back
        pa = d + jnp.asarray(self.p_limbs)
        pa, _ = _carry_propagate(pa)
        return jnp.where((borrow == 1)[..., None], pa, d)

    @_jit
    def neg(self, a):
        return self.sub(self.zeros(a.shape[:-1]), a)

    @_jit
    def double(self, a):
        return self.add(a, a)

    @_jit
    def mul(self, a, b):
        """Montgomery product a*b*R^{-1} mod p, batched over leading dims."""
        if _use_pallas():
            from . import pallas_ops
            return pallas_ops.mont_mul(self, a, b)
        a, b = jnp.broadcast_arrays(a, b)
        batch = a.shape[:-1]
        acc = jnp.zeros(batch + (2 * NLIMBS + 1,), dtype=jnp.uint32)
        bl = jnp.moveaxis(b, -1, 0)  # (L, ...)

        # schoolbook product with per-product lo/hi split; column sums stay
        # below 2**22 (see module docstring for the bound analysis)
        def prod_step(carry, bj):
            acc, j = carry
            p = a * bj[..., None]                       # < 2**32 exact
            lo = p & MASK
            hi = p >> LIMB_BITS
            contrib = jnp.concatenate(
                [lo, jnp.zeros(batch + (1,), jnp.uint32)], axis=-1)
            contrib = contrib.at[..., 1:].add(hi)
            window = jax.lax.dynamic_slice_in_dim(acc, j, NLIMBS + 1, axis=-1)
            acc = jax.lax.dynamic_update_slice_in_dim(
                acc, window + contrib, j, axis=-1)
            return (acc, j + 1), None

        (acc, _), _ = jax.lax.scan(prod_step, (acc, 0), bl, unroll=_unroll())

        # Montgomery reduction: clear the low NLIMBS limbs one at a time
        p_limbs = jnp.asarray(self.p_limbs)
        n0 = jnp.uint32(self.n0)

        def red_step(carry, _):
            acc, i = carry
            window = jax.lax.dynamic_slice_in_dim(acc, i, NLIMBS + 1, axis=-1)
            ti = window[..., 0]
            m = ((ti & MASK) * n0) & MASK
            mp = m[..., None] * p_limbs                  # < 2**32 exact
            lo = mp & MASK
            hi = mp >> LIMB_BITS
            contrib = jnp.concatenate(
                [lo, jnp.zeros(batch + (1,), jnp.uint32)], axis=-1)
            contrib = contrib.at[..., 1:].add(hi)
            window = window + contrib
            # window[0] now has zero low bits; push its carry into limb 1
            carry_bits = window[..., 0] >> LIMB_BITS
            window = window.at[..., 0].set(0)
            window = window.at[..., 1].add(carry_bits)
            acc = jax.lax.dynamic_update_slice_in_dim(acc, window, i, axis=-1)
            return (acc, i + 1), None

        (acc, _), _ = jax.lax.scan(red_step, (acc, 0), None, length=NLIMBS, unroll=_unroll())

        hi = acc[..., NLIMBS:]
        out, _ = _carry_propagate(hi)          # (..., NLIMBS+1); top limb is 0
        out = out[..., :NLIMBS]
        return self._cond_sub_p(out)

    @_jit
    def square(self, a):
        return self.mul(a, a)

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def mul_pow2(self, a, k: int):
        """a * 2**k via k doublings (small k only)."""
        for _ in range(k):
            a = self.add(a, a)
        return a

    @_jit
    def to_mont(self, a_canonical):
        """canonical limb array -> Montgomery form (multiply by R**2)."""
        return self.mul(a_canonical, jnp.asarray(self._r2_mont))

    @_jit
    def from_mont(self, a_mont):
        """Montgomery form -> canonical limb array (multiply by 1)."""
        one = jnp.zeros(NLIMBS, jnp.uint32).at[0].set(1)
        return self.mul(a_mont, one)

    @_jit
    def _from_mont_u16(self, a_mont):
        """from_mont narrowed to uint16 on device (canonical limbs are
        < 2^16) — halves the device->host fetch for bulk decodes."""
        return self.from_mont(a_mont).astype(jnp.uint16)

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def pow(self, a, e: int):
        """a**e for a static python-int exponent (square-and-multiply scan)."""
        e = int(e) % (self.p - 1) if e >= self.p - 1 else int(e)
        if e == 0:
            return self.ones(a.shape[:-1])
        bits = jnp.asarray(
            np.array([(e >> i) & 1 for i in range(e.bit_length())],
                     dtype=np.uint32))

        def step(carry, bit):
            acc, base = carry
            acc2 = self.mul(acc, base)
            acc = jnp.where((bit == 1)[..., None] if bit.ndim else bit == 1,
                            acc2, acc)
            return (acc, self.square(base)), None

        (acc, _), _ = jax.lax.scan(step, (self.ones(a.shape[:-1]), a), bits)
        return acc

    @_jit
    def inv(self, a):
        """Modular inverse via Fermat; maps 0 -> 0 (matching ff::invert-with-
        skip semantics used by batch_invert)."""
        return self.pow(a, self.p - 2)

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def batch_inv(self, a, axis: int = 0):
        """Batch inversion (Montgomery's trick) along ``axis``; zeros stay zero.

        Replaces rayon'd `batch_invert` usage (e.g. lookup/permutation grand
        products, halo2_backend/src/plonk/lookup/prover.rs:182-324)."""
        a = jnp.moveaxis(a, axis, 0)
        is_zero = self.is_zero(a)
        safe = jnp.where(is_zero[..., None], self.ones(a.shape[:-1]), a)

        # Hillis-Steele prefix/suffix products via fori_loop with a dynamic
        # shift: exactly ONE field-mul kernel instance in the compiled
        # program per scan (an associative_scan would inline the Montgomery
        # multiply at every one of its ~2*log(n) combine nodes, which blows
        # up XLA compile memory for large n).
        n = a.shape[0]
        rows = jnp.arange(n).reshape((n,) + (1,) * (a.ndim - 1))
        ones = self.ones(a.shape[:-1])

        def scan_dir(x, reverse: bool):
            def round_(r, v):
                d = jnp.int32(1) << r
                shifted = jnp.roll(v, -d if reverse else d, axis=0)
                mask = (rows < n - d) if reverse else (rows >= d)
                prev = jnp.where(mask, shifted, ones)
                return self.mul(v, prev)

            return jax.lax.fori_loop(0, max((n - 1).bit_length(), 1),
                                     round_, x)

        prefix = scan_dir(safe, False)
        suffix = scan_dir(safe, True)
        total_inv = self.inv(prefix[-1])

        ones1 = self.ones((1,) + a.shape[1:-1])
        prefix_excl = jnp.concatenate([ones1, prefix[:-1]], axis=0)
        suffix_excl = jnp.concatenate([suffix[1:], ones1], axis=0)
        inv = self.mul(self.mul(prefix_excl, suffix_excl), total_inv)
        inv = jnp.where(is_zero[..., None], self.zeros(a.shape[:-1]), inv)
        return jnp.moveaxis(inv, 0, axis)

    # ------------------------------------------------------------------
    # predicates / selection
    # ------------------------------------------------------------------

    @_jit
    def eq(self, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        return jnp.all(a == b, axis=-1)

    @_jit
    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def select(self, cond, a, b):
        """cond ? a : b with cond shaped like the batch dims."""
        return jnp.where(jnp.asarray(cond)[..., None], a, b)

    # ------------------------------------------------------------------
    # misc host helpers
    # ------------------------------------------------------------------

    def rand_ints(self, n: int, rng) -> list:
        return [rng.randrange(self.p) for _ in range(n)]

    def __repr__(self):
        return f"Field({self.name})"

    def __hash__(self):
        return hash((self.name, self.p))

    def __eq__(self, other):
        return isinstance(other, Field) and other.p == self.p
