"""IPA (inner-product argument) polynomial commitment scheme.

Behavioral equivalent of halo2_backend/src/poly/ipa/* re-designed for the
device/host split: polynomials and generator vectors are device-resident
arrays, MSMs/folds run batched on device, while blinds/challenges/transcript
traffic stay host-side python ints.

Parameter generation is byte-identical to the reference for the Pasta
curves: g[i]/w/u come from the pasta_curves-compatible
hash_to_curve("Halo2-Parameters") (curves/hash_to_curve.py, constants
re-derived in tools/derive_iso.py and pinned against the reference's golden
vk).  Structure (g, g_lagrange via group iFFT, w, u) matches
poly/ipa/commitment.rs:26-33,156-214.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
import os
import struct

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.curve import Curve
from ..curves.point_ntt import g_to_lagrange
from ..fields.field import NLIMBS
from ..msm import msm
from ..msm.msm import CachedMSM
from ..ntt import powers
from ..poly.arith import (
    compute_inner_product, eval_polynomial, lagrange_interpolate_int,
    eval_polynomial_int,
)
from .base import Blind

_PARAMS_CACHE = os.path.join(
    os.environ.get("HALO2_TPU_CACHE",
                   os.path.expanduser("~/.cache/halo2_tpu")), "params")


def _param_hasher(curve: Curve):
    """pasta_curves-compatible hash_to_curve("Halo2-Parameters") for the
    Pasta curves (ipa/commitment.rs:170-204) — byte-identical generators;
    verified against the reference's golden pinned-vk (tests/test_pinned_vk).
    Returns None for curves without a pinned hash-to-curve suite."""
    from ..curves.hash_to_curve import hash_to_curve
    if curve.name == "pasta::Vesta":
        from ..curves.iso_constants import VESTA_ISO
        return hash_to_curve(VESTA_ISO, "Halo2-Parameters")
    if curve.name == "pasta::Pallas":
        from ..curves.iso_constants import PALLAS_ISO
        return hash_to_curve(PALLAS_ISO, "Halo2-Parameters")
    return None


def _derive_points(curve: Curve, tag: bytes, labels) -> list:
    """Deterministic nothing-up-my-sleeve points for curves with no
    reference hash-to-curve suite (e.g. IPA-over-BN254): SHA-512(tag ||
    label || ctr) -> candidate x (wide-reduced), lift with even-y
    convention."""
    F = curve.Fq
    pts = []
    for label in labels:
        ctr = 0
        while True:
            h = hashlib.sha512(tag + label + struct.pack("<I", ctr)).digest()
            x = int.from_bytes(h, "little") % F.p
            rhs = (x * x * x + curve.b) % F.p
            y = curve._sqrt_int(rhs)
            if y is not None and y != 0:
                if y & 1:
                    y = F.p - y
                pts.append((x, y))
                break
            ctr += 1
    return pts


class ParamsIPA:
    """k, n, g (coeff-basis gens), g_lagrange, w (blind base), u."""

    def __init__(self, curve: Curve, k: int, g_aff=None, g_lagrange_aff=None,
                 w=None, u=None):
        self.curve = curve
        self.k = k
        self.n = 1 << k
        F = curve.Fr
        if g_aff is None:
            hasher = _param_hasher(curve)
            if hasher is not None:
                # reference-identical derivation (ipa/commitment.rs:156-214):
                # g[i] = H([0, i as u32 le]), w = H([1]), u = H([2])
                g_aff = [hasher(b"\x00" + i.to_bytes(4, "little"))
                         for i in range(self.n)]
                w = hasher(b"\x01")
                u = hasher(b"\x02")
            else:
                tag = b"halo2_tpu/ipa-params/v1:" + curve.name.encode()
                labels = [struct.pack("<cI", b"g", i) for i in range(self.n)]
                g_aff = _derive_points(curve, tag, labels)
                w, u = _derive_points(curve, tag, [b"w", b"u"])
        self.g_aff = g_aff
        self.w_aff = w
        self.u_aff = u
        self.g = curve.from_affine_ints(g_aff)
        if g_lagrange_aff is None:
            gl = g_to_lagrange(curve, self.g, k)
            g_lagrange_aff = curve.to_affine_ints(gl)
        self.g_lagrange_aff = g_lagrange_aff
        self.g_lagrange = curve.from_affine_ints(g_lagrange_aff)
        self.w = curve.from_affine_ints([w])[0]
        self.u = curve.from_affine_ints([u])[0]
        self._cached_msm = {}
        self.engine = None   # PlonkEngine (ZAL seam); see set_engine

    def set_engine(self, engine):
        """Install a PlonkEngine (engine.py): full-length commitments route
        through its descriptor cache — on a mesh that is ShardedCachedMSM
        (dist/msm.py), i.e. points+buckets sharded with collective
        reduction.  Mirrors zal.rs:78-102 descriptor caching."""
        self.engine = engine

    # -- cached construction -------------------------------------------

    @staticmethod
    def new(curve: Curve, k: int) -> "ParamsIPA":
        os.makedirs(_PARAMS_CACHE, exist_ok=True)
        path = os.path.join(
            _PARAMS_CACHE, f"ipa-v2-{curve.name.replace(':', '_')}-{k}.bin")
        if os.path.exists(path):
            with open(path, "rb") as f:
                return ParamsIPA.read(curve, f.read())
        p = ParamsIPA(curve, k)
        with open(path, "wb") as f:
            f.write(p.write())
        return p

    # -- serde (poly/ipa/commitment.rs:107-144 layout) ------------------

    def write(self) -> bytes:
        out = bytearray(struct.pack("<I", self.k))
        for pt in self.g_aff:
            out += self.curve.point_to_bytes(pt)
        for pt in self.g_lagrange_aff:
            out += self.curve.point_to_bytes(pt)
        out += self.curve.point_to_bytes(self.w_aff)
        out += self.curve.point_to_bytes(self.u_aff)
        return bytes(out)

    @staticmethod
    def read(curve: Curve, data: bytes) -> "ParamsIPA":
        k = struct.unpack("<I", data[:4])[0]
        n = 1 << k
        off = 4
        pts = []
        for _ in range(2 * n + 2):
            pts.append(curve.point_from_bytes(data[off: off + 32]))
            off += 32
        return ParamsIPA(curve, k, g_aff=pts[:n], g_lagrange_aff=pts[n:2 * n],
                         w=pts[2 * n], u=pts[2 * n + 1])

    # -- commitments ----------------------------------------------------

    def commit(self, poly, blind: Blind):
        """<poly, g> + blind*w (coeff basis); returns Jacobian point array ()."""
        from ..poly.poly import COEFF, unwrap
        return self._commit_with(self.g, unwrap(poly, COEFF,
                                                "ParamsIPA.commit"), blind)

    def commit_lagrange(self, values, blind: Blind):
        from ..poly.poly import LAGRANGE, unwrap
        return self._commit_with(
            self.g_lagrange,
            unwrap(values, LAGRANGE, "ParamsIPA.commit_lagrange"), blind)

    def _commit_with(self, bases, poly, blind: Blind):
        F = self.curve.Fr
        n = poly.shape[0]
        if (self.engine is not None and n == self.n):
            # ZAL path: cached (possibly sharded) descriptor for the n
            # bases; the blind*w term is a single scalar-mul added on top
            # (n+1 would break row sharding).
            desc = self.engine.msm_backend.get_base_descriptor(
                self.curve, bases)
            acc = self.engine.msm_backend.msm_with_cached_base(
                self.curve, poly, desc)
            wterm = msm(self.curve, F.encode_ints([blind.value]),
                        self.w[None])
            return self.curve.add(acc, wterm)
        scalars = jnp.concatenate(
            [poly, F.encode_ints([blind.value])], axis=0)
        if n == self.n:
            # cached fixed-base engine (g/g_lagrange + w appended)
            key = id(bases)
            if key not in self._cached_msm:
                from ..msm.msm import default_cached_msm
                pts = jnp.concatenate([bases, self.w[None]], axis=0)
                self._cached_msm[key] = default_cached_msm(self.curve, pts)
            return self._cached_msm[key](scalars)
        pts = jnp.concatenate([bases[:n], self.w[None]], axis=0)
        return msm(self.curve, scalars, pts)

    def commit_affine(self, poly, blind: Blind):
        """commit + normalize to host affine ints (for the transcript)."""
        return self.curve.to_affine_ints(self.commit(poly, blind)[None])[0]

    def commit_affine_lagrange(self, values, blind: Blind):
        return self.curve.to_affine_ints(
            self.commit_lagrange(values, blind)[None])[0]

    def empty_msm(self) -> "MSMIPA":
        return MSMIPA(self)


class MSMIPA:
    """Deferred MSM accumulator (poly/ipa/msm.rs): dense g-scalars plus
    arbitrary (scalar, point) terms plus w/u scalars, host-side until check."""

    def __init__(self, params: ParamsIPA):
        self.params = params
        self.terms = []          # list[(int scalar, (x, y) affine ints)]
        self.g_scalars = None    # list[int] of len n, or None
        self.w_scalar = None
        self.u_scalar = None

    def clone(self) -> "MSMIPA":
        m = MSMIPA(self.params)
        m.terms = list(self.terms)
        m.g_scalars = list(self.g_scalars) if self.g_scalars else None
        m.w_scalar = self.w_scalar
        m.u_scalar = self.u_scalar
        return m

    def append_term(self, scalar: int, point):
        if point is not None:
            self.terms.append((scalar % self.params.curve.Fr.p, point))

    def add_constant_term(self, c: int):
        """Adds [c] g[0] (ipa/msm.rs add_constant_term)."""
        if self.g_scalars is None:
            self.g_scalars = [0] * self.params.n
        self.g_scalars[0] = (self.g_scalars[0] + c) % self.params.curve.Fr.p

    def add_to_g_scalars(self, scalars):
        p = self.params.curve.Fr.p
        if self.g_scalars is None:
            self.g_scalars = [0] * self.params.n
        for i, s in enumerate(scalars):
            self.g_scalars[i] = (self.g_scalars[i] + s) % p

    def add_to_w_scalar(self, s: int):
        self.w_scalar = ((self.w_scalar or 0) + s) % self.params.curve.Fr.p

    def add_to_u_scalar(self, s: int):
        self.u_scalar = ((self.u_scalar or 0) + s) % self.params.curve.Fr.p

    def scale(self, factor: int):
        p = self.params.curve.Fr.p
        self.terms = [((s * factor) % p, pt) for s, pt in self.terms]
        if self.g_scalars:
            self.g_scalars = [(s * factor) % p for s in self.g_scalars]
        if self.w_scalar is not None:
            self.w_scalar = (self.w_scalar * factor) % p
        if self.u_scalar is not None:
            self.u_scalar = (self.u_scalar * factor) % p

    def add_msm(self, other: "MSMIPA"):
        self.terms.extend(other.terms)
        if other.g_scalars:
            self.add_to_g_scalars(other.g_scalars)
        if other.w_scalar is not None:
            self.add_to_w_scalar(other.w_scalar)
        if other.u_scalar is not None:
            self.add_to_u_scalar(other.u_scalar)

    def _sparse_affine(self):
        """Host-evaluated sum of the arbitrary-point terms (+ w/u): tens of
        terms — a device dispatch would compile a fresh kernel per shape
        for microseconds of arithmetic (see msm/host_msm.py)."""
        scalars = [s for s, _ in self.terms]
        pts = [pt for _, pt in self.terms]
        if self.w_scalar is not None:
            scalars.append(self.w_scalar)
            pts.append(self.params.w_aff)
        if self.u_scalar is not None:
            scalars.append(self.u_scalar)
            pts.append(self.params.u_aff)
        from ..msm.host_msm import host_msm
        return host_msm(self.params.curve, scalars, pts)

    def eval(self):
        curve = self.params.curve
        F = curve.Fr
        sparse = self._sparse_affine()
        if self.g_scalars:
            # dense fixed-base part: full-length n MSM against params.g —
            # fixed shape, so the cached kernel is reused across proofs
            key = ("msmipa_g", id(self.params.g))
            cache = self.params._cached_msm
            if key not in cache:
                from ..msm.msm import default_cached_msm
                cache[key] = default_cached_msm(curve, self.params.g)
            out = cache[key](F.encode_ints(self.g_scalars))
            if sparse is not None:
                out = curve.add(out, curve.from_affine_ints([sparse])[0])
            return out
        return curve.from_affine_ints([sparse])[0]

    def check(self) -> bool:
        if not self.g_scalars:
            return self._sparse_affine() is None
        return bool(self.params.curve.is_identity(self.eval()))


# ----------------------------------------------------------------------
# opening argument (poly/ipa/commitment/{prover,verifier}.rs)
# ----------------------------------------------------------------------

def create_opening_proof(params: ParamsIPA, rng, transcript, p_poly,
                         p_blind: Blind, x3: int):
    """k-round IPA opening of `p_poly` (device coeffs) at x3."""
    curve = params.curve
    F = curve.Fr
    n, k = params.n, params.k
    p = F.p

    # random s-poly with a root at x3
    s_ints = [rng.randrange(p) for _ in range(n)]
    s_poly = F.encode_ints(s_ints)
    s_at_x3 = eval_polynomial_int(p, s_ints, x3)
    s_ints[0] = (s_ints[0] - s_at_x3) % p
    s_poly = F.encode_ints(s_ints)
    s_blind = Blind.random(F, rng)
    transcript.write_point(params.commit_affine(s_poly, s_blind))

    xi = transcript.squeeze_challenge()
    z = transcript.squeeze_challenge()

    # P' = xi*S + P ; subtract value at x3 from constant term
    p_prime = F.add(F.mul(s_poly, F.encode_int(xi)), p_poly)
    v = F.decode_int(eval_polynomial(F, p_prime, F.encode_int(x3)))
    p_prime = p_prime.at[0].set(
        F.sub(p_prime[0], F.encode_int(v)))
    f = (s_blind.value * xi + p_blind.value) % p

    b = powers(F, F.encode_int(x3), n)
    g_prime = params.g

    for j in range(k):
        half = 1 << (k - j - 1)
        l_j = msm(curve, p_prime[half:], g_prime[:half])
        r_j = msm(curve, p_prime[:half], g_prime[half:])
        value_l = F.decode_int(compute_inner_product(F, p_prime[half:], b[:half]))
        value_r = F.decode_int(compute_inner_product(F, p_prime[:half], b[half:]))
        rand_l = rng.randrange(p)
        rand_r = rng.randrange(p)
        extra = curve.from_affine_ints([params.u_aff, params.w_aff])
        l_j = curve.add(l_j, msm(curve, F.encode_ints(
            [(value_l * z) % p, rand_l]), extra))
        r_j = curve.add(r_j, msm(curve, F.encode_ints(
            [(value_r * z) % p, rand_r]), extra))
        l_aff, r_aff = curve.to_affine_ints(jnp.stack([l_j, r_j]))
        transcript.write_point(l_aff)
        transcript.write_point(r_aff)

        u_j = transcript.squeeze_challenge()
        u_j_inv = pow(u_j, p - 2, p)

        p_prime = F.add(p_prime[:half],
                        F.mul(p_prime[half:], F.encode_int(u_j_inv)))
        b = F.add(b[:half], F.mul(b[half:], F.encode_int(u_j)))
        g_prime = curve.add(
            g_prime[:half],
            curve.scalar_mul(g_prime[half:], jnp.broadcast_to(
                F.encode_int(u_j), (half, NLIMBS))))

        f = (f + rand_l * u_j_inv + rand_r * u_j) % p

    c = F.decode_int(p_prime[0])
    transcript.write_scalar(c)
    transcript.write_scalar(f)


class GuardIPA:
    """Deferred verification state (poly/ipa/strategy.rs:19-71)."""

    def __init__(self, msm_acc: MSMIPA, neg_c: int, u: list):
        self.msm = msm_acc
        self.neg_c = neg_c
        self.u = u

    def use_challenges(self) -> MSMIPA:
        s = compute_s(self.msm.params.curve.Fr.p, self.u, self.neg_c)
        self.msm.add_to_g_scalars(s)
        return self.msm

    def use_g(self, g):
        """Caller supplies the purported G = <s, params.g>; returns the
        updated MSM plus an Accumulator carrying the evaluation claim for a
        recursive verifier (strategy.rs:54-66)."""
        self.msm.append_term(self.neg_c, g)
        return self.msm, Accumulator(g=g, u_packed=list(self.u))

    def compute_g(self):
        """G = <s, params.g> (strategy.rs:68-71)."""
        from ..msm.msm import msm as run_msm
        params = self.msm.params
        F = params.curve.Fr
        s = compute_s(F.p, self.u, 1)
        g = run_msm(params.curve, F.encode_ints(s), params.g)
        return params.curve.to_affine_ints(g[None])[0]

    def use_g_with_computed(self):
        """Convenience: compute G here and accumulate (tests)."""
        return self.use_g(self.compute_g())


@dataclass
class Accumulator:
    """Evaluation claim + packed challenges for the recursion path
    (strategy.rs:27-36)."""
    g: object
    u_packed: list


def verify_opening_proof(params: ParamsIPA, msm_acc: MSMIPA, transcript,
                         x: int, v: int) -> GuardIPA:
    """Mirror of ipa/commitment/verifier.rs:13-89."""
    p = params.curve.Fr.p
    k = params.k
    msm_acc.add_constant_term((-v) % p)
    s_comm = transcript.read_point()
    xi = transcript.squeeze_challenge()
    msm_acc.append_term(xi, s_comm)
    z = transcript.squeeze_challenge()

    rounds = []
    for _ in range(k):
        l = transcript.read_point()
        r = transcript.read_point()
        u_j = transcript.squeeze_challenge()
        rounds.append((l, r, u_j))

    u = []
    for (l, r, u_j) in rounds:
        u_inv = pow(u_j, p - 2, p)
        msm_acc.append_term(u_inv, l)
        msm_acc.append_term(u_j, r)
        u.append(u_j)

    c = transcript.read_scalar()
    neg_c = (-c) % p
    f = transcript.read_scalar()
    b = compute_b(p, x, u)

    msm_acc.add_to_u_scalar((neg_c * b * z) % p)
    msm_acc.add_to_w_scalar((-f) % p)
    return GuardIPA(msm_acc, neg_c, u)


def compute_b(p: int, x: int, u: list) -> int:
    """prod_i (1 + u_{k-1-i} x^{2^i})  (verifier.rs:92-100)."""
    tmp, cur = 1, x
    for u_j in reversed(u):
        tmp = (tmp * (1 + u_j * cur)) % p
        cur = (cur * cur) % p
    return tmp


def compute_s(p: int, u: list, init: int) -> list:
    """coefficients of g(X) = prod_i (1 + u_{k-1-i} X^{2^i}), scaled by init
    (strategy.rs:157-172)."""
    v = [0] * (1 << len(u))
    v[0] = init % p
    length = 1
    for u_j in reversed(u):
        for i in range(length):
            v[length + i] = (v[i] * u_j) % p
        length *= 2
    return v


# ----------------------------------------------------------------------
# verification strategies (poly/ipa/strategy.rs:75-154)
# ----------------------------------------------------------------------

class SingleStrategyIPA:
    def __init__(self, params: ParamsIPA):
        self.params = params

    def process(self, f) -> bool:
        guard = f(self.params.empty_msm())
        return guard.use_challenges().check()


class AccumulatorStrategyIPA:
    def __init__(self, params: ParamsIPA, rng=None):
        self.params = params
        self.msm = params.empty_msm()
        import random as _random
        self.rng = rng or _random.SystemRandom()

    def process(self, f):
        self.msm.scale(self.rng.randrange(1, self.params.curve.Fr.p))
        guard = f(self.msm)
        self.msm = guard.use_challenges()
        return self

    def finalize(self) -> bool:
        return self.msm.check()
