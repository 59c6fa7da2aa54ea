"""KZG commitment scheme on BN254 (halo2_backend/src/poly/kzg/*).

ParamsKZG holds [s^i]G1 bases (device) and the Lagrange-basis form computed
directly from the factored evaluation (kzg/commitment.rs:64-131); MSMKZG /
DualMSM are host-side deferred accumulators evaluated with the device MSM,
with the final two-pairing check on the host (compat/bn254_pairing.py).

For locally-generated (test) params the toxic scalar s is retained and the
DualMSM check uses the equivalent s*left == right G1 identity — marked
insecure, exactly as the reference marks `setup` "MUST NOT be used in
production".  Imported SRS params use the real pairing.
"""

from __future__ import annotations

import os
import struct
from typing import List, Optional

import jax.numpy as jnp

from ..curves import BN254_G1
from ..curves.curve import Curve
from ..fields.field import NLIMBS
from ..msm import msm
from ..msm.msm import CachedMSM
from ..compat import bn254_pairing as bn
from ..poly.poly import COEFF, LAGRANGE, unwrap as unwrap_basis
from .base import Blind

_PARAMS_CACHE = os.path.join(
    os.environ.get("HALO2_TPU_CACHE",
                   os.path.expanduser("~/.cache/halo2_tpu")), "params")


class ParamsKZG:
    def __init__(self, k: int, g_aff: List, g_lagrange_aff: List,
                 g2, s_g2, s_secret: Optional[int] = None):
        self.curve = BN254_G1
        self.k = k
        self.n = 1 << k
        self._g_aff = g_aff
        self._g_lagrange_aff = g_lagrange_aff
        self.g = self.curve.from_affine_ints(g_aff)
        self.g_lagrange = self.curve.from_affine_ints(g_lagrange_aff)
        self.g2 = g2            # ((x0,x1),(y0,y1)) ints
        self.s_g2 = s_g2
        self.s_secret = s_secret
        self._cached_msm = {}

    # -- affine int lists (lazy when loaded from the npz fast path) ------

    @property
    def g_aff(self) -> List:
        if self._g_aff is None:
            self._g_aff = self.curve.to_affine_ints(self.g)
        return self._g_aff

    @property
    def g_lagrange_aff(self) -> List:
        if self._g_lagrange_aff is None:
            self._g_lagrange_aff = self.curve.to_affine_ints(self.g_lagrange)
        return self._g_lagrange_aff

    @classmethod
    def _from_limb_arrays(cls, k: int, xy, g2, s_g2,
                          s_secret: Optional[int] = None) -> "ParamsKZG":
        """xy: (2n, 2, NLIMBS) uint16/uint32 CANONICAL limbs for the x/y of
        [g | g_lagrange] — the npz fast-load path (no per-point python)."""
        import numpy as np
        obj = object.__new__(cls)
        obj.curve = BN254_G1
        obj.k = k
        obj.n = n = 1 << k
        F = obj.curve.Fq
        arr = jnp.asarray(np.asarray(xy, dtype=np.uint32))
        xm = F.to_mont(arr[:, 0])
        ym = F.to_mont(arr[:, 1])
        zm = jnp.broadcast_to(F.ones(()), xm.shape)
        pts = jnp.stack([xm, ym, zm], axis=-2)            # (2n, 3, L)
        obj.g = pts[:n]
        obj.g_lagrange = pts[n:]
        obj._g_aff = None
        obj._g_lagrange_aff = None
        obj.g2 = g2
        obj.s_g2 = s_g2
        obj.s_secret = s_secret
        obj._cached_msm = {}
        return obj

    # npz layout stamp: bump on any change to the limb layout or encoding.
    # A stale cached npz with a different layout would otherwise silently
    # load wrong SRS points (proofs would fail verification with no hint).
    _NPZ_FORMAT = {"rev": 1, "nlimbs": NLIMBS, "limb_bits": 16,
                   "endian": "little", "form": "canonical"}

    def _save_npz(self, path: str):
        import json
        import numpy as np
        pts = self.g_aff + self.g_lagrange_aff
        buf = b"".join(x.to_bytes(32, "little") + y.to_bytes(32, "little")
                       for (x, y) in pts)
        xy = np.frombuffer(buf, dtype="<u2").reshape(2 * self.n, 2, NLIMBS)
        meta = json.dumps({"k": self.k, "g2": self.g2, "s_g2": self.s_g2,
                           "format": self._NPZ_FORMAT})
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            np.savez(f, xy=xy, meta=np.frombuffer(meta.encode(), np.uint8))
        os.replace(tmp, path)

    @staticmethod
    def _load_npz(path: str, s_secret=None) -> "ParamsKZG":
        """Returns the params, or None on a format-stamp mismatch (caller
        falls back to the .bin path and re-saves)."""
        import json
        import numpy as np
        with np.load(path) as z:
            meta = json.loads(bytes(z["meta"]).decode())
            if meta.get("format") != ParamsKZG._NPZ_FORMAT:
                return None
            xy = z["xy"]
            g2 = tuple(tuple(v) for v in meta["g2"])
            s_g2 = tuple(tuple(v) for v in meta["s_g2"])
            return ParamsKZG._from_limb_arrays(
                meta["k"], xy, g2, s_g2, s_secret=s_secret)

    def downsize(self, k: int) -> "ParamsKZG":
        """Truncate to a smaller domain (kzg/commitment.rs:291-299): keep
        the first 2^k monomial-basis points and recompute the Lagrange form
        by group iFFT.  Returns a NEW params object (arrays are immutable
        here, unlike the reference's in-place mutation)."""
        assert k <= self.k
        from ..curves.point_ntt import g_to_lagrange
        n = 1 << k
        g_aff = self.g_aff[:n]
        gl = g_to_lagrange(self.curve, self.curve.from_affine_ints(g_aff), k)
        return ParamsKZG(k, g_aff, self.curve.to_affine_ints(gl),
                         self.g2, self.s_g2, s_secret=self.s_secret)

    # ------------------------------------------------------------------

    @staticmethod
    def setup(k: int, s: Optional[int] = None, rng=None) -> "ParamsKZG":
        """Insecure trusted setup (kzg/commitment.rs:64-131)."""
        curve = BN254_G1
        F = curve.Fr
        p = F.p
        n = 1 << k
        if s is None:
            import random as _r
            s = (rng or _r.SystemRandom()).randrange(1, p)

        # scalars host-side, points via one batched device scalar-mul
        powers_s = [1] * n
        for i in range(1, n):
            powers_s[i] = powers_s[i - 1] * s % p
        base = curve.from_affine_ints([(curve.gen_x, curve.gen_y)] * n)
        g_proj = curve.scalar_mul(base, F.encode_ints(powers_s))
        g_aff = curve.to_affine_ints(g_proj)

        # lagrange form: L_i(s) = (s^n - 1)/n * omega^i / (s - omega^i)
        root = pow(F.root_of_unity, 1 << (F.S - k), p)
        n_inv = pow(n, p - 2, p)
        multiplier = (pow(s, n, p) - 1) * n_inv % p
        root_pows = [1] * n
        for i in range(1, n):
            root_pows[i] = root_pows[i - 1] * root % p
        # batch inversion of (s - omega^i)
        denoms = [(s - rp) % p for rp in root_pows]
        prefix = [1] * (n + 1)
        for i, d in enumerate(denoms):
            prefix[i + 1] = prefix[i] * d % p
        total_inv = pow(prefix[n], p - 2, p)
        inv = [0] * n
        acc = total_inv
        for i in range(n - 1, -1, -1):
            inv[i] = acc * prefix[i] % p
            acc = acc * denoms[i] % p
        lag_scalars = [multiplier * root_pows[i] % p * inv[i] % p
                       for i in range(n)]
        gl_proj = curve.scalar_mul(base, F.encode_ints(lag_scalars))
        g_lagrange_aff = curve.to_affine_ints(gl_proj)

        g2 = bn.g2_to_ints(bn.g2_generator())
        s_g2 = bn.g2_to_ints(bn.g2_scalar_mul(bn.g2_generator(), s))
        return ParamsKZG(k, g_aff, g_lagrange_aff, g2, s_g2, s_secret=s)

    @staticmethod
    def new(k: int, s: Optional[int] = 3141592653589793) -> "ParamsKZG":
        """Cached deterministic test params (toxic s retained, insecure).
        Fast path: an .npz of raw limb arrays loads in ~1s at k=18, vs
        minutes for the reference-layout .bin (524288 per-point python
        parses)."""
        os.makedirs(_PARAMS_CACHE, exist_ok=True)
        path = os.path.join(_PARAMS_CACHE, f"kzg-v2-bn254-{k}-{s or 0}.bin")
        npz = path + ".npz"
        if os.path.exists(npz):
            params = ParamsKZG._load_npz(npz, s_secret=s)
            if params is not None:
                return params
            # stale layout stamp: fall through to the .bin path + re-save
        if os.path.exists(path):
            with open(path, "rb") as f:
                params = ParamsKZG.read(f.read(), s_secret=s)
        else:
            params = ParamsKZG.setup(k, s=s)
            with open(path, "wb") as f:
                f.write(params.write())
        params._save_npz(npz)
        return params

    # -- serde (kzg/commitment.rs:167-267 layout; write() defaults to
    # RawBytes like the reference's ParamsProver::write at :320-322) -----

    def write(self, fmt=None) -> bytes:
        from ..compat.serde import SerdeFormat, _write_point, _write_g2
        fmt = fmt or SerdeFormat.RAW_BYTES
        out = bytearray(struct.pack("<I", self.k))
        for pt in self.g_aff:
            out += _write_point(self.curve, pt, fmt)
        for pt in self.g_lagrange_aff:
            out += _write_point(self.curve, pt, fmt)
        out += _write_g2(self.g2, fmt)
        out += _write_g2(self.s_g2, fmt)
        return bytes(out)

    @staticmethod
    def read(data: bytes, fmt=None, s_secret=None) -> "ParamsKZG":
        from ..compat.serde import SerdeFormat, _read_point, _read_g2
        fmt = fmt or SerdeFormat.RAW_BYTES
        k = struct.unpack("<I", data[:4])[0]
        n = 1 << k
        off = 4
        pts = []
        for _ in range(2 * n):
            pt, off = _read_point(BN254_G1, data, off, fmt)
            pts.append(pt)
        g2, off = _read_g2(data, off, fmt)
        s_g2, off = _read_g2(data, off, fmt)
        return ParamsKZG(k, pts[:n], pts[n:], g2, s_g2,
                         s_secret=s_secret)

    # -- commitments (blind is ignored: KZG relies on the random poly) ---

    def set_engine(self, engine):
        """ZAL seam (see ParamsIPA.set_engine)."""
        self.engine = engine

    def _cached(self, name, bases):
        eng = getattr(self, "engine", None)
        if eng is not None:
            return eng.msm_backend.get_base_descriptor(self.curve, bases)
        if name not in self._cached_msm:
            from ..msm.msm import default_cached_msm
            self._cached_msm[name] = default_cached_msm(self.curve, bases)
        return self._cached_msm[name]

    def commit(self, poly, blind: Blind = None):
        poly = unwrap_basis(poly, COEFF, "ParamsKZG.commit")
        n = poly.shape[0]
        if n == self.n:
            return self._cached("g", self.g)(poly)
        return msm(self.curve, poly, self.g[:n])

    def commit_lagrange(self, values, blind: Blind = None):
        values = unwrap_basis(values, LAGRANGE, "ParamsKZG.commit_lagrange")
        n = values.shape[0]
        if n == self.n:
            return self._cached("gl", self.g_lagrange)(values)
        return msm(self.curve, values, self.g_lagrange[:n])

    def commit_affine(self, poly, blind: Blind = None):
        return self.curve.to_affine_ints(self.commit(poly)[None])[0]

    def commit_affine_lagrange(self, values, blind: Blind = None):
        return self.curve.to_affine_ints(self.commit_lagrange(values)[None])[0]

    def empty_msm(self) -> "MSMKZG":
        return MSMKZG(self)


class MSMKZG:
    """kzg/msm.rs:14-92 host-side accumulator."""

    def __init__(self, params: ParamsKZG):
        self.params = params
        self.scalars: List[int] = []
        self.bases: List = []

    def clone(self) -> "MSMKZG":
        m = MSMKZG(self.params)
        m.scalars = list(self.scalars)
        m.bases = list(self.bases)
        return m

    def append_term(self, scalar: int, point):
        self.scalars.append(scalar % self.params.curve.Fr.p)
        self.bases.append(point)

    def add_msm(self, other: "MSMKZG"):
        self.scalars.extend(other.scalars)
        self.bases.extend(other.bases)

    def scale(self, factor: int):
        p = self.params.curve.Fr.p
        self.scalars = [s * factor % p for s in self.scalars]

    def combine_with_base(self, base: int):
        """Horner folding of scalars (kzg/msm.rs:37-46)."""
        p = self.params.curve.Fr.p
        acc = 1
        for i in range(len(self.scalars) - 1, -1, -1):
            self.scalars[i] = self.scalars[i] * acc % p
            acc = acc * base % p

    def eval_affine(self):
        curve = self.params.curve
        pts = [b for s, b in zip(self.scalars, self.bases) if b is not None]
        scs = [s for s, b in zip(self.scalars, self.bases) if b is not None]
        if not pts:
            return None
        if len(pts) <= 4096:
            # verifier MSMs are tens of terms: evaluate on the host
            # ("verification is cheap", kzg/strategy.rs:140-143) — a device
            # dispatch would pay a fresh kernel compile per shape for
            # microseconds of arithmetic
            from ..msm.host_msm import host_msm
            return host_msm(curve, scs, pts)
        # pad to the next power of two: MSMs vary in length by a few terms
        # per circuit shape, and each distinct length would otherwise
        # trigger a fresh kernel compile; zero scalars/identity points are
        # exact under the complete formulas
        target = 1 << (len(pts) - 1).bit_length()
        scs = scs + [0] * (target - len(scs))
        pts = pts + [None] * (target - len(pts))
        out = msm(curve, curve.Fr.encode_ints(scs),
                  curve.from_affine_ints(pts))
        return curve.to_affine_ints(out[None])[0]


class PreMSM:
    """Projective collector (kzg/msm.rs:96-137): accumulates (scalar,
    projective DEVICE point) terms and defers the projective->affine
    conversion, so all collected points share ONE batched normalization
    (a single batched field inversion) and one host fetch, instead of a
    to_affine_ints round-trip per commitment.  The prover's phase/h-piece
    commitment batches go through `normalize` (plonk/prover.py); `to_msm`
    mirrors the reference's PreMSM->MSMKZG conversion for accumulation."""

    def __init__(self, params_or_curve):
        self.params = params_or_curve
        self.curve = getattr(params_or_curve, "curve", params_or_curve)
        self.scalars: List[int] = []
        self.points = []            # projective (3, NLIMBS) device arrays

    def append_term(self, scalar: int, point_proj):
        self.scalars.append(scalar % self.curve.Fr.p)
        self.points.append(point_proj)

    def add_msm(self, other: "PreMSM"):
        self.scalars.extend(other.scalars)
        self.points.extend(other.points)

    def normalize(self) -> List:
        """All collected projective points -> affine int pairs with ONE
        batched inversion + host fetch (kzg/msm.rs:120-136 normalize)."""
        if not self.points:
            return []
        return self.curve.to_affine_ints(jnp.stack(self.points, axis=0))

    def to_msm(self) -> "MSMKZG":
        m = MSMKZG(self.params)
        if self.points:
            m.scalars = list(self.scalars)
            m.bases = list(self.normalize())
        return m


class DualMSM:
    """Two-channel accumulator; check is e(left, sG2) e(right, -G2) == 1
    (kzg/msm.rs:151-207)."""

    def __init__(self, params: ParamsKZG):
        self.params = params
        self.left = MSMKZG(params)
        self.right = MSMKZG(params)

    def scale(self, e: int):
        self.left.scale(e)
        self.right.scale(e)

    def add_msm(self, other: "DualMSM"):
        self.left.add_msm(other.left)
        self.right.add_msm(other.right)

    def check(self) -> bool:
        left = self.left.eval_affine()
        right = self.right.eval_affine()
        if self.params.s_secret is not None:
            # insecure fast path: s*left + (-1)*right must be the identity
            curve = self.params.curve
            if left is None and right is None:
                return True
            from ..msm.host_msm import host_msm
            out = host_msm(curve, [self.params.s_secret, curve.Fr.p - 1],
                           [left, right])
            return out is None
        return bn.pairing_check([
            (left, self.params.s_g2),
            (right, ((self.params.g2[0]),
                     tuple((-y) % bn.Q for y in self.params.g2[1]))),
        ])


class GuardKZG:
    """kzg/strategy.rs:24-41."""

    def __init__(self, msm: DualMSM):
        self.msm = msm


class SingleStrategyKZG:
    def __init__(self, params: ParamsKZG):
        self.params = params

    def process(self, f) -> bool:
        guard = f(DualMSM(self.params))
        return guard.msm.check()


class AccumulatorStrategyKZG:
    def __init__(self, params: ParamsKZG, rng=None):
        self.params = params
        self.msm = DualMSM(params)
        import random as _r
        self.rng = rng or _r.SystemRandom()

    def process(self, f):
        self.msm.scale(self.rng.randrange(1, self.params.curve.Fr.p))
        guard = f(self.msm)
        self.msm = guard.msm
        return self

    def finalize(self) -> bool:
        return self.msm.check()
