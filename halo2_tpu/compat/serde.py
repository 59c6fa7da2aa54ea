"""Key serialization, byte-compatible with the reference layouts.

  vk   (plonk.rs:58-155):   [VERSION=0x04][k: u8][num_fixed: u32 LE]
                            [fixed commitments][permutation commitments]
  pk   (plonk.rs:297-376):  vk ‖ l0 ‖ l_last ‖ l_active_row
                            ‖ fixed_values ‖ fixed_polys ‖ fixed_cosets
                            ‖ permutation pk (permutations ‖ polys ‖ cosets)
  poly (poly.rs:170-198):   [len: u32 BE][elements]
  poly slice (helpers.rs:106-136): [count: u32 BE][polys]

Element encodings per SerdeFormat (helpers.rs:9-103):
  PROCESSED            compressed points (C::to_bytes) / canonical LE field
  RAW_BYTES            uncompressed Montgomery-form x‖y with range+curve
                       checks / Montgomery-form field with range check
  RAW_BYTES_UNCHECKED  same bytes, no checks

Our internal Montgomery radix is 2^256 (fields/field.py NBITS), the same as
halo2curves' 4x64-bit representation, so RAW_BYTES is byte-identical too.

Like the reference's legacy `vk_read`/`pk_read`
(halo2_proofs/src/plonk.rs:45-86), reading requires re-compiling the circuit
to recover the constraint system; the stored numerical data is trusted (the
reference performs no cross-validation either).
"""

from __future__ import annotations

import struct
from enum import Enum
from typing import List

from ..fields.field import NLIMBS

VERSION = 0x04   # plonk.rs:57


class SerdeFormat(Enum):
    """helpers.rs:9-21."""
    PROCESSED = 0
    RAW_BYTES = 1
    RAW_BYTES_UNCHECKED = 2


# ----------------------------------------------------------------------
# element codecs
# ----------------------------------------------------------------------

def _write_point(curve, pt, fmt: SerdeFormat) -> bytes:
    if fmt == SerdeFormat.PROCESSED:
        return curve.point_to_bytes(pt)
    # raw: uncompressed Montgomery x || y (identity = all zeros)
    Fq = curve.Fq
    if pt is None:
        return b"\x00" * 64
    x, y = pt
    return (Fq.to_mont_int(x).to_bytes(32, "little")
            + Fq.to_mont_int(y).to_bytes(32, "little"))


def _read_point(curve, data: bytes, off: int, fmt: SerdeFormat):
    if fmt == SerdeFormat.PROCESSED:
        return curve.point_from_bytes(data[off:off + 32]), off + 32
    Fq = curve.Fq
    xm = int.from_bytes(data[off:off + 32], "little")
    ym = int.from_bytes(data[off + 32:off + 64], "little")
    off += 64
    if xm == 0 and ym == 0:
        return None, off
    x, y = Fq.from_mont_int(xm), Fq.from_mont_int(ym)
    if fmt == SerdeFormat.RAW_BYTES:
        if xm >= Fq.p or ym >= Fq.p:
            raise ValueError("coordinate out of range")
        if (y * y - x * x * x - curve.b) % Fq.p != 0:
            raise ValueError("point not on curve")
    return (x, y), off


def _write_felt(F, v: int, fmt: SerdeFormat) -> bytes:
    if fmt == SerdeFormat.PROCESSED:
        return F.to_repr(v)
    return F.to_mont_int(v).to_bytes(32, "little")


def _read_felt(F, data: bytes, off: int, fmt: SerdeFormat):
    raw = int.from_bytes(data[off:off + 32], "little")
    off += 32
    if fmt == SerdeFormat.PROCESSED:
        if raw >= F.p:
            raise ValueError("field element out of range")
        return raw, off
    if fmt == SerdeFormat.RAW_BYTES and raw >= F.p:
        raise ValueError("field element out of range")
    return F.from_mont_int(raw), off


# ----------------------------------------------------------------------
# BN254 G2 codec (halo2curves new_curve_impl encoding over Fq2)
# ----------------------------------------------------------------------

_BN_Q = 0x30644E72E131A029B85045B68181585D97816A916871CA8D3C208C16D87CFD47
# G2: y^2 = x^3 + b2 with b2 = 3 / (9 + u)
_B2 = (19485874751759354771024239261021720505790618469301721065564631296452457478373,
       266929791119991161246907387137283842545076965332900288569378510910307636690)


def _fq2_mul(a, b):
    q = _BN_Q
    return ((a[0] * b[0] - a[1] * b[1]) % q, (a[0] * b[1] + a[1] * b[0]) % q)


def _fq2_add(a, b):
    q = _BN_Q
    return ((a[0] + b[0]) % q, (a[1] + b[1]) % q)


def _fq2_sqrt(a):
    """sqrt in Fq2 = Fq[u]/(u^2+1), q = 3 mod 4 (norm-based method)."""
    q = _BN_Q
    c0, c1 = a
    if c1 == 0:
        r = _fq_sqrt(c0)
        if r is not None:
            return (r, 0)
        r = _fq_sqrt((-c0) % q)
        return None if r is None else (0, r)
    norm = (c0 * c0 + c1 * c1) % q
    n = _fq_sqrt(norm)
    if n is None:
        return None
    inv2 = pow(2, q - 2, q)
    x0sq = (c0 + n) * inv2 % q
    x0 = _fq_sqrt(x0sq)
    if x0 is None:
        x0sq = (c0 - n) * inv2 % q
        x0 = _fq_sqrt(x0sq)
        if x0 is None:
            return None
    x1 = c1 * pow(2 * x0, q - 2, q) % q
    return (x0, x1)


def _fq_sqrt(a):
    q = _BN_Q
    a %= q
    if a == 0:
        return 0
    r = pow(a, (q + 1) // 4, q)  # q = 3 mod 4
    return r if r * r % q == a else None


def _g2_on_curve(pt):
    x, y = pt
    lhs = _fq2_mul(y, y)
    rhs = _fq2_add(_fq2_mul(_fq2_mul(x, x), x), _B2)
    return lhs == rhs


def g2_to_bytes(pt) -> bytes:
    """Compressed G2 (64 bytes): x.c0 LE ‖ x.c1 LE with sign(y.c0 odd) in
    the top bit of the last byte; identity all-zeros (halo2curves macro)."""
    if pt is None:
        return b"\x00" * 64
    (x0, x1), (y0, _y1) = pt
    buf = bytearray(x0.to_bytes(32, "little") + x1.to_bytes(32, "little"))
    if y0 & 1:
        buf[63] |= 0x80
    return bytes(buf)


def g2_from_bytes(b: bytes):
    buf = bytearray(b)
    sign = (buf[63] & 0x80) >> 7
    buf[63] &= 0x7F
    x0 = int.from_bytes(buf[:32], "little")
    x1 = int.from_bytes(buf[32:], "little")
    if x0 == 0 and x1 == 0 and not sign:
        return None
    q = _BN_Q
    if x0 >= q or x1 >= q:
        raise ValueError("invalid G2 x coordinate")
    y = _fq2_sqrt(_fq2_add(_fq2_mul(_fq2_mul((x0, x1), (x0, x1)), (x0, x1)),
                           _B2))
    if y is None:
        raise ValueError("G2 point not on curve")
    y0, y1 = y
    if (y0 & 1) != sign:
        y0, y1 = (q - y0) % q, (q - y1) % q
    return ((x0, x1), (y0, y1))


def _write_g2(pt, fmt: SerdeFormat) -> bytes:
    if fmt == SerdeFormat.PROCESSED:
        return g2_to_bytes(pt)
    # raw Montgomery x.c0 ‖ x.c1 ‖ y.c0 ‖ y.c1 (identity all zeros)
    if pt is None:
        return b"\x00" * 128
    R = 1 << 256
    out = bytearray()
    for v in (*pt[0], *pt[1]):
        out += (v * R % _BN_Q).to_bytes(32, "little")
    return bytes(out)


def _read_g2(data: bytes, off: int, fmt: SerdeFormat):
    if fmt == SerdeFormat.PROCESSED:
        return g2_from_bytes(data[off:off + 64]), off + 64
    q = _BN_Q
    Rinv = pow(1 << 256, q - 2, q)
    vals = []
    for i in range(4):
        raw = int.from_bytes(data[off + 32 * i: off + 32 * (i + 1)],
                             "little")
        if fmt == SerdeFormat.RAW_BYTES and raw >= q:
            raise ValueError("G2 coordinate out of range")
        vals.append(raw * Rinv % q)
    off += 128
    if all(v == 0 for v in vals):
        return None, off
    pt = ((vals[0], vals[1]), (vals[2], vals[3]))
    if fmt == SerdeFormat.RAW_BYTES and not _g2_on_curve(pt):
        raise ValueError("G2 point not on curve")
    return pt, off


# ----------------------------------------------------------------------
# polynomial (vec) codecs — poly.rs:170-198, helpers.rs:106-136
# ----------------------------------------------------------------------

def _write_poly_ints(F, vals: List[int], fmt: SerdeFormat) -> bytes:
    out = bytearray(struct.pack(">I", len(vals)))
    for v in vals:
        out += _write_felt(F, v, fmt)
    return bytes(out)


def _read_poly_ints(F, data: bytes, off: int, fmt: SerdeFormat):
    (n,) = struct.unpack(">I", data[off:off + 4])
    off += 4
    vals = []
    for _ in range(n):
        v, off = _read_felt(F, data, off, fmt)
        vals.append(v)
    return vals, off


def _write_poly_slice(F, arr, fmt: SerdeFormat) -> bytes:
    """arr: device array (m, n, L) of field elements."""
    m = arr.shape[0]
    out = bytearray(struct.pack(">I", m))
    for i in range(m):
        out += _write_poly_ints(F, F.decode_ints(arr[i]), fmt)
    return bytes(out)


def _read_poly_slice(F, data: bytes, off: int, fmt: SerdeFormat):
    (m,) = struct.unpack(">I", data[off:off + 4])
    off += 4
    polys = []
    for _ in range(m):
        vals, off = _read_poly_ints(F, data, off, fmt)
        polys.append(vals)
    return polys, off


# ----------------------------------------------------------------------
# vk
# ----------------------------------------------------------------------

def vk_write(vk, fmt: SerdeFormat = SerdeFormat.PROCESSED) -> bytes:
    """plonk.rs:72-86 layout."""
    curve = vk.curve
    assert vk.k <= vk.F.S
    out = bytearray([VERSION, vk.k])
    out += struct.pack("<I", len(vk.fixed_commitments))
    for pt in vk.fixed_commitments:
        out += _write_point(curve, pt, fmt)
    for pt in vk.permutation.commitments:
        out += _write_point(curve, pt, fmt)
    return bytes(out)


def _vk_read_at(F, curve, cs_back, data: bytes, off: int, fmt: SerdeFormat):
    from ..plonk.keygen import PermutationVK, VerifyingKey
    from ..poly.domain import EvaluationDomain
    if data[off] != VERSION:
        raise ValueError(f"unexpected vk version byte {data[off]}")
    k = data[off + 1]
    if k > F.S:
        raise ValueError(f"circuit size value (k): {k} exceeds maximum")
    off += 2
    (n_fixed,) = struct.unpack("<I", data[off:off + 4])
    off += 4
    fixed = []
    for _ in range(n_fixed):
        pt, off = _read_point(curve, data, off, fmt)
        fixed.append(pt)
    perm = []
    for _ in range(len(cs_back.cs.permutation.columns)):
        pt, off = _read_point(curve, data, off, fmt)
        perm.append(pt)
    domain = EvaluationDomain(F, max(cs_back.degree(), 2), k)
    vk = VerifyingKey(F, curve, domain, cs_back, fixed,
                      PermutationVK(perm), k)
    return vk, off


def vk_read(F, params, k: int, circuit, data: bytes,
            fmt: SerdeFormat = SerdeFormat.PROCESSED,
            compress_selectors: bool = True):
    """Recompiles `circuit` to recover the constraint system (the legacy
    vk_read pattern, halo2_proofs/src/plonk.rs:45-60), then deserializes."""
    from ..frontend.circuit import compile_circuit
    from ..plonk.keygen import ConstraintSystemBack
    compiled, _cfg, _cs = compile_circuit(F, k, circuit, compress_selectors)
    cs_back = ConstraintSystemBack(compiled.cs, F.p)
    vk, off = _vk_read_at(F, params.curve, cs_back, data, 0, fmt)
    if vk.k != k:
        raise ValueError(f"vk k mismatch: file has {vk.k}, expected {k}")
    return vk


# ----------------------------------------------------------------------
# pk
# ----------------------------------------------------------------------

def pk_write(pk, fmt: SerdeFormat = SerdeFormat.PROCESSED) -> bytes:
    """plonk.rs:311-321 layout."""
    F = pk.vk.F
    out = bytearray(vk_write(pk.vk, fmt))
    out += _write_poly_ints(F, F.decode_ints(pk.l0), fmt)
    out += _write_poly_ints(F, F.decode_ints(pk.l_last), fmt)
    out += _write_poly_ints(F, F.decode_ints(pk.l_active_row), fmt)
    out += _write_poly_slice(F, pk.fixed_values, fmt)
    out += _write_poly_slice(F, pk.fixed_polys, fmt)
    out += _write_poly_slice(F, pk.fixed_cosets, fmt)
    out += _write_poly_slice(F, pk.permutation.permutations, fmt)
    out += _write_poly_slice(F, pk.permutation.polys, fmt)
    out += _write_poly_slice(F, pk.permutation.cosets, fmt)
    return bytes(out)


def pk_read(F, params, k: int, circuit, data: bytes,
            fmt: SerdeFormat = SerdeFormat.PROCESSED,
            compress_selectors: bool = True):
    """plonk.rs:334-360: read vk, then the polynomial payload; the
    evaluator is rebuilt from the constraint system."""
    import jax.numpy as jnp
    from ..frontend.circuit import compile_circuit
    from ..plonk.keygen import (ConstraintSystemBack, PermutationPK,
                                ProvingKey)
    from ..plonk.prover import Evaluator

    compiled, _cfg, _cs = compile_circuit(F, k, circuit, compress_selectors)
    cs_back = ConstraintSystemBack(compiled.cs, F.p)
    vk, off = _vk_read_at(F, params.curve, cs_back, data, 0, fmt)

    def poly(off):
        vals, off = _read_poly_ints(F, data, off, fmt)
        return F.encode_ints(vals), off

    def pslice(off, n_expected):
        polys, off = _read_poly_slice(F, data, off, fmt)
        if polys:
            flat = [v for p_ in polys for v in p_]
            arr = F.encode_ints(flat).reshape(len(polys), len(polys[0]),
                                              NLIMBS)
        else:
            arr = F.zeros((0, n_expected))
        return arr, off

    n = 1 << k
    ext_n = vk.domain.extended_n
    l0, off = poly(off)
    l_last, off = poly(off)
    l_active_row, off = poly(off)
    fixed_values, off = pslice(off, n)
    fixed_polys, off = pslice(off, n)
    fixed_cosets, off = pslice(off, ext_n)
    perms, off = pslice(off, n)
    polys, off = pslice(off, n)
    cosets, off = pslice(off, ext_n)
    if off != len(data):
        raise ValueError(f"trailing bytes in pk file ({len(data) - off})")

    evaluator = Evaluator(F, vk.domain, cs_back)
    return ProvingKey(vk, l0, l_last, l_active_row, fixed_values,
                      fixed_polys, fixed_cosets,
                      PermutationPK(perms, polys, cosets), evaluator)
