"""Key serialization (halo2_backend/src/plonk.rs:58-155 vk serde VERSION=0x04,
:297-376 pk serde; helpers.rs:9-21 SerdeFormat).

Like the reference's `vk_read`/`pk_read` (halo2_proofs/src/plonk.rs:45-86),
reading requires re-compiling the circuit to recover the constraint system;
the file carries the commitments/values and a version-checked header.
Polynomial/coset forms are recomputed on load (they are FFTs of the stored
Lagrange values).
"""

from __future__ import annotations

import struct
from enum import Enum
from typing import List

from ..fields.field import NLIMBS

# NOTE: frontend/plonk imports are deferred into the functions below —
# commit/kzg.py imports this package (for the pairing) while plonk is still
# initializing, so importing plonk.keygen at module scope is a cycle.

VERSION = 0x04   # mirrors plonk.rs vk VERSION


class SerdeFormat(Enum):
    """helpers.rs:9-21: PROCESSED = canonical/compressed with curve checks;
    RAW_BYTES = raw Montgomery-form coordinates with checks (skips the
    to/from-canonical conversion); RAW_BYTES_UNCHECKED = raw without
    validation (trusted inputs, fastest)."""
    PROCESSED = 0
    RAW_BYTES = 1
    RAW_BYTES_UNCHECKED = 2


def _pt_size(fmt: SerdeFormat) -> int:
    return 32 if fmt == SerdeFormat.PROCESSED else 64


def _write_point(curve, pt, fmt: SerdeFormat = SerdeFormat.PROCESSED) -> bytes:
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
        if xm >= (1 << 256) or x >= Fq.p or y >= Fq.p:
            raise ValueError("coordinate out of range")
        if (y * y - x * x * x - curve.b) % Fq.p != 0:
            raise ValueError("point not on curve")
    return (x, y), off


def vk_write(vk, fmt: SerdeFormat = SerdeFormat.PROCESSED) -> bytes:
    curve = vk.curve
    out = bytearray()
    out += bytes([VERSION])
    out += bytes([fmt.value])
    out += struct.pack("<I", vk.k)
    out += struct.pack("<I", len(vk.fixed_commitments))
    for pt in vk.fixed_commitments:
        out += _write_point(curve, pt, fmt)
    out += struct.pack("<I", len(vk.permutation.commitments))
    for pt in vk.permutation.commitments:
        out += _write_point(curve, pt, fmt)
    out += vk.F.to_repr(vk.transcript_repr)
    return bytes(out)


def vk_read(F, params, k: int, circuit, data: bytes):
    """Recompiles `circuit` to recover the constraint system, then checks the
    stored commitments/hash against a fresh keygen (structure validation)."""
    from ..frontend.circuit import compile_circuit
    from ..plonk.keygen import keygen as backend_keygen
    curve = params.curve
    if data[0] != VERSION:
        raise ValueError(f"unexpected vk version {data[0]}")
    fmt = SerdeFormat(data[1])
    (k_read,) = struct.unpack("<I", data[2:6])
    if k_read != k:
        raise ValueError(f"vk k mismatch: file has {k_read}, expected {k}")
    off = 6
    (n_fixed,) = struct.unpack("<I", data[off:off + 4])
    off += 4
    fixed = []
    for _ in range(n_fixed):
        pt, off = _read_point(curve, data, off, fmt)
        fixed.append(pt)
    (n_perm,) = struct.unpack("<I", data[off:off + 4])
    off += 4
    perm = []
    for _ in range(n_perm):
        pt, off = _read_point(curve, data, off, fmt)
        perm.append(pt)
    repr_read = F.from_repr(data[off:off + 32])

    vk = backend_keygen(F, params,
                        compile_circuit(F, k, circuit)[0], k).vk
    if vk.fixed_commitments != fixed or vk.permutation.commitments != perm:
        raise ValueError("vk commitments do not match recompiled circuit")
    if vk.transcript_repr != repr_read:
        raise ValueError("vk transcript hash mismatch")
    return vk


def pk_write(pk) -> bytes:
    """vk + fixed column values + sigma values (polys/cosets recomputed)."""
    F = pk.vk.F
    out = bytearray(vk_write(pk.vk))
    fixed_ints = [v for col in
                  (F.decode_ints(pk.fixed_values[i])
                   for i in range(pk.fixed_values.shape[0]))
                  for v in col]
    sig_ints = [v for col in
                (F.decode_ints(pk.permutation.permutations[i])
                 for i in range(pk.permutation.permutations.shape[0]))
                for v in col]
    out += struct.pack("<II", pk.fixed_values.shape[0],
                       pk.permutation.permutations.shape[0])
    for v in fixed_ints + sig_ints:
        out += F.to_repr(v)
    return bytes(out)


def pk_read(F, params, k: int, circuit, data: bytes):
    """Reference pk_read recompiles the circuit (halo2_proofs/src/plonk.rs:
    45-86); we do the same and validate the embedded vk header."""
    from ..frontend.circuit import compile_circuit
    from ..plonk.keygen import keygen as backend_keygen
    pk = backend_keygen(F, params, compile_circuit(F, k, circuit)[0], k)
    # validate against the stored vk header
    vk_read(F, params, k, circuit, data)
    return pk
