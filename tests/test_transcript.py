"""Transcript tests: keccak vectors, prover/verifier challenge-stream equality."""

import hashlib

from halo2_tpu.curves import VESTA, BN254_G1
from halo2_tpu.transcript import (
    Blake2bWrite, Blake2bRead, Keccak256Write, Keccak256Read, Keccak256,
)


def test_keccak256_known_vectors():
    # standard Keccak-256 (pre-SHA3 padding) test vectors
    assert Keccak256().digest().hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert Keccak256().update(b"abc").digest().hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    # incremental == one-shot across the rate boundary
    msg = bytes(range(256))
    one = Keccak256().update(msg).digest()
    inc = Keccak256()
    for b in msg:
        inc.update(bytes([b]))
    assert inc.digest() == one
    # digest() must not consume state
    k = Keccak256().update(b"abc")
    assert k.digest() == k.digest()


def py_mul(curve, P, k):
    p = curve.Fq.p

    def add(P, Q):
        if P is None:
            return Q
        if Q is None:
            return P
        x1, y1 = P
        x2, y2 = Q
        if x1 == x2 and (y1 + y2) % p == 0:
            return None
        lam = ((3 * x1 * x1) * pow(2 * y1, p - 2, p) if P == Q
               else (y2 - y1) * pow(x2 - x1, p - 2, p)) % p
        x3 = (lam * lam - x1 - x2) % p
        return (x3, (lam * (x1 - x3) - y1) % p)

    acc, base = None, P
    while k:
        if k & 1:
            acc = add(acc, base)
        base = add(base, base)
        k >>= 1
    return acc


def roundtrip(curve, Write, Read):
    g = (curve.gen_x, curve.gen_y)
    pts = [py_mul(curve, g, k) for k in [1, 5, 1234]]
    scalars = [0, 7, curve.Fr.p - 1]

    w = Write(curve)
    w_challenges = [w.squeeze_challenge()]
    for pt in pts:
        w.write_point(pt)
    w_challenges.append(w.squeeze_challenge())
    for s in scalars:
        w.write_scalar(s)
    w_challenges.append(w.squeeze_challenge())
    w.common_scalar(42)
    w_challenges.append(w.squeeze_challenge())
    proof = w.finalize()

    r = Read(curve, proof)
    r_challenges = [r.squeeze_challenge()]
    assert r.read_n_points(3) == pts
    r_challenges.append(r.squeeze_challenge())
    assert r.read_n_scalars(3) == scalars
    r_challenges.append(r.squeeze_challenge())
    r.common_scalar(42)
    r_challenges.append(r.squeeze_challenge())

    assert w_challenges == r_challenges
    assert all(0 < c < curve.Fr.p for c in w_challenges)
    return proof, w_challenges


def test_blake2b_roundtrip():
    p1, c1 = roundtrip(VESTA, Blake2bWrite, Blake2bRead)
    p2, c2 = roundtrip(BN254_G1, Blake2bWrite, Blake2bRead)
    assert c1 != c2  # different curves, different streams


def test_keccak_roundtrip():
    p1, c1 = roundtrip(VESTA, Keccak256Write, Keccak256Read)
    # keccak and blake2b transcripts diverge
    p2, c2 = roundtrip(VESTA, Blake2bWrite, Blake2bRead)
    assert p1 == p2          # same proof bytes
    assert c1 != c2          # different challenges


def test_challenge_depends_on_history():
    w1 = Blake2bWrite(VESTA)
    w2 = Blake2bWrite(VESTA)
    w2.common_scalar(1)
    assert w1.squeeze_challenge() != w2.squeeze_challenge()


def test_infinity_rejected():
    w = Blake2bWrite(VESTA)
    try:
        w.write_point(None)
        assert False, "expected rejection of identity"
    except ValueError:
        pass


def test_tampered_proof_changes_challenges():
    proof, challenges = roundtrip(VESTA, Blake2bWrite, Blake2bRead)
    bad = bytearray(proof)
    bad[0] ^= 1
    r = Blake2bRead(VESTA, bytes(bad))
    r.squeeze_challenge()
    from halo2_tpu.plonk.errors import TranscriptError
    try:
        pt = r.read_point()  # may fail to decode; if it decodes, challenge differs
        r2 = r.squeeze_challenge()
        # after reading 3 points the stream diverges from original challenges
    except TranscriptError:
        return
