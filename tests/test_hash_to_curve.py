"""pasta-compatible hash_to_curve + pinned-constant consistency tests.

The strongest anchor is tests/test_pinned_vk.py (full golden byte
equality); these are fast unit-level checks of the same machinery.
"""

from halo2_tpu.curves.hash_to_curve import (
    ec_add, ec_mul, hash_to_curve, is_on_curve,
)
from halo2_tpu.curves.iso_constants import PALLAS_ISO, VESTA_ISO
from halo2_tpu.fields.constants import (
    BN254_FQ, BN254_FR, PASTA_FP, PASTA_FQ,
)

# w = hash_to_curve("Halo2-Parameters")([1]) on Vesta, pinned by the
# reference golden vk (plonk_api.rs:1117, fixed_commitments[0] with
# Blind::default() = ONE over the all-zero sf column).
GOLDEN_W_VESTA = (
    0x2BBC94EF7B22AEBEF24F9A4B0CC1831882548B605171366017D45C3E6FD92075,
    0x082B801A6E176239943BFB759FB02138F47A5C8CC4AA7FA0AF559FDE4E3ABD97,
)


def test_vesta_w_matches_reference_golden():
    h = hash_to_curve(VESTA_ISO, "Halo2-Parameters")
    assert h(b"\x01") == GOLDEN_W_VESTA


def test_outputs_on_curve_and_deterministic():
    for spec in (VESTA_ISO, PALLAS_ISO):
        h = hash_to_curve(spec, "Halo2-Parameters")
        for i in range(8):
            m = b"\x00" + i.to_bytes(4, "little")
            pt = h(m)
            assert pt is not None
            assert is_on_curve(spec.p, 0, spec.b, pt)
            assert h(m) == pt
        # different domain prefix -> different points
        h2 = hash_to_curve(spec, "other-domain")
        assert h2(b"\x01") != h(b"\x01")


def test_iso_constants_rational_fingerprint():
    """Both curves' maps share one rational isogeny formula; the x0-free
    coefficients are the small rationals (1/9, 380/9, 1/27, -940/27, -540)."""
    for spec in (VESTA_ISO, PALLAS_ISO):
        p = spec.p

        def frac(n, d):
            return n * pow(d, p - 2, p) % p

        iso = spec.isogeny
        assert iso[0] == frac(1, 9)
        assert iso[3] == frac(380, 9)
        assert iso[6] == frac(1, 27)
        assert iso[9] == frac(-940, 27)
        assert iso[12] == frac(-540, 1)
        assert spec.iso_b == 1265


def test_zeta_endomorphism_consistency():
    """The pinned ZETAs satisfy (ZETA_base * x, y) == [ZETA_scalar] P on
    each curve — the pairing that fixes the scalar-side cube root once the
    base side is pinned (PASTA_FP empirically via the golden vk)."""
    cases = [
        # (p_base, b, generator, zeta_base, zeta_scalar)
        (PASTA_FP.p, 5, (PASTA_FP.p - 1, 2), PASTA_FP.zeta, PASTA_FQ.zeta),
        (PASTA_FQ.p, 5, (PASTA_FQ.p - 1, 2), PASTA_FQ.zeta, PASTA_FP.zeta),
        (BN254_FQ.p, 3, (1, 2), BN254_FQ.zeta, BN254_FR.zeta),
    ]
    for p, b, G, zb, zs in cases:
        assert pow(zb, 3, p) == 1 and zb != 1
        endo = (zb * G[0] % p, G[1])
        assert ec_mul(p, 0, G, zs) == endo


def test_sswu_iso_sum_structure():
    """q0 + q1 is added on the ISO curve before the single iso_map (the
    pasta structure) — spot-check the iso curve arithmetic is coherent."""
    spec = VESTA_ISO
    p = spec.p
    # find two points on the iso curve and check the isogeny is a
    # homomorphism through iso_map
    from halo2_tpu.curves.hash_to_curve import iso_map, _jac_to_affine, _sqrt

    def point_at(seed):
        x = seed
        while True:
            y2 = (pow(x, 3, p) + spec.iso_a * x + spec.iso_b) % p
            y = _sqrt(p, y2)
            if y is not None:
                return (x, y)
            x += 1

    P = point_at(11)
    Q = point_at(777)
    fP = _jac_to_affine(p, iso_map(spec, (P[0], P[1], 1)))
    fQ = _jac_to_affine(p, iso_map(spec, (Q[0], Q[1], 1)))
    s = ec_add(p, spec.iso_a, P, Q)
    fs = _jac_to_affine(p, iso_map(spec, (s[0], s[1], 1)))
    assert fs == ec_add(p, 0, fP, fQ)
    assert is_on_curve(p, 0, spec.b, fP)
