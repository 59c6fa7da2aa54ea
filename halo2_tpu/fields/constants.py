"""Field instances matching the curves the reference supports.

The reference delegates these to `halo2curves v0.6.0` (bn256 and the
pasta_curves re-export); moduli and multiplicative generators below are the
standard published parameters for those fields.

ZETA (the pinned primitive cube root of unity, used as the extended-domain
coset generator — domain.rs:83) provenance:
  * PASTA_FP: pinned EMPIRICALLY against the reference's golden pinned-vk —
    the plonk_api lookup table contains 2834758237 * ZETA, so the table
    column's commitment (plonk_api.rs:1123) discriminates the two cube
    roots (tests/test_pinned_vk.py).
  * PASTA_FQ / BN254_FQ / BN254_FR: fixed by endomorphism consistency with
    the pinned partner field: (ZETA_base * x, y) == [ZETA_scalar] P on the
    curve, which holds for exactly one pairing of the cube roots (checked
    in tools/derive_iso.py conventions and tests/test_fields.py).
"""

from .field import Field

# BN254 (alt_bn128) scalar field Fr — 2-adicity 28, generator 7
BN254_FR = Field(
    "bn254::Fr",
    0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593F0000001,
    7,
    zeta=0x30644E72E131A029048B6E193FD84104CC37A73FEC2BC5E9B8CA0B2D36636F23,
)

# BN254 base field Fq — used for G1 coordinates (no FFT; S = 1)
BN254_FQ = Field(
    "bn254::Fq",
    0x30644E72E131A029B85045B68181585D97816A916871CA8D3C208C16D87CFD47,
    3,
    zeta=0x30644E72E131A0295E6DD9E7E0ACCCB0C28F069FBB966E3DE4BD44E5607CFD48,
)

# Pasta: Pallas base field Fp (= Vesta scalar field) — 2-adicity 32, generator 5
PASTA_FP = Field(
    "pasta::Fp",
    0x40000000000000000000000000000000224698FC094CF91B992D30ED00000001,
    5,
    zeta=0x12CCCA834ACDBA712CAAD5DC57AAB1B01D1F8BD237AD31491DAD5EBDFDFE4AB9,
)

# Pasta: Pallas scalar field Fq (= Vesta base field) — 2-adicity 32, generator 5
PASTA_FQ = Field(
    "pasta::Fq",
    0x40000000000000000000000000000000224698FC0994A8DD8C46EB2100000001,
    5,
    zeta=0x06819A58283E528E511DB4D81CF70F5A0FED467D47C033AF2AA9D2E050AA0E4F,
)
