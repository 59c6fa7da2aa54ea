"""Field instances matching the curves the reference supports.

The reference delegates these to `halo2curves v0.6.0` (bn256 and the
pasta_curves re-export); moduli and multiplicative generators below are the
standard published parameters for those fields.
"""

from .field import Field

# BN254 (alt_bn128) scalar field Fr — 2-adicity 28, generator 7
BN254_FR = Field(
    "bn254::Fr",
    0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593F0000001,
    7,
)

# BN254 base field Fq — used for G1 coordinates (no FFT; S = 1)
BN254_FQ = Field(
    "bn254::Fq",
    0x30644E72E131A029B85045B68181585D97816A916871CA8D3C208C16D87CFD47,
    3,
)

# Pasta: Pallas base field Fp (= Vesta scalar field) — 2-adicity 32, generator 5
PASTA_FP = Field(
    "pasta::Fp",
    0x40000000000000000000000000000000224698FC094CF91B992D30ED00000001,
    5,
)

# Pasta: Pallas scalar field Fq (= Vesta base field) — 2-adicity 32, generator 5
PASTA_FQ = Field(
    "pasta::Fq",
    0x40000000000000000000000000000000224698FC0994A8DD8C46EB2100000001,
    5,
)
