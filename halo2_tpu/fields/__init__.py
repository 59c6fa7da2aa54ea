from .field import Field, NLIMBS, LIMB_BITS, MASK
from .constants import BN254_FR, BN254_FQ, PASTA_FP, PASTA_FQ

__all__ = [
    "Field", "NLIMBS", "LIMB_BITS", "MASK",
    "BN254_FR", "BN254_FQ", "PASTA_FP", "PASTA_FQ",
]
