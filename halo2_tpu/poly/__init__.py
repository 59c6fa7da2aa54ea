from .domain import EvaluationDomain, Rotation
from .arith import (
    eval_polynomial, compute_inner_product, kate_division, tree_sum,
    lagrange_interpolate_int, eval_polynomial_int,
)

__all__ = [
    "EvaluationDomain", "Rotation",
    "eval_polynomial", "compute_inner_product", "kate_division", "tree_sum",
    "lagrange_interpolate_int", "eval_polynomial_int",
]
