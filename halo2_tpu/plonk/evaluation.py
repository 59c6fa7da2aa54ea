"""Expression evaluation over device-resident column matrices.

The reference compiles expressions to a CSE'd linear op list interpreted
per-row with rayon (`GraphEvaluator`, halo2_backend/src/plonk/evaluation.rs:
200-835).  The TPU-native design instead *traces* the expression tree into
one jitted XLA computation over whole column arrays: rotations become
`jnp.roll` (cheap gathers), sums/products become batched field ops, and XLA
performs the CSE/fusion the reference does by hand.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields.field import Field
from ..frontend.expression import ADVICE, FIXED, INSTANCE, Expression


def evaluate_expression(F: Field, expr: Expression, *, fixed, advice,
                        instance, challenges, rot_scale: int = 1,
                        selectors=None):
    """Evaluate `expr` over every row.

    fixed/advice/instance: (num_cols, rows, NLIMBS) arrays (Montgomery form)
    challenges: dict {challenge_index: encoded () scalar}
    selectors: optional (num_selectors, rows, NLIMBS) for pre-conversion
               circuits (MockProver path)
    rot_scale: row step per unit rotation (1 on the base domain,
               2^(extended_k - k) on the extended domain — evaluation.rs:22-24)
    Returns (rows, NLIMBS).
    """
    kind_map = {FIXED: fixed, ADVICE: advice, INSTANCE: instance}

    def constant(v):
        return F.encode_int(v)

    def selector_fn(s):
        assert selectors is not None, \
            "selectors must be converted to fixed columns before evaluation"
        return selectors[s.index]

    def query_fn(column, rotation):
        col = kind_map[column.kind][column.index]
        return jnp.roll(col, -rotation.i * rot_scale, axis=0)

    def challenge_fn(c):
        return challenges[c.index]

    return expr.evaluate(
        constant, selector_fn, query_fn, challenge_fn,
        F.neg, F.add, F.mul,
        lambda a, k: F.mul(a, F.encode_int(k)))
