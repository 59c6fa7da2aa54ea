"""Selector compression (compress_selectors.rs) tests: packing rules,
substitution-expression semantics (the reference's proptest shape), and an
end-to-end compressed proof."""

import random

import pytest

from halo2_tpu.fields import PASTA_FP as F
from halo2_tpu.frontend import (
    Circuit, ConstraintSystem, Layouter, Rotation, Value, compile_circuit,
)
from halo2_tpu.frontend.compress_selectors import (
    SelectorDescription, process,
)
from halo2_tpu.frontend.expression import Column, Expression, FIXED


def _run_process(descriptions, max_degree):
    columns = []

    def allocate():
        col = Column(FIXED, 1000 + len(columns))
        columns.append(col)
        return Expression.query(col, Rotation(0))

    polys, assignments = process(descriptions, max_degree, allocate)
    return polys, assignments, columns


def _eval_expr(expr, col_values, row):
    return expr.evaluate(
        lambda c: c % F.p,
        lambda s: (_ for _ in ()).throw(AssertionError("selector survived")),
        lambda col, rot: col_values[col.index][row],
        lambda c: 0,
        lambda a: (-a) % F.p,
        lambda a, b: (a + b) % F.p,
        lambda a, b: (a * b) % F.p,
        lambda a, k: (a * k) % F.p,
    )


def _check_semantics(descriptions, polys, assignments, columns):
    """Each selector's substitution expression must be nonzero exactly on its
    active rows (the reference proptest's invariant)."""
    col_values = {col.index: poly for col, poly in zip(columns, polys)}
    by_selector = {a.selector: a for a in assignments}
    for desc in descriptions:
        a = by_selector[desc.selector]
        for row, active in enumerate(desc.activations):
            v = _eval_expr(a.expression, col_values, row)
            assert (v != 0) == active, (
                f"selector {desc.selector} row {row}: got {v}, active={active}")


def test_disjoint_selectors_pack_into_one_column():
    n = 8
    acts = [
        [True, False, False, False] * 2,
        [False, True, False, False] * 2,
        [False, False, True, False] * 2,
    ]
    descriptions = [SelectorDescription(i, a, 2) for i, a in enumerate(acts)]
    polys, assignments, columns = _run_process(descriptions, 5)
    assert len(columns) == 1       # all three fit one combination column
    assert len(polys) == 1
    roots = sorted(set(polys[0]) - {0})
    assert roots == [1, 2, 3]
    _check_semantics(descriptions, polys, assignments, columns)


def test_conflicting_selectors_stay_separate():
    acts = [
        [True, False, True, False],
        [True, True, False, False],   # conflicts with #0 on row 0
    ]
    descriptions = [SelectorDescription(i, a, 2) for i, a in enumerate(acts)]
    polys, assignments, columns = _run_process(descriptions, 10)
    assert len(columns) == 2
    _check_semantics(descriptions, polys, assignments, columns)


def test_degree_zero_selectors_get_plain_columns():
    acts = [[True, False], [False, True]]
    descriptions = [SelectorDescription(i, a, 0) for i, a in enumerate(acts)]
    polys, assignments, columns = _run_process(descriptions, 10)
    assert len(columns) == 2
    assert polys[0] == [1, 0] and polys[1] == [0, 1]
    for a in assignments:
        assert a.expression.tag == "query"
    _check_semantics(descriptions, polys, assignments, columns)


def test_degree_budget_limits_combination_size():
    # max_degree 3, each selector's gate degree 2 → d=1; a combination of m
    # selectors needs d + m <= max_degree → at most 2 per column.
    acts = [[r == i for r in range(6)] for i in range(6)]
    descriptions = [SelectorDescription(i, a, 2) for i, a in enumerate(acts)]
    polys, assignments, columns = _run_process(descriptions, 3)
    assert len(columns) == 3
    _check_semantics(descriptions, polys, assignments, columns)


def test_random_disjoint_property():
    rng = random.Random(7)
    n = 32
    for _ in range(5):
        k = rng.randint(1, 6)
        owner = [rng.randrange(k + 1) for _ in range(n)]  # 0 = nobody
        acts = [[owner[r] == i + 1 for r in range(n)] for i in range(k)]
        descriptions = [
            SelectorDescription(i, a, rng.randint(0, 3))
            for i, a in enumerate(acts)
        ]
        max_degree = rng.randint(4, 7)
        polys, assignments, columns = _run_process(descriptions, max_degree)
        _check_semantics(descriptions, polys, assignments, columns)


class ThreeSelectorCircuit(Circuit):
    """Three disjoint simple selectors over one advice column; compression
    should pack them into a single fixed column."""

    def __init__(self, x=Value.unknown()):
        self.x = x if isinstance(x, Value) else Value.known(x)

    def without_witnesses(self):
        return ThreeSelectorCircuit()

    def configure(self, meta: ConstraintSystem):
        a = meta.advice_column()
        meta.enable_equality(a)
        instance = meta.instance_column()
        meta.enable_equality(instance)
        s_add = meta.selector()
        s_mul = meta.selector()
        s_cube = meta.selector()

        def gate(sel, fn):
            def build(cells):
                cur = cells.query_advice(a, Rotation.cur())
                nxt = cells.query_advice(a, Rotation.next())
                s = cells.query_selector(sel)
                return [s * fn(cur, nxt)]
            return build

        meta.create_gate("add1", gate(s_add, lambda c, n: c + 1 - n))
        meta.create_gate("sq", gate(s_mul, lambda c, n: c * c - n))
        meta.create_gate("cube", gate(s_cube, lambda c, n: c * c * c - n))
        return {"a": a, "instance": instance,
                "sels": (s_add, s_mul, s_cube)}

    def synthesize(self, config, layouter: Layouter):
        a = config["a"]
        s_add, s_mul, s_cube = config["sels"]

        def step(name, sel, cell, value):
            def closure(region):
                sel.enable(region, 0)
                cell.copy_advice(region, a, 0)
                return region.assign_advice(a, 1, value)
            return layouter.assign_region(name, closure)

        def load(value):
            return layouter.assign_region(
                "load", lambda region: region.assign_advice(a, 0, value))

        x = load(self.x)
        y = step("add1", s_add, x, x.value() + Value.known(1))
        z = step("sq", s_mul, y, y.value() * y.value())
        w = step("cube", s_cube, z,
                 z.value() * z.value() * z.value())
        layouter.constrain_instance(w.cell, config["instance"], 0)


def test_compressed_circuit_fewer_fixed_columns():
    compiled_c, _, cs_c = compile_circuit(F, 6, ThreeSelectorCircuit(),
                                          compress_selectors=True)
    compiled_d, _, cs_d = compile_circuit(F, 6, ThreeSelectorCircuit(),
                                          compress_selectors=False)
    # degree budget 4: s_add (deg-2) and s_mul (deg-3) share one combination
    # column; the deg-4 cube gate's selector can't join and gets its own.
    assert cs_c.num_fixed_columns == 2
    assert cs_d.num_fixed_columns == 3    # one per selector
    assert cs_c.num_selectors == 0 and cs_d.num_selectors == 0


@pytest.mark.slow
def test_compressed_proof_roundtrip():
    from halo2_tpu.api import keygen, create_proof, verify
    from halo2_tpu.commit import ParamsIPA, new_rng
    from halo2_tpu.curves import VESTA

    k = 6
    x = 3
    y = x + 1
    out = (y * y) ** 3 % F.p
    params = ParamsIPA.new(VESTA, k)
    pk = keygen(F, params, k, ThreeSelectorCircuit(), compress_selectors=True)
    rng = new_rng(42)
    proof = create_proof(params, pk, [ThreeSelectorCircuit(x)],
                         [[[out]]], rng)
    assert verify(params, pk.vk, proof, [[[out]]])
    assert not verify(params, pk.vk, proof, [[[out + 1]]])
