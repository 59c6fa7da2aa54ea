"""V1 dual-pass floor planner (floor_planner/v1.rs + v1/strategy.rs) tests:
allocation strategy unit tests, packing behavior vs the single-pass planner,
and an end-to-end proof with a V1-planned circuit."""

from halo2_tpu.fields import PASTA_FP as F
from halo2_tpu.frontend import (
    Circuit, ConstraintSystem, Layouter, Rotation, Value, compile_circuit,
)
from halo2_tpu.frontend.floor_planner_v1 import (
    Allocations, V1FloorPlanner, _first_fit_region,
    slot_in_biggest_advice_first,
)
from halo2_tpu.frontend.circuit import _RegionShape
from halo2_tpu.frontend.expression import ADVICE, Column
from halo2_tpu.dev import MockProver
import pytest


def test_allocations_free_intervals():
    a = Allocations()
    a.allocate(2, 3)    # occupies [2, 5)
    a.allocate(8, 2)    # occupies [8, 10)
    free = a.free_intervals(0, None)
    spans = [(s.start, s.end) for s in free]
    assert spans == [(0, 2), (5, 8), (10, None)]
    assert a.unbounded_interval_start() == 10


def test_first_fit_fills_gaps():
    col_a, col_b = Column(ADVICE, 0), Column(ADVICE, 1)
    allocations = {}
    # occupy [0,4) in col_a only
    assert _first_fit_region(allocations, [col_a], 4) == 0
    # a 2-row region on col_b fits at 0 (col_b is empty)
    assert _first_fit_region(allocations, [col_b], 2) == 0
    # a region using both columns must go after col_a's block: row 4
    assert _first_fit_region(allocations, [col_a, col_b], 1) == 4
    # a later col_b region fills the gap [2,4)
    assert _first_fit_region(allocations, [col_b], 2) == 2


def test_biggest_advice_first_ordering():
    col_a, col_b = Column(ADVICE, 0), Column(ADVICE, 1)
    small = _RegionShape()
    small.note(col_a, 0)                 # 1 row x 1 advice col
    big = _RegionShape()
    for r in range(4):
        big.note(col_a, r)
        big.note(col_b, r)               # 4 rows x 2 advice cols
    starts, _ = slot_in_biggest_advice_first([small, big])
    # big is planned first at 0; small first-fits after it in col_a
    assert starts[1] == 0
    assert starts[0] == 4


class V1Circuit(Circuit):
    """SimpleCircuit's mul chain planned by the V1 dual-pass planner."""

    floor_planner = V1FloorPlanner

    def __init__(self, constant=0, a=Value.unknown(), b=Value.unknown()):
        self.constant = constant
        self.a = a if isinstance(a, Value) else Value.known(a)
        self.b = b if isinstance(b, Value) else Value.known(b)

    def without_witnesses(self):
        return V1Circuit(self.constant)

    def configure(self, meta: ConstraintSystem):
        advice = [meta.advice_column(), meta.advice_column()]
        instance = meta.instance_column()
        constant = meta.fixed_column()
        meta.enable_equality(instance)
        meta.enable_constant(constant)
        for c in advice:
            meta.enable_equality(c)
        s_mul = meta.selector()

        def mul_gate(cells):
            lhs = cells.query_advice(advice[0], Rotation.cur())
            rhs = cells.query_advice(advice[1], Rotation.cur())
            out = cells.query_advice(advice[0], Rotation.next())
            s = cells.query_selector(s_mul)
            return [s * (lhs * rhs - out)]

        meta.create_gate("mul", mul_gate)
        return {"advice": advice, "instance": instance, "s_mul": s_mul}

    def synthesize(self, config, layouter: Layouter):
        advice = config["advice"]

        def load(name, value):
            return layouter.assign_region(
                name, lambda region: region.assign_advice(advice[0], 0, value))

        def load_constant(value):
            return layouter.assign_region(
                "constant",
                lambda region: region.assign_advice_from_constant(
                    advice[0], 0, value))

        def mul(name, a_cell, b_cell):
            def closure(region):
                config["s_mul"].enable(region, 0)
                a_cell.copy_advice(region, advice[0], 0)
                b_cell.copy_advice(region, advice[1], 0)
                value = a_cell.value() * b_cell.value()
                return region.assign_advice(advice[0], 1, value)
            return layouter.assign_region(name, closure)

        a = load("load a", self.a)
        b = load("load b", self.b)
        const = load_constant(self.constant)
        ab = mul("a*b", a, b)
        absq = mul("ab*ab", ab, ab)
        c = mul("c", const, absq)
        layouter.constrain_instance(c.cell, config["instance"], 0)


def test_v1_mock_prover():
    const, a, b = 7, 5, 9
    c = (const * a**2 * b**2) % F.p
    prover = MockProver.run(F, 6, V1Circuit(const, a, b), [[c]])
    assert prover.verify() == []


def test_v1_compile_matches_constraints():
    compiled, _, cs = compile_circuit(F, 6, V1Circuit(7),
                                      compress_selectors=True)
    assert cs.num_selectors == 0
    assert len(compiled.preprocessing.fixed) == cs.num_fixed_columns


@pytest.mark.slow
def test_v1_proof_roundtrip():
    from halo2_tpu.api import keygen, create_proof, verify
    from halo2_tpu.commit import ParamsIPA, new_rng
    from halo2_tpu.curves import VESTA

    k = 6
    const, a, b = 7, 5, 9
    c = (const * a**2 * b**2) % F.p
    params = ParamsIPA.new(VESTA, k)
    pk = keygen(F, params, k, V1Circuit(const))
    proof = create_proof(params, pk, [V1Circuit(const, a, b)], [[[c]]],
                         new_rng(3))
    assert verify(params, pk.vk, proof, [[[c]]])
    assert not verify(params, pk.vk, proof, [[[c + 1]]])
