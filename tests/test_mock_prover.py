"""MockProver tests over the simple-example circuit."""

import pytest

from halo2_tpu.fields import PASTA_FP
from halo2_tpu.dev import MockProver
from halo2_tpu.frontend import Value

from circuits import SimpleCircuit

F = PASTA_FP
K = 4


def make(a=2, b=3, constant=7):
    c = (constant * a * a * b * b) % F.p
    return SimpleCircuit(constant, Value.known(a), Value.known(b)), c


def test_satisfied():
    circuit, c = make()
    prover = MockProver.run(F, K, circuit, [[c]])
    assert prover.verify() == []
    prover.assert_satisfied()


def test_wrong_instance_fails():
    circuit, c = make()
    prover = MockProver.run(F, K, circuit, [[(c + 1) % F.p]])
    failures = prover.verify()
    assert failures, "wrong public input must fail"
    assert any(f.kind == "permutation" for f in failures)


def test_wrong_witness_fails():
    # break the multiplication by lying about b's value downstream:
    # claim instance for different a/b than witnessed
    circuit, _ = make(a=2, b=3)
    _, c_other = make(a=2, b=4)
    prover = MockProver.run(F, K, circuit, [[c_other]])
    assert prover.verify(), "mismatched witness/instance must fail"


def test_too_small_k_fails():
    from halo2_tpu.frontend import NotEnoughRowsAvailable
    circuit, c = make()
    with pytest.raises(NotEnoughRowsAvailable):
        MockProver.run(F, 3, circuit, [[c]])


class BrokenGateCircuit(SimpleCircuit):
    """Enables the mul gate but witnesses a wrong product."""

    def synthesize(self, config, layouter):
        advice = config["advice"]

        def closure(region):
            config["s_mul"].enable(region, 0)
            region.assign_advice(advice[0], 0, Value.known(2))
            region.assign_advice(advice[1], 0, Value.known(3))
            # wrong: 2*3 != 7
            return region.assign_advice(advice[0], 1, Value.known(7))

        cell = layouter.assign_region("bad mul", closure)
        layouter.constrain_instance(cell.cell, config["instance"], 0)


class UnassignedCellCircuit(SimpleCircuit):
    """Enables the mul gate but never assigns the output cell."""

    def synthesize(self, config, layouter):
        advice = config["advice"]

        def closure(region):
            config["s_mul"].enable(region, 0)
            region.assign_advice(advice[0], 0, Value.known(2))
            return region.assign_advice(advice[1], 0, Value.known(3))

        layouter.assign_region("incomplete mul", closure)


def test_gate_failure_carries_region_and_cell_values():
    prover = MockProver.run(F, K, BrokenGateCircuit(7), [[7]])
    failures = prover.verify()
    gate_fails = [f for f in failures if f.kind == "gate"]
    assert gate_fails, "wrong product must fail the mul gate"
    f = gate_fails[0]
    assert f.location is not None and "bad mul" in f.location.name
    vals = {str(c): v for c, v in f.cell_values}
    assert vals["advice[0]"] == 2 and vals["advice[1]"] == 3
    assert vals["advice[0]@+1"] == 7


def test_unassigned_cell_detected():
    prover = MockProver.run(F, K, UnassignedCellCircuit(0), [[]])
    failures = prover.verify()
    kinds = {f.kind for f in failures}
    assert "cell_not_assigned" in kinds
    f = [x for x in failures if x.kind == "cell_not_assigned"][0]
    assert "incomplete mul" in f.location.name


def test_verify_at_rows_scopes_gate_checks():
    """verify_at_rows (dev.rs:742-749): a failing gate row outside the
    requested row set is not reported; inside, it is."""
    circuit = BrokenGateCircuit(7, Value.known(2), Value.known(3))
    prover = MockProver.run(PASTA_FP, 5, circuit, [[0]])
    all_failures = prover.verify()
    assert all_failures
    # rows where failures were reported
    bad_rows = set()
    for f in all_failures:
        import re
        m = re.search(r"rows \[([0-9, ]+)\]", f.detail)
        if m:
            bad_rows.update(int(x) for x in m.group(1).split(","))
    assert bad_rows
    ok_rows = [r for r in range(prover.usable_rows) if r not in bad_rows]
    scoped = prover.verify_at_rows(ok_rows, ok_rows)
    assert not [f for f in scoped if f.kind == "gate"]
    scoped_bad = prover.verify_at_rows(sorted(bad_rows), None)
    assert [f for f in scoped_bad if f.kind == "gate"]


def test_constraint_poisoned_detected():
    """A selector-enabled gate whose queried cells reach past usable rows
    must report ConstraintPoisoned (dev.rs Poison / failure.rs:158-171)."""
    from halo2_tpu.frontend import (Circuit, ConstraintSystem, Layouter,
                                    Rotation)

    class RotCircuit(Circuit):
        def __init__(self, row):
            self.row = row

        def without_witnesses(self):
            return RotCircuit(self.row)

        def configure(self, meta: ConstraintSystem):
            a = meta.advice_column()
            s = meta.complex_selector()

            def gate(cells):
                sv = cells.query_selector(s)
                cur = cells.query_advice(a, Rotation.cur())
                nxt = cells.query_advice(a, Rotation.next())
                return [sv * (nxt - cur)]

            meta.create_gate("step", gate)
            return {"a": a, "s": s}

        def synthesize(self, config, layouter: Layouter):
            def build(region):
                config["s"].enable(region, 0)
                region.assign_advice(config["a"], 0, 1)
                if self.row == 0:
                    region.assign_advice(config["a"], 1, 1)

            # place the region explicitly at self.row via padding region
            def pad(region):
                region.assign_advice(config["a"], self.row - 1, 0) \
                    if self.row else None

            if self.row:
                layouter.assign_region("pad", pad)
            layouter.assign_region("rot", build)

    F = PASTA_FP
    k = 4
    # enabled at a safe row: fine
    mp = MockProver.run(F, k, RotCircuit(0), [])
    assert not [f for f in mp.verify() if f.kind == "constraint_poisoned"]

    usable = (1 << k) - (mp.cs.blinding_factors() + 1)
    # enable the selector at the last usable row: Rotation::next() reaches
    # into the poisoned blinding region
    mp2 = MockProver.run(F, k, RotCircuit(usable - 1), [])
    kinds = [f.kind for f in mp2.verify()]
    assert "constraint_poisoned" in kinds, kinds


def test_instance_cell_not_assigned_detected():
    from halo2_tpu.frontend import (Circuit, ConstraintSystem, Layouter,
                                    Rotation)

    class InstCircuit(Circuit):
        def without_witnesses(self):
            return InstCircuit()

        def configure(self, meta: ConstraintSystem):
            a = meta.advice_column()
            p = meta.instance_column()
            s = meta.complex_selector()

            def gate(cells):
                sv = cells.query_selector(s)
                av = cells.query_advice(a, Rotation.cur())
                pv = cells.query_instance(p, Rotation.cur())
                return [sv * (av - pv)]

            meta.create_gate("public", gate)
            return {"a": a, "s": s}

        def synthesize(self, config, layouter: Layouter):
            def build(region):
                # rows 0 and 1 both enabled; instance only provides row 0
                config["s"].enable(region, 0)
                region.assign_advice(config["a"], 0, 5)
                config["s"].enable(region, 1)
                region.assign_advice(config["a"], 1, 0)

            layouter.assign_region("r", build)

    F = PASTA_FP
    mp = MockProver.run(F, 4, InstCircuit(), [[5]])
    kinds = [f.kind for f in mp.verify()]
    assert "instance_cell_not_assigned" in kinds, kinds


def test_emitter_rendered_output():
    """Emitter-grade rendering (failure/emitter.rs): a failing gate's repr
    contains the aligned cell-layout table, the labeled constraint, and the
    assigned cell values."""
    prover = MockProver.run(F, K, BrokenGateCircuit(7), [[7]])
    f = [x for x in prover.verify() if x.kind == "gate"][0]
    text = repr(f)
    assert "error: constraint not satisfied" in text
    assert "Cell layout in region 'bad mul'" in text
    assert "| Offset |" in text and "A0" in text and "A1" in text
    assert "applied here" in text
    assert "Constraint" in text and "= 0" in text
    assert "Assigned cell values:" in text
    assert "x0 = " in text
    # emit() returns the same block
    assert f.emit() == text
