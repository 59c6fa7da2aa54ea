"""MockProver: run the full frontend without any crypto and check every
constraint row-by-row (halo2_frontend/src/dev.rs:290-1210).

The row checks run as batched device evaluations of each gate polynomial
over the whole matrix (reusing the backend's expression tracer) instead of
the reference's rayon per-row interpreter; lookup/shuffle/permutation checks
stay host-side (set/multiset/cycle logic on small data).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..fields.field import Field
from ..frontend.circuit import (
    Circuit, Value, NotEnoughRowsAvailable, SynthesisError,
)
from ..frontend.constraint_system import ConstraintSystem
from ..frontend.expression import ADVICE, FIXED, INSTANCE, Column, Selector
from ..plonk.evaluation import evaluate_expression


@dataclass
class VerifyFailure:
    kind: str         # gate | lookup | shuffle | permutation | instance
    detail: str

    def __repr__(self):
        return f"{self.kind}: {self.detail}"


class _MockAssignment:
    """Records the complete matrix across all phases."""

    def __init__(self, F: Field, k: int, cs: ConstraintSystem,
                 instances, phase: int, challenges):
        self.F = F
        self.n = 1 << k
        self.k = k
        self.cs = cs
        self.phase = phase
        self.challenges = challenges
        self.usable_rows = self.n - (cs.blinding_factors() + 1)
        self.instances = instances
        self.fixed = [[None] * self.n for _ in range(cs.num_fixed_columns)]
        self.advice = [[None] * self.n for _ in range(cs.num_advice_columns)]
        self.selectors = [[False] * self.n for _ in range(cs.num_selectors)]
        self.copies = []
        self.current_region = None
        self.regions = []

    def enter_region(self, name):
        self.current_region = name

    def exit_region(self):
        self.current_region = None

    def enable_selector(self, selector: Selector, row: int):
        if row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)
        self.selectors[selector.index][row] = True

    def query_instance(self, column: Column, row: int) -> Value:
        col = self.instances[column.index]
        if row < len(col):
            return Value.known(col[row])
        if row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)
        return Value.known(0)

    def assign_advice(self, column: Column, row: int, value: Value):
        if row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)
        if column.phase != self.phase:
            return
        if value.is_known():
            self.advice[column.index][row] = value.value() % self.F.p

    def assign_fixed(self, column: Column, row: int, value: Value):
        if row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)
        if value.is_known():
            self.fixed[column.index][row] = value.value() % self.F.p

    def copy(self, lcol, lrow, rcol, rrow):
        if lrow >= self.usable_rows or rrow >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)
        self.copies.append(((lcol, lrow), (rcol, rrow)))

    def get_challenge(self, challenge) -> Value:
        if challenge.index in self.challenges:
            return Value.known(self.challenges[challenge.index])
        return Value.unknown()


class MockProver:
    """dev.rs:612-749 equivalent."""

    def __init__(self, F: Field, k: int, cs: ConstraintSystem, fixed, advice,
                 selectors, copies, instances, challenges, usable_rows):
        self.F = F
        self.k = k
        self.n = 1 << k
        self.cs = cs
        self.fixed = fixed
        self.advice = advice
        self.selectors = selectors
        self.copies = copies
        self.instances = instances
        self.challenges = challenges
        self.usable_rows = usable_rows

    @staticmethod
    def run(F: Field, k: int, circuit: Circuit,
            instances: List[List[int]]) -> "MockProver":
        cs = ConstraintSystem()
        config = circuit.configure(cs)
        n = 1 << k
        if n < cs.minimum_rows():
            raise NotEnoughRowsAvailable(k)
        if len(instances) != cs.num_instance_columns:
            raise SynthesisError("invalid number of instance columns")

        # deterministic hash-chain challenges (dev.rs:686-694)
        challenges = {}
        seed = hashlib.blake2b(b"halo2_tpu-mockprover").digest()
        for idx in range(cs.num_challenges):
            seed = hashlib.blake2b(seed).digest()
            challenges[idx] = int.from_bytes(seed, "little") % F.p

        fixed = advice = selectors = copies = None
        usable = None
        for phase in cs.phases():
            sink = _MockAssignment(F, k, cs, instances, phase, challenges)
            if advice is not None:
                sink.advice = advice     # accumulate earlier phases
            circuit.floor_planner.synthesize(
                sink, circuit, config, cs.constants)
            fixed, advice = sink.fixed, sink.advice
            selectors, copies = sink.selectors, sink.copies
            usable = sink.usable_rows

        return MockProver(F, k, cs, fixed, advice, selectors, copies,
                          instances, challenges, usable)

    # ------------------------------------------------------------------

    def _matrices(self):
        F, n = self.F, self.n

        def enc(cols, width):
            if not cols:
                return F.zeros((0, n))
            rows = [[(v or 0) for v in col] for col in cols]
            flat = [v for col in rows for v in col]
            return F.encode_ints(flat).reshape(len(cols), n, -1)

        fixed = enc(self.fixed, n)
        advice = enc(self.advice, n)
        inst_cols = []
        for col in self.instances:
            full = list(col) + [0] * (n - len(col))
            inst_cols.append(full)
        instance = enc(inst_cols, n) if inst_cols else F.zeros((0, n))
        selectors = enc([[1 if b else 0 for b in s] for s in self.selectors],
                        n) if self.selectors else None
        challenges = {i: F.encode_int(v) for i, v in self.challenges.items()}
        return fixed, advice, instance, selectors, challenges

    def verify(self) -> List[VerifyFailure]:
        F = self.F
        failures: List[VerifyFailure] = []
        fixed, advice, instance, selectors, challenges = self._matrices()
        usable = self.usable_rows

        # gates: every row in the usable region
        for gate in self.cs.gates:
            for cname, poly in zip(gate.constraint_names, gate.polys):
                vals = evaluate_expression(
                    F, poly, fixed=fixed, advice=advice, instance=instance,
                    challenges=challenges, selectors=selectors)
                nonzero = ~F.is_zero(vals[:usable])
                if bool(jnp.any(nonzero)):
                    rows = np.nonzero(np.asarray(nonzero))[0][:5]
                    failures.append(VerifyFailure(
                        "gate",
                        f"constraint '{gate.name}::{cname}' not satisfied "
                        f"at rows {list(map(int, rows))}"))

        # lookups: each input row value must appear in the table multiset
        for lk in self.cs.lookups:
            inputs = [self._eval_host(e) for e in lk.input_expressions]
            tables = [self._eval_host(e) for e in lk.table_expressions]
            table_set = set(zip(*[t[:usable] for t in tables])) if tables else set()
            for row in range(usable):
                tup = tuple(col[row] for col in inputs)
                if tup not in table_set:
                    failures.append(VerifyFailure(
                        "lookup",
                        f"lookup '{lk.name}' input {tup} at row {row} "
                        f"not in table"))
                    break

        # shuffles: multiset equality over usable rows
        for sh in self.cs.shuffles:
            inputs = [self._eval_host(e) for e in sh.input_expressions]
            shuf = [self._eval_host(e) for e in sh.shuffle_expressions]
            a = sorted(zip(*[c[:usable] for c in inputs])) if inputs else []
            b = sorted(zip(*[c[:usable] for c in shuf])) if shuf else []
            if a != b:
                failures.append(VerifyFailure(
                    "shuffle", f"shuffle '{sh.name}' multisets differ"))

        # permutation: all cells in a copy-cycle carry equal values
        for (lcol, lrow), (rcol, rrow) in self.copies:
            lv = self._cell_value(lcol, lrow)
            rv = self._cell_value(rcol, rrow)
            if lv != rv:
                failures.append(VerifyFailure(
                    "permutation",
                    f"copy constraint {lcol}@{lrow} ({lv}) != "
                    f"{rcol}@{rrow} ({rv})"))

        return failures

    def _eval_host(self, expr):
        """Evaluate an expression over all rows; returns list of ints."""
        fixed, advice, instance, selectors, challenges = self._matrices()
        vals = evaluate_expression(
            self.F, expr, fixed=fixed, advice=advice, instance=instance,
            challenges=challenges, selectors=selectors)
        return self.F.decode_ints(vals)

    def _cell_value(self, col: Column, row: int) -> int:
        if col.kind == ADVICE:
            return self.advice[col.index][row] or 0
        if col.kind == FIXED:
            return self.fixed[col.index][row] or 0
        inst = self.instances[col.index]
        return inst[row] if row < len(inst) else 0

    def assert_satisfied(self):
        failures = self.verify()
        if failures:
            raise AssertionError(
                "circuit not satisfied:\n" +
                "\n".join(f"  {f}" for f in failures))
