"""Shared test circuits (python renderings of the reference examples)."""

from halo2_tpu.frontend import (
    Circuit, ConstraintSystem, Layouter, Rotation, Value,
)


class SimpleCircuit(Circuit):
    """simple-example.rs: c = constant * a^2 * b^2 via a mul chip with
    equality-constrained wiring and a public output."""

    def __init__(self, constant=0, a=Value.unknown(), b=Value.unknown()):
        self.constant = constant
        self.a = a if isinstance(a, Value) else Value.known(a)
        self.b = b if isinstance(b, Value) else Value.known(b)

    def without_witnesses(self):
        return SimpleCircuit(self.constant)

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


class LookupCircuit(Circuit):
    """A value column range-checked against a small fixed table via a lookup
    argument (dev_lookup.rs / lookup examples shape)."""

    TABLE_BITS = 4

    def __init__(self, values=None, n_rows=None):
        # circuit STRUCTURE (row count, selectors) must be witness-independent
        self.values = values
        self.n_rows = n_rows if n_rows is not None else len(values or [])

    def without_witnesses(self):
        return LookupCircuit(None, self.n_rows)

    def configure(self, meta: ConstraintSystem):
        value = meta.advice_column()
        table = meta.lookup_table_column()
        q = meta.complex_selector()

        def lookup_map(cells):
            qv = cells.query_selector(q)
            v = cells.query_advice(value, Rotation.cur())
            # gate the looked-up expression with the selector: rows where q=0
            # look up 0 (which is in the table)
            return [(qv * v, table)]

        meta.lookup("range", lookup_map)
        return {"value": value, "table": table, "q": q}

    def synthesize(self, config, layouter: Layouter):
        n_table = 1 << self.TABLE_BITS

        def fill_table(table):
            for i in range(n_table):
                table.assign_cell(config["table"], i, i)

        layouter.assign_table("table", fill_table)

        def fill_values(region):
            for i in range(self.n_rows):
                config["q"].enable(region, i)
                v = (Value.known(self.values[i]) if self.values is not None
                     else Value.unknown())
                region.assign_advice(config["value"], i, v)

        layouter.assign_region("values", fill_values)


class ShuffleCircuit(Circuit):
    """Two advice columns constrained to be permutations of each other
    (shuffle_api.rs shape)."""

    def __init__(self, original=None, shuffled=None, n_rows=None):
        self.original = original
        self.shuffled = shuffled
        self.n_rows = n_rows if n_rows is not None else len(original or [])

    def without_witnesses(self):
        return ShuffleCircuit(None, None, self.n_rows)

    def configure(self, meta: ConstraintSystem):
        a = meta.advice_column()
        b = meta.advice_column()
        s = meta.complex_selector()

        def shuffle_map(cells):
            sv = cells.query_selector(s)
            av = cells.query_advice(a, Rotation.cur())
            bv = cells.query_advice(b, Rotation.cur())
            return [(sv * av, sv * bv)]

        meta.shuffle("shuffle", shuffle_map)
        return {"a": a, "b": b, "s": s}

    def synthesize(self, config, layouter: Layouter):
        def fill(region):
            for i in range(self.n_rows):
                config["s"].enable(region, i)
                x = (Value.known(self.original[i]) if self.original is not None
                     else Value.unknown())
                y = (Value.known(self.shuffled[i]) if self.shuffled is not None
                     else Value.unknown())
                region.assign_advice(config["a"], i, x)
                region.assign_advice(config["b"], i, y)

        layouter.assign_region("rows", fill)


class PhaseCircuit(Circuit):
    """Two-phase circuit with a challenge: phase-2 column must equal
    phase-1 column times the challenge (multi-phase plumbing test)."""

    def __init__(self, values=None, n_rows=None):
        self.values = values
        self.n_rows = n_rows if n_rows is not None else len(values or [])

    def without_witnesses(self):
        return PhaseCircuit(None, self.n_rows)

    def configure(self, meta: ConstraintSystem):
        a = meta.advice_column_in(0)
        theta = meta.challenge_usable_after(0)
        b = meta.advice_column_in(1)
        q = meta.selector()

        def gate(cells):
            qv = cells.query_selector(q)
            av = cells.query_advice(a, Rotation.cur())
            bv = cells.query_advice(b, Rotation.cur())
            ch = cells.query_challenge(theta)
            return [qv * (bv - av * ch)]

        meta.create_gate("phase", gate)
        return {"a": a, "b": b, "q": q, "theta": theta}

    def synthesize(self, config, layouter: Layouter):
        theta = layouter.get_challenge(config["theta"])

        def fill(region):
            for i in range(self.n_rows):
                config["q"].enable(region, i)
                v = (Value.known(self.values[i]) if self.values is not None
                     else Value.unknown())
                av = region.assign_advice(config["a"], i, v)
                region.assign_advice(config["b"], i, av.value() * theta)

        layouter.assign_region("rows", fill)


class _VectorOpsBase(Circuit):
    """vector-ops-unblinded.rs: elementwise vector op with the two input
    columns unblinded, so two circuits proved independently (even on
    different hosts) produce byte-identical input-column commitments."""

    OP = None  # "mul" | "add"

    def __init__(self, a=None, b=None, n_rows=None):
        self.a = a
        self.b = b
        self.n_rows = n_rows if n_rows is not None else len(a or [])

    def without_witnesses(self):
        return type(self)(None, None, self.n_rows)

    def configure(self, meta: ConstraintSystem):
        a = meta.unblinded_advice_column()
        b = meta.unblinded_advice_column()
        out = meta.advice_column()
        instance = meta.instance_column()
        meta.enable_equality(out)
        meta.enable_equality(instance)
        q = meta.selector()

        def gate(cells):
            qv = cells.query_selector(q)
            av = cells.query_advice(a, Rotation.cur())
            bv = cells.query_advice(b, Rotation.cur())
            ov = cells.query_advice(out, Rotation.cur())
            lhs = av * bv if self.OP == "mul" else av + bv
            return [qv * (lhs - ov)]

        meta.create_gate(self.OP, gate)
        return {"a": a, "b": b, "out": out, "instance": instance, "q": q}

    def synthesize(self, config, layouter: Layouter):
        def fill(region):
            cells = []
            for i in range(self.n_rows):
                config["q"].enable(region, i)
                av = (Value.known(self.a[i]) if self.a is not None
                      else Value.unknown())
                bv = (Value.known(self.b[i]) if self.b is not None
                      else Value.unknown())
                ac = region.assign_advice(config["a"], i, av)
                bc = region.assign_advice(config["b"], i, bv)
                o = (ac.value() * bc.value() if self.OP == "mul"
                     else ac.value() + bc.value())
                cells.append(region.assign_advice(config["out"], i, o))
            return cells

        out_cells = layouter.assign_region("rows", fill)
        for i, cell in enumerate(out_cells):
            layouter.constrain_instance(cell.cell, config["instance"], i)


class UnblindedMulCircuit(_VectorOpsBase):
    OP = "mul"


class UnblindedAddCircuit(_VectorOpsBase):
    OP = "add"
