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
