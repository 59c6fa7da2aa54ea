"""Runtime circuit configuration parameters — the reference's
`circuit-params` feature (halo2_frontend/src/plonk/circuit.rs:247-274):
`Circuit::params()` routes configuration through `configure_with_params`,
letting one circuit type produce differently-shaped constraint systems at
runtime."""

from halo2_tpu.dev import MockProver
from halo2_tpu.fields import PASTA_FP
from halo2_tpu.frontend import Value
from halo2_tpu.frontend.expression import Rotation
from halo2_tpu.frontend.circuit import Circuit, configure_circuit
from halo2_tpu.frontend.constraint_system import ConstraintSystem

F = PASTA_FP
K = 4


class WidthCircuit(Circuit):
    """Assigns `width` advice columns; the column count is a runtime
    parameter, not a property of the type."""

    def __init__(self, width: int, value=1):
        self.width = width
        self.value = value

    def without_witnesses(self):
        return WidthCircuit(self.width, None)

    def params(self):
        return {"width": self.width}

    def configure_with_params(self, meta: ConstraintSystem, params):
        cols = [meta.advice_column() for _ in range(params["width"])]
        sel = meta.selector()

        def poly(cells):
            # sum of all columns must equal zero when enabled
            acc = None
            for c in cols:
                q = cells.query_advice(c, Rotation(0))
                acc = q if acc is None else acc + q
            return cells.query_selector(sel) * acc

        meta.create_gate("sum-zero", poly)
        return {"cols": cols, "sel": sel}

    def configure(self, meta):   # must never be called when params exist
        raise AssertionError("configure called despite params()")

    def synthesize(self, config, layouter):
        def closure(region):
            config["sel"].enable(region, 0)
            w = len(config["cols"])
            for i, c in enumerate(config["cols"][:-1]):
                region.assign_advice(c, 0, Value.known(1))
            # last column balances the sum to 0 mod p
            region.assign_advice(config["cols"][-1], 0,
                                 Value.known(F.p - (w - 1)))

        layouter.assign_region("sum", closure)


def test_params_control_shape():
    for width in (2, 4):
        cs = ConstraintSystem()
        configure_circuit(WidthCircuit(width), cs)
        assert cs.num_advice_columns == width


def test_params_mockprover_roundtrip():
    prover = MockProver.run(F, K, WidthCircuit(3), [])
    assert prover.verify() == []


def test_default_params_is_none_and_configure_used():
    class Plain(Circuit):
        def without_witnesses(self):
            return self

        def configure(self, meta):
            meta.advice_column()
            return {}

        def synthesize(self, config, layouter):
            pass

    assert Plain().params() is None
    cs = ConstraintSystem()
    configure_circuit(Plain(), cs)
    assert cs.num_advice_columns == 1
