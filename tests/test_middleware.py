"""The serializable frontend<->backend contract
(halo2_middleware/src/circuit.rs:103-152): a compiled circuit must lower
to a distinct `CompiledCircuitMid` value, survive a JSON round-trip, and
produce an IDENTICAL verifying key when keygen runs from the deserialized
form — the "ship the compiled matrix to the proving pipeline" seam."""

import pytest

from halo2_tpu.commit import ParamsIPA
from halo2_tpu.curves import VESTA
from halo2_tpu.fields import PASTA_FP
from halo2_tpu.frontend import Value
from halo2_tpu.frontend.circuit import compile_circuit
from halo2_tpu.middleware import (
    CompiledCircuitMid, ConstraintSystemMid, compiled_to_mid, expr_from_obj,
    expr_to_obj,
)
from halo2_tpu.plonk.keygen import keygen as backend_keygen

from circuits import SimpleCircuit

F = PASTA_FP
K = 5


def _compiled():
    circuit = SimpleCircuit(7, Value.known(2), Value.known(3))
    compiled, _config, _cs = compile_circuit(F, K, circuit)
    return compiled


def test_expression_obj_roundtrip():
    compiled = _compiled()
    for gate in compiled.cs.gates:
        for poly in gate.polys:
            obj = expr_to_obj(poly)
            back = expr_from_obj(obj)
            assert back.identifier() == poly.identifier()
            assert back.degree() == poly.degree()


def test_selector_rejected():
    from halo2_tpu.frontend.expression import Expression, Selector
    with pytest.raises(ValueError):
        expr_to_obj(Expression.selector(Selector(0)))


def test_json_roundtrip_and_keygen_identical():
    compiled = _compiled()
    mid = compiled_to_mid(compiled)
    blob = mid.to_json()
    mid2 = CompiledCircuitMid.from_json(blob)
    # structural equality of the contract
    assert mid2.cs.to_obj() == mid.cs.to_obj()
    assert mid2.preprocessing.to_obj() == mid.preprocessing.to_obj()

    params = ParamsIPA.new(VESTA, K)
    pk_direct = backend_keygen(F, params, compiled, K)
    pk_shipped = backend_keygen(F, params, mid2.to_compiled_circuit(), K)
    assert (pk_shipped.vk.transcript_repr == pk_direct.vk.transcript_repr)
    assert pk_shipped.vk.pinned() == pk_direct.vk.pinned()
