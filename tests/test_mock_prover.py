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
