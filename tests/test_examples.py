"""Run every example end-to-end (the reference CI runs all examples:
.github/scripts/run-examples.sh).  MockProver paths always run; the full
proof paths run for the two cheapest examples."""

import os
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")
sys.path.insert(0, EXAMPLES)


@pytest.mark.slow
def test_simple_example():
    import simple_example
    simple_example.main(k=6, prove=True)


def test_two_chip():
    import two_chip
    two_chip.main(k=6, prove=True)


def test_vector_mul():
    import vector_mul
    vector_mul.main(k=6, n=8, prove=False)


def test_proof_size():
    import proof_size
    proof_size.main(k=11)


def test_circuit_layout(tmp_path):
    import circuit_layout
    circuit_layout.main(k=5, out=str(tmp_path / "layout.png"))
    assert (tmp_path / "layout.png").stat().st_size > 0
