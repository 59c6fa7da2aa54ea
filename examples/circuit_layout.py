"""circuit-layout.rs: render the region/cell layout picture of a circuit
and print its dot graph (reference: halo2_proofs/examples/circuit-layout.rs,
"dev-graph" feature)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from halo2_tpu.dev.graph import CircuitLayout, circuit_dot_graph
from simple_example import SimpleCircuit


def main(k: int = 5, out: str = "layout.png"):
    circuit = SimpleCircuit(7)
    recorder = CircuitLayout().render(k, circuit, out)
    print(f"wrote {out}: {len(recorder.regions)} regions, "
          f"{recorder.total_rows} rows used")
    print(circuit_dot_graph(k, circuit))


if __name__ == "__main__":
    main()
