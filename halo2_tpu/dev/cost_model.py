"""Circuit cost measurement + proof-size/verification cost model.

Mirrors halo2_frontend/src/dev/cost.rs (CircuitCost :27-90) and
dev/cost_model.rs (CostOptions/ModelCircuit :16-242, "cost-estimator"
feature): derives column/query/argument counts from a configured circuit and
computes marginal/total proof sizes per commitment scheme.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, asdict
from typing import Optional

from ..frontend.circuit import Circuit, configure_circuit
from ..frontend.constraint_system import ConstraintSystem

COMMITMENT_SCHEMES = ("ipa", "kzg-gwc", "kzg-shplonk")


@dataclass
class CircuitCost:
    """Structural counts for a circuit at size 2^k."""
    k: int
    max_degree: int
    advice_columns: int
    fixed_columns: int
    instance_columns: int
    selectors: int
    gates: int
    gate_constraints: int
    lookups: int
    shuffles: int
    permutation_columns: int
    advice_queries: int
    fixed_queries: int
    instance_queries: int
    blinding_factors: int
    minimum_rows: int

    @staticmethod
    def measure(k: int, circuit: Circuit) -> "CircuitCost":
        cs = ConstraintSystem()
        configure_circuit(circuit, cs)
        return CircuitCost(
            k=k,
            max_degree=cs.degree(),
            advice_columns=cs.num_advice_columns,
            fixed_columns=cs.num_fixed_columns,
            instance_columns=cs.num_instance_columns,
            selectors=cs.num_selectors,
            gates=len(cs.gates),
            gate_constraints=sum(len(g.polys) for g in cs.gates),
            lookups=len(cs.lookups),
            shuffles=len(cs.shuffles),
            permutation_columns=len(cs.permutation.columns),
            advice_queries=len(cs.advice_queries),
            fixed_queries=len(cs.fixed_queries),
            instance_queries=len(cs.instance_queries),
            blinding_factors=cs.blinding_factors(),
            minimum_rows=cs.minimum_rows(),
        )

    # -- proof size model (dev/cost_model.rs:128-242) --------------------

    def proof_size(self, scheme: str = "ipa", num_instances: int = 1) -> int:
        """Estimated proof bytes (32-byte points/scalars)."""
        assert scheme in COMMITMENT_SCHEMES
        point = scalar = 32
        chunk_len = max(self.max_degree - 2, 1)
        perm_sets = -(-self.permutation_columns // chunk_len) \
            if self.permutation_columns else 0
        quotient_pieces = max(self.max_degree - 1, 1)

        size = 0
        # advice commitments + lookup (2 perm + 1 product) + shuffle products
        size += self.advice_columns * point
        size += self.lookups * 3 * point
        size += self.shuffles * point
        size += perm_sets * point
        size += point              # vanishing random poly
        size += quotient_pieces * point
        # evals
        size += self.advice_queries * scalar
        size += self.fixed_queries * scalar
        size += scalar             # random eval
        size += self.permutation_columns * scalar     # sigma evals
        size += (perm_sets * 2 + max(perm_sets - 1, 0)) * scalar
        size += self.lookups * 5 * scalar
        size += self.shuffles * 2 * scalar
        if scheme == "ipa":
            size += self.instance_queries * scalar
            # multiopen: q' commit + per-set evals + S + 2k L/R + c + f
            size += point + 2 * scalar
            size += point          # s_poly
            size += 2 * self.k * point
            size += 2 * scalar
        elif scheme == "kzg-gwc":
            # one witness commitment per distinct opening point (~3-5)
            size += 5 * point
        else:  # shplonk
            size += 2 * point
        return size

    def to_json(self, scheme: str = "ipa") -> str:
        d = asdict(self)
        d["proof_size"] = {s: self.proof_size(s) for s in COMMITMENT_SCHEMES}
        return json.dumps(d, indent=2)


def from_circuit_to_model_circuit(k: int, circuit: Circuit,
                                  scheme: str = "ipa") -> dict:
    """cost_model.rs:244 equivalent: structured dict for tooling."""
    cost = CircuitCost.measure(k, circuit)
    d = asdict(cost)
    d["scheme"] = scheme
    d["estimated_proof_size"] = cost.proof_size(scheme)
    return d
