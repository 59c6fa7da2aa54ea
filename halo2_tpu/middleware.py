"""The frontend↔backend contract — the halo2_middleware analog.

The reference deliberately keeps this layer tiny (865 LoC): one struct of
circuit metadata (`ConstraintSystemMid`, halo2_middleware/src/circuit.rs:
103-137), the preprocessed fixed values + copy list (`Preprocessing`,
:141-144), and their bundle (`CompiledCircuit`, :149-152).  This module is
the same seam in TPU terms: everything the backend needs crosses here as
plain data (host lists + column metadata), which is also the natural
serialization point for shipping compiled circuits to a device pipeline.

Consensus-critical invariants owned by this layer:
  * `Any` column ordering Instance < Advice < Fixed
    (circuit.rs:175-192) — `halo2_tpu.frontend.expression._KIND_ORDER`.
  * Expressions reaching the backend contain no Selector nodes
    (expression.rs:471 `unreachable!`); selector compression happens in
    `compile_circuit` before the contract is formed.
  * The ZAL acceleration seam (`zal.rs:57-243`) is `halo2_tpu.engine`
    (`PlonkEngine` / `TpuMsmEngine` descriptor caching).
  * The reference's `multicore` rayon re-exports map to `halo2_tpu.dist`
    (mesh + collectives) — SURVEY §5.8.
"""

from .frontend.circuit import CompiledCircuit, Preprocessing, compile_circuit
from .frontend.constraint_system import (
    ConstraintSystem, LookupArgument, PermutationArgument, ShuffleArgument,
)
from .frontend.expression import (
    ADVICE, FIXED, INSTANCE, Challenge, Column, Expression, Rotation,
)
from .engine import (
    H2cEngine, PlonkEngine, PlonkEngineConfig, TpuMsmEngine,
)

__all__ = [
    "CompiledCircuit", "Preprocessing", "compile_circuit",
    "ConstraintSystem", "LookupArgument", "PermutationArgument",
    "ShuffleArgument",
    "ADVICE", "FIXED", "INSTANCE", "Challenge", "Column", "Expression",
    "Rotation",
    "H2cEngine", "PlonkEngine", "PlonkEngineConfig", "TpuMsmEngine",
]
