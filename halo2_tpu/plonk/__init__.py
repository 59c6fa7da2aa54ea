from .keygen import (
    keygen, keygen_vk, ProvingKey, VerifyingKey, ConstraintSystemBack,
    PermutationAssembly,
)
from .prover import Prover, Evaluator
from .verifier import verify_proof, verify_proof_single, VerifyError
from .evaluation import evaluate_expression
from .batch import BatchVerifier

__all__ = [
    "keygen", "keygen_vk", "ProvingKey", "VerifyingKey",
    "ConstraintSystemBack", "PermutationAssembly",
    "Prover", "Evaluator",
    "verify_proof", "verify_proof_single", "VerifyError",
    "evaluate_expression", "BatchVerifier",
]
