from .mock_prover import MockProver, VerifyFailure

__all__ = ["MockProver", "VerifyFailure"]
