from .base import Blind, PolyRef, ProverQuery, VerifierQuery, new_rng
from .ipa import (
    ParamsIPA, MSMIPA, GuardIPA, create_opening_proof, verify_opening_proof,
    SingleStrategyIPA, AccumulatorStrategyIPA,
)
from .ipa_multiopen import ProverIPA, VerifierIPA

__all__ = [
    "Blind", "PolyRef", "ProverQuery", "VerifierQuery", "new_rng",
    "ParamsIPA", "MSMIPA", "GuardIPA",
    "create_opening_proof", "verify_opening_proof",
    "SingleStrategyIPA", "AccumulatorStrategyIPA",
    "ProverIPA", "VerifierIPA",
]
