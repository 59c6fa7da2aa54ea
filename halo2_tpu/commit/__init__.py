from .base import Blind, PolyRef, ProverQuery, VerifierQuery, new_rng
from .ipa import (
    ParamsIPA, MSMIPA, GuardIPA, create_opening_proof, verify_opening_proof,
    SingleStrategyIPA, AccumulatorStrategyIPA,
)
from .ipa_multiopen import ProverIPA, VerifierIPA
from .kzg import (
    ParamsKZG, MSMKZG, PreMSM, DualMSM, GuardKZG, SingleStrategyKZG,
    AccumulatorStrategyKZG,
)
from .gwc import ProverGWC, VerifierGWC
from .shplonk import ProverSHPLONK, VerifierSHPLONK

__all__ = [
    "ParamsKZG", "MSMKZG", "PreMSM", "DualMSM", "GuardKZG", "SingleStrategyKZG",
    "AccumulatorStrategyKZG", "ProverGWC", "VerifierGWC",
    "ProverSHPLONK", "VerifierSHPLONK",
    "Blind", "PolyRef", "ProverQuery", "VerifierQuery", "new_rng",
    "ParamsIPA", "MSMIPA", "GuardIPA",
    "create_opening_proof", "verify_opening_proof",
    "SingleStrategyIPA", "AccumulatorStrategyIPA",
    "ProverIPA", "VerifierIPA",
]
