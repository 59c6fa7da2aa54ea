"""Typed run configuration (SURVEY §5.6).

The reference's "flag system" is Cargo features plus generic instantiation
(scheme/multiopen/transcript chosen by type parameters,
book/src/user/experimental-features.md:20-34).  The TPU build mirrors that
as one typed config object resolving to concrete classes, so callers write

    cfg = ProofConfig(curve="vesta", scheme="ipa", transcript="blake2b",
                      k=11, mesh_devices=8)
    pk = cfg.keygen(circuit)
    proof = cfg.prove(pk, [circuit], [instances], rng)
    ok = cfg.verify(pk.vk, proof, [instances])

Environment knobs (debug tiers, cache dirs) remain env vars:
  HALO2_TPU_SANITY=1        in-prover invariant asserts (sanity-checks)
  HALO2_TPU_HOST_LOOKUP=1   host-side permute_expression_pair cross-path
  HALO2_TPU_NO_PALLAS=1     pure-jnp field/EC kernels
  HALO2_TPU_CACHE=dir       params/XLA cache root
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

_CURVES = ("pallas", "vesta", "bn254")
_SCHEMES = ("ipa", "kzg-gwc", "kzg-shplonk")
_TRANSCRIPTS = ("blake2b", "keccak256")


@dataclass
class ProofConfig:
    """curve + commitment scheme + multiopen + transcript + k + mesh."""
    k: int
    curve: str = "bn254"
    scheme: str = "kzg-shplonk"
    transcript: str = "blake2b"
    mesh_devices: Optional[int] = None   # None = single chip
    compress_selectors: bool = True

    def __post_init__(self):
        if self.curve not in _CURVES:
            raise ValueError(f"curve must be one of {_CURVES}")
        if self.scheme not in _SCHEMES:
            raise ValueError(f"scheme must be one of {_SCHEMES}")
        if self.transcript not in _TRANSCRIPTS:
            raise ValueError(f"transcript must be one of {_TRANSCRIPTS}")
        if self.scheme.startswith("kzg") and self.curve != "bn254":
            raise ValueError("KZG requires the pairing curve bn254")
        if self.scheme == "ipa" and self.curve == "bn254":
            raise ValueError("IPA params require a hash-to-curve suite "
                             "(pallas/vesta)")

    # -- resolution ------------------------------------------------------

    @property
    def F(self):
        from .fields import BN254_FR, PASTA_FP, PASTA_FQ
        return {"pallas": PASTA_FQ, "vesta": PASTA_FP,
                "bn254": BN254_FR}[self.curve]

    @property
    def curve_obj(self):
        from .curves import BN254_G1, PALLAS, VESTA
        return {"pallas": PALLAS, "vesta": VESTA,
                "bn254": BN254_G1}[self.curve]

    def params(self):
        if self.scheme == "ipa":
            from .commit import ParamsIPA
            return ParamsIPA.new(self.curve_obj, self.k)
        from .commit import ParamsKZG
        return ParamsKZG.new(self.k)

    def _classes(self):
        from . import commit
        from . import transcript as tr
        writer, reader = {
            "blake2b": (tr.Blake2bWrite, tr.Blake2bRead),
            "keccak256": (tr.Keccak256Write, tr.Keccak256Read),
        }[self.transcript]
        prover, verifier, strategy = {
            "ipa": (commit.ProverIPA, commit.VerifierIPA,
                    commit.SingleStrategyIPA),
            "kzg-gwc": (commit.ProverGWC, commit.VerifierGWC,
                        commit.SingleStrategyKZG),
            "kzg-shplonk": (commit.ProverSHPLONK, commit.VerifierSHPLONK,
                            commit.SingleStrategyKZG),
        }[self.scheme]
        return writer, reader, prover, verifier, strategy

    def engine(self):
        if self.mesh_devices is None:
            return None
        from .dist import make_mesh
        from .engine import PlonkEngineConfig, TpuMsmEngine
        mesh = make_mesh(self.mesh_devices)
        return PlonkEngineConfig.set_msm(TpuMsmEngine(mesh=mesh), mesh=mesh)

    # -- drivers ---------------------------------------------------------

    def keygen(self, circuit, params=None):
        from .api import keygen
        return keygen(self.F, params or self.params(), self.k, circuit,
                      compress_selectors=self.compress_selectors,
                      engine=self.engine())

    def prove(self, pk, circuits, instances, rng=None, params=None,
              timings=None) -> bytes:
        from .api import create_proof
        writer, _r, prover, _v, _s = self._classes()
        return create_proof(params or self.params(), pk, circuits, instances,
                            rng, transcript_cls=writer,
                            multiopen_prover_cls=prover,
                            engine=self.engine(), timings=timings)

    def verify(self, vk, proof: bytes, instances, params=None) -> bool:
        from .api import verify
        _w, reader, _p, verifier, strategy = self._classes()
        return verify(params or self.params(), vk, proof, instances,
                      transcript_cls=reader,
                      multiopen_verifier_cls=verifier,
                      strategy_cls=strategy)
