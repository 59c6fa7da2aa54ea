"""ProofConfig: the typed run-config surface (SURVEY §5.6)."""

import random

import pytest

from halo2_tpu.config import ProofConfig
from halo2_tpu.compat.plonk_api import plonk_api_instance


def test_invalid_combinations_rejected():
    with pytest.raises(ValueError):
        ProofConfig(k=5, curve="pallas", scheme="kzg-gwc")
    with pytest.raises(ValueError):
        ProofConfig(k=5, curve="bn254", scheme="ipa")
    with pytest.raises(ValueError):
        ProofConfig(k=5, curve="nope")


@pytest.mark.slow
def test_config_roundtrip_ipa_vesta():
    cfg = ProofConfig(k=5, curve="vesta", scheme="ipa")
    circuit, instances = plonk_api_instance(cfg.F)
    params = cfg.params()
    pk = cfg.keygen(circuit, params=params)
    proof = cfg.prove(pk, [circuit], [instances], random.Random(9),
                      params=params)
    assert cfg.verify(pk.vk, proof, [instances], params=params)


@pytest.mark.slow
def test_config_roundtrip_kzg_shplonk_keccak():
    cfg = ProofConfig(k=5, curve="bn254", scheme="kzg-shplonk",
                      transcript="keccak256")
    circuit, instances = plonk_api_instance(cfg.F)
    params = cfg.params()
    pk = cfg.keygen(circuit, params=params)
    proof = cfg.prove(pk, [circuit], [instances], random.Random(9),
                      params=params)
    assert cfg.verify(pk.vk, proof, [instances], params=params)
    bad = bytearray(proof)
    bad[40] ^= 1
    assert not cfg.verify(pk.vk, bytes(bad), [instances], params=params)
