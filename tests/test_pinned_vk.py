"""Byte-compatibility anchor: the reference's golden pinned-vk string.

The reference pins `format!("{:#?}", pk.get_vk().pinned())` for the
plonk_api circuit at K=5 on IPA/Vesta (plonk_api.rs:659-1141).  The string
is imported verbatim (tests/fixtures/, via tools/extract_fixtures.py) as a
test vector.  Structural equality (everything except commitment point
values) validates the frontend compile + backend query indexing + Debug
renderer; full equality additionally validates hash_to_curve params, MSM,
and field/curve arithmetic end to end.
"""

import os
import re

import pytest

from halo2_tpu.fields.constants import PASTA_FP
from halo2_tpu.curves.constants import VESTA
from halo2_tpu.compat.plonk_api import plonk_api_instance
from halo2_tpu.api import keygen
from halo2_tpu.commit.ipa import ParamsIPA

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "plonk_api_pinned_vk_ipa_vesta_k5.txt")

_POINT_RE = re.compile(r"\(0x[0-9a-f]{64}, 0x[0-9a-f]{64}\)")

K = 5


def _mask_points(s: str) -> str:
    return _POINT_RE.sub("(PT)", s)


@pytest.fixture(scope="module")
def pinned():
    circuit, _instances = plonk_api_instance(PASTA_FP)
    params = ParamsIPA.new(VESTA, K)
    pk = keygen(PASTA_FP, params, K, circuit)
    return pk.vk.pinned()


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURE) as f:
        return f.read()


def test_pinned_structure_matches_reference(pinned, golden):
    """Everything except commitment values must match byte-for-byte."""
    ours, ref = _mask_points(pinned), _mask_points(golden)
    if ours != ref:
        # produce a focused diff for debugging
        for i, (a, b) in enumerate(zip(ours.splitlines(), ref.splitlines())):
            assert a == b, f"line {i}:\n  ours: {a!r}\n  ref:  {b!r}"
        assert len(ours.splitlines()) == len(ref.splitlines()), (
            len(ours.splitlines()), len(ref.splitlines()))
    assert ours == ref


def test_pinned_full_byte_equality(pinned, golden):
    """The keystone byte-compat assert: our frontend compile + keygen +
    hash_to_curve params + MSM + point-NTT + Debug renderer reproduce the
    reference's 18KB golden string including all 19 commitment points."""
    assert pinned == golden
