"""AOT artifact cache (aot.py): the deserialize-in-a-fresh-process path is
the whole point of the feature (round-3 ADVICE item 5) — cover it by
exporting in one AotFunction, dropping the in-memory handle, and reloading
the artifact from disk as a fresh process would."""

import os

import jax
import jax.numpy as jnp

from halo2_tpu import aot as aot_mod
from halo2_tpu.fields import BN254_FR as F


def test_aot_export_then_reload_bit_identical(tmp_path, monkeypatch):
    monkeypatch.setenv("HALO2_TPU_CACHE", str(tmp_path))
    import random
    rng = random.Random(5)
    a = F.encode_ints(F.rand_ints(64, rng))
    b = F.encode_ints(F.rand_ints(64, rng))
    fn = jax.jit(lambda x, y: F.mul(F.add(x, y), y))

    wrapped = aot_mod.aot(fn, "test_mul_add", salt="t1")
    out1 = wrapped(a, b)
    # exactly one artifact written
    files = [f for f in os.listdir(tmp_path / "aot")
             if f.startswith("test_mul_add-")]
    assert len(files) == 1

    # fresh AotFunction (fresh process analog): must hit the deserialize
    # branch, not re-export
    reloaded = aot_mod.aot(fn, "test_mul_add", salt="t1")
    out2 = reloaded(a, b)
    assert (jnp.asarray(out1) == jnp.asarray(out2)).all(), \
        "deserialized artifact result differs from the traced result"
    # the artifact really was loaded (not re-exported): file set unchanged
    files2 = [f for f in os.listdir(tmp_path / "aot")
              if f.startswith("test_mul_add-")]
    assert files2 == files


def test_aot_falls_back_on_nonarray_args():
    fn = jax.jit(lambda x: x + 1)
    wrapped = aot_mod.aot(fn, "test_fallback")
    # non-array leaf (python int) must fall back to the plain jit
    assert int(wrapped(3)) == 4
