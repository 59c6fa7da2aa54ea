"""AOT trace cache: skip JAX tracing of the big kernels in fresh processes.

The heavy programs here (cached-MSM ~25MB of MLIR, fused NTT, the h-pass
evaluator) cost 100-600 s of HOST-side tracing + lowering per process —
the XLA compile itself is ~30 s and the persistent compilation cache
already covers it, but a cache hit still pays the full trace (JAX must
lower to compute the cache key).  `jax.export` closes that gap: the traced
StableHLO artifact is serialized to disk once, and later processes
deserialize (~0.1 s) and compile — and because the artifact bytes are
fixed, the persistent-compile-cache key is stable, so the compile is a hit
too.  Measured on the k=18 cached MSM: 243 s trace+export once, then 0.1 s
deserialize + 5.4 s cached compile in every fresh process.

Keyed by (function name, static-arg repr, arg shapes/dtypes, platform,
jax version, SOURCE TREE HASH) — any edit to halo2_tpu/*.py invalidates
every artifact, so stale kernels can never serve wrong results.

The reference has no analog (a compiled Rust binary IS its AOT cache);
this is the TPU-native replacement for "the binary remembers".
"""

from __future__ import annotations

import functools
import hashlib
import logging
import os
import threading

import jax

_LOCK = threading.Lock()
_SOURCE_HASH = None
_LOG = logging.getLogger(__name__)


def trace_state_clean() -> bool:
    """True when NOT inside an ambient jax trace (jit/shard_map/vmap).
    Wraps the private jax API; on API drift assume a clean state (callers
    then use their plain-jit path, which is always correct)."""
    try:
        from jax._src import core as _core
        return bool(_core.trace_state_clean())
    except Exception:
        return True


def _source_hash() -> str:
    """Content hash of every .py file in the package (computed once)."""
    global _SOURCE_HASH
    if _SOURCE_HASH is None:
        h = hashlib.sha256()
        root = os.path.dirname(os.path.abspath(__file__))
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    h.update(p.encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
        _SOURCE_HASH = h.hexdigest()[:16]
    return _SOURCE_HASH


def _cache_dir() -> str:
    d = os.path.join(
        os.environ.get("HALO2_TPU_CACHE",
                       os.path.expanduser("~/.cache/halo2_tpu")), "aot")
    os.makedirs(d, exist_ok=True)
    return d


def enabled() -> bool:
    return os.environ.get("HALO2_TPU_NO_AOT") != "1"


class AotFunction:
    """Wraps a jax.jit'd function with an on-disk exported-artifact cache.

    __call__ dispatches by the dynamic args' (shape, dtype) signature:
      - artifact on disk -> deserialize once, jit(exp.call) (compile hits
        the persistent cache), run;
      - else -> run the underlying jit AND export+save the artifact in the
        background of the same call (the trace is already paid).
    Falls back to the plain jit when called inside an ambient trace (e.g.
    under shard_map/vmap in the dist paths) or when disabled by env.
    """

    def __init__(self, fn, name: str, salt: str = ""):
        self._fn = fn            # a jax.jit'd callable over dynamic args
        self._name = name
        self._salt = salt
        self._loaded = {}        # sig key -> jitted exp.call

    def _key(self, args) -> str:
        leaves, treedef = jax.tree_util.tree_flatten(args)
        sig = ";".join(f"{tuple(a.shape)}:{a.dtype}" for a in leaves)
        raw = "|".join([self._name, self._salt, sig, str(treedef),
                        jax.__version__, jax.default_backend(),
                        _source_hash()])
        return hashlib.sha256(raw.encode()).hexdigest()[:24]

    def __call__(self, *args):
        if not enabled() or not trace_state_clean():
            return self._fn(*args)
        try:
            key = self._key(args)
        except Exception:
            # non-array leaf (no .shape) — not an exportable signature
            return self._fn(*args)
        cached = self._loaded.get(key)
        if cached is not None:
            return cached(*args)
        path = os.path.join(_cache_dir(),
                            f"{self._name.replace('/', '_')}-{key}.jexp")
        from jax import export as jexport
        try:
            if os.path.exists(path):
                with open(path, "rb") as f:
                    exp = jexport.deserialize(f.read())
                call = jax.jit(exp.call)
                self._loaded[key] = call
                return call(*args)
            # export FIRST and call through the exported module: one trace
            # total (export traces+lowers; jit(exp.call) only compiles)
            structs = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), args)
            exp = jexport.export(self._fn)(*structs)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(exp.serialize())
            os.replace(tmp, path)
            call = jax.jit(exp.call)
            self._loaded[key] = call
            return call(*args)
        except Exception as e:
            # AOT is an optimization only — but a systematic failure
            # (unsupported primitive, read-only cache dir) reverting every
            # fresh process to minutes of tracing deserves a diagnostic
            _LOG.warning("AOT export/load disabled for %s (%s: %s)",
                         self._name, type(e).__name__, e)
            self._loaded[key] = self._fn
            return self._fn(*args)


def aot(fn, name: str, salt: str = "") -> AotFunction:
    return AotFunction(fn, name, salt)


@functools.lru_cache(maxsize=None)
def _cached_aot(fn, name: str, salt: str) -> AotFunction:
    return AotFunction(fn, name, salt)


def aot_for(fn, name: str, salt: str = "") -> AotFunction:
    """Memoized AotFunction (fn must be hashable, e.g. a jax.jit object)."""
    return _cached_aot(fn, name, salt)
