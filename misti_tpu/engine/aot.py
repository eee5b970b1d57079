"""Persistent ahead-of-time program cache built on `jax.export`.

The persistent XLA compilation cache (config.setup_platform) removes the
COMPILE cost of warm reruns, but every new process still re-traces and
re-lowers each program shape in Python -- and for the fused sweep that is
the dominant warm cost: ~20-40 s per program shape against ~2 s of actual
device compute for a whole 808-cell grid (scripts/tpu_probe_sweep.py).
The reference has no analogue (its "programs" are Python loops); this is
TPU-native infrastructure: serialize each traced program (StableHLO via
`jax.export`) keyed by scenario + input shapes, and let later processes
deserialize in milliseconds instead of retracing.  XLA compilation of the
deserialized module still goes through the persistent compile cache, so a
warm CLI run pays neither tracing nor compilation.

Staleness: the cache key hashes the package source files that define the
traced computation, plus the jax version, backend, x64 mode, and the
caller's scenario key -- any code or scenario change misses cleanly.
"""

from __future__ import annotations

import hashlib
import os
import sys
import warnings
from typing import Callable, Optional

import jax
import numpy as np

# NamedTuples crossing the export boundary need registered serializations
from .optimize import NMResult, NMState

for _nt in (NMState, NMResult):
    try:
        jax.export.register_namedtuple_serialization(
            _nt, serialized_name=f"misti_tpu.engine.optimize.{_nt.__name__}"
        )
    except ValueError:  # already registered (module re-import)
        pass

_SRC_HASH = None


def _source_hash() -> str:
    """Hash of the package sources defining traced computations."""
    global _SRC_HASH
    if _SRC_HASH is None:
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for sub in ("engine", "kernels", "model"):
            d = os.path.join(pkg, sub)
            for fn in sorted(os.listdir(d)):
                if fn.endswith(".py"):
                    with open(os.path.join(d, fn), "rb") as f:
                        h.update(f.read())
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def default_cache_dir() -> str:
    """Anchored at the package tree (like the compile cache) -- a
    cwd-relative dir would silently miss (and re-trace) whenever the CLI
    runs from a different directory.  MISTI_AOT_DIR overrides outright;
    otherwise exports live under the (possibly MISTI_CACHE_DIR-overridden)
    compile-cache root."""
    d = os.environ.get("MISTI_AOT_DIR")
    if d:
        return d
    base = os.environ.get("MISTI_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    return os.path.join(base, "exports")


def aot_enabled() -> bool:
    """AOT policy: on for accelerator backends, explicit opt-in on CPU.

    MISTI_AOT=1 forces on, =0 forces off.  The CPU default is OFF because
    this jaxlib's XLA:CPU segfaults compiling the serialize->deserialize
    roundtrip of LARGE modules in a fresh process (reproduced: the
    27-interval scan-seq fit program crashes on deserialize+compile even
    with a fresh compilation cache, while the directly-exported module in
    the exporting process compiles fine; small modules roundtrip fine).
    The TPU compiler handles the same roundtrips correctly -- the sweep
    CLI's warm runs deserialize on the chip end-to-end."""
    v = os.environ.get("MISTI_AOT", "")
    if v == "1":
        return True
    if v == "0":
        return False
    return jax.default_backend() != "cpu"


def _abstract(x):
    """Abstract value for export -- keeps a NamedSharding if the arg has
    one, so sharded (multi-device) programs export with their layouts
    recorded and deserialize back onto the same mesh shape."""
    if isinstance(x, jax.ShapeDtypeStruct):
        return x
    a = jax.api_util.shaped_abstractify(x)
    sharding = None
    if isinstance(x, jax.Array):
        s = x.sharding
        if isinstance(s, jax.sharding.NamedSharding) and s.mesh.size > 1:
            sharding = s
    return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sharding)


def _sharding_tag(x) -> str:
    if isinstance(x, jax.Array) and isinstance(x.sharding,
                                               jax.sharding.NamedSharding):
        s = x.sharding
        return f"{tuple(s.mesh.shape.items())}|{s.spec}"
    return "-"


class CachedProgram:
    """One jitted function + scenario key; call like the jitted function.

    First call per (shapes, dtypes) signature either deserializes a
    matching export from the cache directory or traces + exports + saves.
    Any serialization failure falls back to the plain jitted function.
    """

    def __init__(self, fn: Callable, key: str,
                 cache_dir: Optional[str] = None, verbose: bool = False):
        self._jit = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)
        self._key = key
        self._dir = cache_dir or default_cache_dir()
        self._verbose = verbose
        self._compiled = {}  # signature -> callable

    def _path(self, args) -> str:
        h = hashlib.sha256()
        h.update(_source_hash().encode())
        h.update(jax.__version__.encode())
        h.update(jax.default_backend().encode())
        h.update(str(jax.config.jax_enable_x64).encode())
        h.update(str(jax.device_count()).encode())
        # knobs that select WHICH computation gets traced: without them a
        # cached program from one mode would be silently loaded when the
        # user requests another (the documented cross-validation
        # overrides, engine/likelihood.py; matmul precision is baked into
        # the exported StableHLO's dot attributes)
        h.update(os.environ.get("MISTI_SPECTRUM", "vector").encode())
        h.update(os.environ.get("MISTI_CORRECTION", "").encode())
        h.update(str(jax.config.jax_default_matmul_precision).encode())
        h.update(self._key.encode())
        for a in jax.tree_util.tree_leaves(args):
            s = _abstract(a)
            h.update(str((s.shape, str(s.dtype), _sharding_tag(a))).encode())
        return os.path.join(self._dir, h.hexdigest()[:24] + ".jaxexport")

    def __call__(self, *args):
        sig = tuple(
            (tuple(_abstract(a).shape), str(_abstract(a).dtype),
             _sharding_tag(a))
            for a in jax.tree_util.tree_leaves(args)
        )
        hit = self._compiled.get(sig)
        if hit is not None:
            return hit(*args)
        path = self._path(args)
        call = None
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    exp = jax.export.deserialize(bytearray(f.read()))
                call = jax.jit(exp.call)
                if self._verbose:
                    print(f"# aot: loaded {self._key} from {path}",
                          file=sys.stderr)
            except Exception as e:  # stale/corrupt export: retrace
                warnings.warn(f"aot cache load failed ({e}); retracing")
                call = None
        if call is None:
            try:
                exp = jax.export.export(self._jit)(
                    *jax.tree_util.tree_map(_abstract, args)
                )
                os.makedirs(self._dir, exist_ok=True)
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(exp.serialize())
                os.replace(tmp, path)
                call = jax.jit(exp.call)
                if self._verbose:
                    print(f"# aot: exported {self._key} to {path}",
                          file=sys.stderr)
            except Exception as e:
                warnings.warn(f"aot export failed ({e}); using plain jit")
                call = self._jit
        self._compiled[sig] = call
        return call(*args)


def scenario_key(*parts) -> str:
    """Stable key from arbitrary repr-able scenario data (times, lambdas,
    templates, flags ...)."""
    h = hashlib.sha256()
    for p in parts:
        if isinstance(p, np.ndarray):
            h.update(p.tobytes())
            h.update(str(p.shape).encode())
        else:
            h.update(repr(p).encode())
    return h.hexdigest()[:16]
