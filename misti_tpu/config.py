"""Platform/precision selection.

The reference is float64 CPU code; TPU v5e has no native f64.  Policy
(SURVEY.md section 7, decision 6):

* single-fit CLIs default to **CPU + float64** -- bit-level drop-in parity
  with the reference, and lower latency anyway for one latency-bound fit;
* the batched sweep/bootstrap drivers and benchmarks default to the
  **TPU backend + float32**, where throughput comes from vmap/sharding.

``MISTI_PLATFORM`` (cpu | tpu | default) overrides either default.
NB: the local environment's sitecustomize may pin jax_platforms to a TPU
plugin via jax.config.update, which beats env vars -- so we always call
jax.config.update ourselves.
"""

from __future__ import annotations

import hashlib
import os


def host_cpu_fingerprint() -> str:
    """Short hash of the host CPU's feature flags.

    XLA:CPU AOT executables embed machine features (+prefer-no-scatter,
    AVX level, ...); jax's persistent-cache key does NOT include them, so
    an executable cached on one host can SIGSEGV/SIGILL when loaded on
    another (observed: cpu_aot_loader machine-feature-mismatch warnings
    followed by segfaults after a container migration).  CPU-backend cache
    dirs are salted with this fingerprint; TPU executables are
    host-independent and stay shared."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform as _platform

    return hashlib.sha256(_platform.processor().encode()).hexdigest()[:10]


def cache_dir_for(backend: str) -> str:
    """Compile-cache dir for a RESOLVED jax backend name ('cpu', 'tpu',
    ...): CPU-backend entries are per-host (see host_cpu_fingerprint);
    accelerator executables are host-independent and shared."""
    base = os.environ.get("MISTI_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    if backend == "cpu":
        return os.path.join(base, f"cpu-{host_cpu_fingerprint()}")
    return base


def setup_platform(platform: str | None = None) -> str:
    """Set the jax platform + precision. Returns the chosen platform string."""
    import jax

    platform = platform or os.environ.get("MISTI_PLATFORM", "cpu")
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    elif platform in ("tpu", "default"):
        # keep whatever accelerator the environment registered; f32
        jax.config.update("jax_enable_x64", False)
        # TPU matmuls default to one-pass bf16, which scrambles the expm
        # chains: measured max |dllh| ~ 6-22 vs the f64 reference on the
        # bench workload, large enough to flip the optimiser's argmax.
        # Multi-pass matmuls fix it; MISTI_MATMUL_PRECISION picks the
        # tier.  Default "high" (3-pass bf16): measured max rel dllh
        # 1.248e-4 vs 1.211e-4 for "highest" (full f32) with f32/f64
        # argmax agreement on both surfaces -- indistinguishable accuracy
        # at +59% spectrum / +14% corrected throughput (ACCURACY.md
        # round-4 section, scripts/tpu_accuracy_check.py).
        jax.config.update(
            "jax_default_matmul_precision",
            os.environ.get("MISTI_MATMUL_PRECISION", "high"))
    else:
        raise ValueError(f"unknown platform {platform!r} (use cpu|tpu|default)")
    # persistent compilation cache: first TPU compiles go through a remote
    # tunnel and take minutes; every entry point shares one cache dir.
    # Keyed on the RESOLVED backend (after the platform config above): a
    # 'tpu'/'default' request that silently falls back to XLA:CPU must not
    # write host-feature-bearing CPU executables into the shared dir.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          cache_dir_for(jax.default_backend()))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return platform
