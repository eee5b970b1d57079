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

import os


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
        # bench workload, large enough to flip the optimiser's argmax
        # (scripts/tpu_accuracy_check.py).  Full-f32 MXU passes fix it, and
        # the workload is dispatch-bound, not FLOP-bound, so the extra MXU
        # passes are nearly free.
        jax.config.update("jax_default_matmul_precision", "highest")
    else:
        raise ValueError(f"unknown platform {platform!r} (use cpu|tpu|default)")
    return platform
