"""Test configuration: force CPU backend with 8 virtual devices and float64.

Parity tests against the float64 reference require x64; multi-chip sharding
tests use the virtual CPU mesh (the driver separately dry-runs the multichip
path the same way).  Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override (env may pin a TPU backend)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms="axon,cpu" via config.update,
# which beats the env var -- override it back so tests run on the virtual
# CPU mesh regardless of the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the fused-correction validation programs take
# ~30 s each to compile on XLA:CPU; repeat runs hit the cache (same dir as
# bench.py -- keys differ by backend/flags, so entries never collide).
import sys as _sys  # noqa: E402

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from misti_tpu.config import cache_dir_for  # noqa: E402

# NB: the dir is salted with the host-CPU fingerprint -- XLA:CPU AOT
# executables embed machine features that jax's cache key omits, and
# loading one cached on a different host segfaults (see config.py).
if os.environ.get("MISTI_TEST_CACHE", "1") != "0":
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir_for("cpu"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXDIR


def load_fixture(name):
    path = os.path.join(FIXDIR, name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} not generated (run tests/fixtures/generate_fixtures.py)")
    return np.load(path, allow_pickle=False)
