"""Worker for the two-process jax.distributed test (test_distributed.py).

Each process initialises the distributed runtime through
misti_tpu.dist.mesh.init_distributed (the pathway MiSTI's multi-host sweeps
use), builds the global 1-D replicate mesh, and evaluates a sharded
llh_batch whose input is split over BOTH processes' devices.  The replicated
output is written per-process; the parent test asserts the two processes
agree with each other and with a single-process evaluation.

Usage: python _dist_worker.py <coordinator> <num_processes> <process_id> <out.npz>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_workload():
    from misti_tpu.engine.likelihood import build_likelihood
    from misti_tpu.engine.spec import build_spec

    numT = 10
    split_t = 5
    rng = np.random.default_rng(7)
    grid = 0.01 * (1.25 ** np.arange(numT)) - 0.01
    times = list(np.diff(grid))
    tt = np.cumsum([0.0] + times)
    lams = np.stack(
        [1.0 + 0.3 * np.sin(tt * 5.0), 1.1 + 0.2 * np.cos(tt * 4.0)], axis=1
    )
    sfs = [0.0, *rng.integers(200, 6000, size=7).astype(float)]
    spec = build_spec(
        times, [list(v) for v in lams], sfs, split_t,
        [[1, 2, split_t, 0.3, 1]], [], unfolded=True, cpfit=True, smooth=False,
    )
    return build_likelihood(spec, correction_mode="scan-jacobi")


def sweep_inputs():
    """Deterministic toy sweep scenario shared by the worker and the
    single-process comparison in the parent test."""
    numT = 10
    grid = 0.01 * (1.25 ** np.arange(numT)) - 0.01
    times = list(np.diff(grid))
    tt = np.cumsum([0.0] + times)
    lams = [
        [1.0 + 0.3 * float(np.sin(t * 5.0)), 1.1 + 0.2 * float(np.cos(t * 4.0))]
        for t in tt
    ]
    rng = np.random.default_rng(3)
    base = np.array([3000.0, 800, 2900, 1500, 1200, 850, 1250])
    data = np.stack([base * rng.uniform(0.9, 1.1, size=7) for _ in range(4)])
    return times, lams, data


def run_sweep(mesh):
    """The whole test.bs workflow over the given mesh: fused grid, lockstep
    Nelder-Mead, multi-stage straggler compaction (the configuration a real
    multi-host v5e sweep runs, reference test.bs/han_fre.bs.sh:29-37)."""
    from misti_tpu.engine.bootstrap import sweep

    times, lams, data = sweep_inputs()
    return sweep(times, lams, data, [4, 6], [[1, 0, "ST", 0.25, 1]], (),
                 tol=1e-4, cpfit=True, smooth=False, unfolded=True,
                 stage_caps=(4, 8), mesh=mesh)


def main() -> int:
    coordinator, n_proc, pid, out = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "llh"
    from misti_tpu.dist.mesh import REPLICATE_AXIS, init_distributed, make_mesh

    init_distributed(coordinator, n_proc, pid)
    assert jax.process_count() == n_proc, jax.process_count()
    mesh = make_mesh()  # global: n_proc x 2 virtual CPU devices
    assert mesh.devices.size == 2 * n_proc, mesh.devices.size

    if mode == "sweep":
        res = run_sweep(mesh)
        np.savez(out, llh=res.llh, params=res.params, nfev=res.nfev,
                 n_devices=mesh.devices.size,
                 process_count=jax.process_count())
        jax.distributed.shutdown()
        return 0

    lik = build_workload()
    params = np.linspace(0.05, 0.9, 8)[:, None]
    # the input batch is global: each process materialises only the shards
    # its local devices own (the multi-host data-feeding pattern)
    in_sharding = NamedSharding(mesh, P(REPLICATE_AXIS, None))
    garr = jax.make_array_from_callback(
        params.shape, in_sharding, lambda idx: params[idx]
    )
    fn = jax.jit(
        jax.vmap(lik.llh),
        out_shardings=NamedSharding(mesh, P()),  # replicated: readable everywhere
    )
    with mesh:
        llh = np.asarray(fn(garr))
    np.savez(out, llh=llh, n_devices=mesh.devices.size,
             process_count=jax.process_count())
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
