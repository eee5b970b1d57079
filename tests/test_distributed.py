"""Two-process jax.distributed exercise of dist/mesh.init_distributed.

The reference has no inter-process communication at all (its scaling story
is GNU-Parallel fan-out, SURVEY.md section 2.6); the TPU build replaces that
with a jax.distributed multi-host mesh.  Real multi-host TPU hardware is not
available here, so this test wires TWO coordinated CPU-backend processes
(2 virtual devices each) through the exact `init_distributed` + `make_mesh`
pathway and asserts the 4-device sharded likelihood table equals the
single-process result bitwise.
"""

import os
import socket
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(tmp_path, mode, extra_env=None, tag=""):
    coordinator = f"127.0.0.1:{_free_port()}"
    outs = [str(tmp_path / f"proc{i}_{mode}{tag}.npz") for i in range(2)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env.update(extra_env or {})
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(i), outs[i], mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
    return [np.load(o) for o in outs]


def test_two_process_sharded_llh_matches_single(tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    outs = [str(tmp_path / f"proc{i}.npz") for i in range(2)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(i), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"

    res = [np.load(o) for o in outs]
    assert int(res[0]["process_count"]) == 2
    assert int(res[0]["n_devices"]) == 4
    # both processes read back the identical replicated table
    np.testing.assert_array_equal(res[0]["llh"], res[1]["llh"])

    # single-process evaluation of the same workload (this process is the
    # usual 8-virtual-device CPU backend).  The two-process table is
    # bitwise-identical ACROSS processes (asserted above -- same program);
    # against the differently-sharded single-process program XLA may fuse
    # reductions differently, so allow f64 LSB rounding (measured 2.4e-15
    # relative).
    sys.path.insert(0, HERE)
    import _dist_worker

    lik = _dist_worker.build_workload()
    params = np.linspace(0.05, 0.9, 8)[:, None]
    single = np.asarray(lik.llh_batch(params))
    assert np.all(np.isfinite(single))
    np.testing.assert_allclose(res[0]["llh"], single, rtol=1e-13)


def test_two_process_distributed_sweep_matches_single(tmp_path):
    """Whole FITS fanned out across processes: a small sweep() (fused grid,
    lockstep Nelder-Mead with multi-stage straggler compaction) over a
    2-process x 2-device global mesh must produce the same full result
    table as a single-process run -- the configuration a real multi-host
    v5e sweep uses (reference test.bs/han_fre.bs.sh:29-37 whole-fit
    fan-out).  The stage scheduler's outputs are replicated, so every
    process takes identical compaction decisions."""
    res = _run_workers(tmp_path, "sweep")
    assert int(res[0]["process_count"]) == 2
    assert int(res[0]["n_devices"]) == 4
    for key in ("llh", "params", "nfev"):
        np.testing.assert_array_equal(res[0][key], res[1][key])

    sys.path.insert(0, HERE)
    import _dist_worker
    from misti_tpu.dist.mesh import make_mesh

    single = _dist_worker.run_sweep(make_mesh(4))
    np.testing.assert_allclose(res[0]["llh"], single.llh, rtol=0, atol=0)
    np.testing.assert_allclose(res[0]["params"], single.params, rtol=0, atol=0)
    np.testing.assert_array_equal(res[0]["nfev"], single.nfev)


def test_two_process_sweep_keeps_aot_disabled(tmp_path):
    """Multi-host sweeps must NOT use the AOT export cache even under
    MISTI_AOT=1: warm worker processes SIGSEGV deserializing the mid-sized
    exported modules on XLA:CPU (the jaxlib roundtrip bug documented in
    engine/aot.py), so _sweep_fused hard-excludes multiproc meshes.  Two
    back-to-back runs must produce no artifacts and identical tables."""
    aot_dir = tmp_path / "exports"
    env = {"MISTI_AOT": "1", "MISTI_AOT_DIR": str(aot_dir)}
    res1 = _run_workers(tmp_path, "sweep", extra_env=env, tag="_a")
    res2 = _run_workers(tmp_path, "sweep", extra_env=env, tag="_b")
    assert not os.path.exists(aot_dir) or not os.listdir(aot_dir)
    for key in ("llh", "params", "nfev"):
        np.testing.assert_array_equal(res2[0][key], res1[0][key])
