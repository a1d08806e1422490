"""2-process jax.distributed smoke: exercises parallel/distributed.py's
init_multihost with explicit coordinator args (the reference's multi-process
role is played by Lightning DDP spawn + NCCL, SURVEY.md row 28; here it is
single-program multi-host JAX over the distributed service)."""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cluster():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.update(
        SMAQ_TEST_REEXEC="1",
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"
    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        r = json.loads(line[len("RESULT "):])
        results[r["process_index"]] = r
    assert set(results) == {0, 1}
    for i, r in results.items():
        assert r["process_count"] == 2
        assert r["global_devices"] == 2
        assert r["is_primary"] == (i == 0)
        # psum over both hosts: device 0 holds 1.0*4, device 1 holds 2.0*4
        assert r["psum"] == pytest.approx(12.0)
