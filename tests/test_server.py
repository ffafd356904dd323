"""Resident-server mode: a warm process serving forwarded CLI runs.

The server (swarm_tpu/server.py) must be byte-transparent: a forwarded
run's stdout/stderr and every output file must be identical to an
in-process run (and hence to the reference binary, whose parity the
other suites establish).
"""

import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

from genfasta import amplicon_cloud

REPO_ROOT = Path(__file__).resolve().parent.parent
BIN = REPO_ROOT / "bin" / "swarm"


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    sock = str(tmp_path_factory.mktemp("srv") / "swarm.sock")
    env = {
        **os.environ,
        "PYTHONPATH": str(REPO_ROOT) + os.pathsep + os.environ.get("PYTHONPATH", ""),
        "JAX_PLATFORMS": "cpu",
        "SWARM_TPU_FORCE_PLATFORM": "cpu",
    }
    proc = subprocess.Popen(
        [sys.executable, "-m", "swarm_tpu.server", sock],
        env=env, stderr=subprocess.DEVNULL,
    )
    deadline = time.time() + 60
    while not os.path.exists(sock):
        if proc.poll() is not None or time.time() > deadline:
            raise RuntimeError("server did not start")
        time.sleep(0.05)
    yield sock, env
    subprocess.run(
        [sys.executable, "-m", "swarm_tpu.server", sock, "--shutdown"],
        env=env, timeout=30,
    )
    proc.wait(timeout=30)


def _run_cli(args, cwd, env, stdin_bytes=b""):
    return subprocess.run(
        [sys.executable, str(BIN)] + args,
        cwd=cwd, env=env, input=stdin_bytes,
        capture_output=True, timeout=120,
    )


def test_forwarded_run_matches_direct(server, tmp_path):
    sock, env = server
    fasta = tmp_path / "in.fasta"
    fasta.write_text(amplicon_cloud(seed=11, n_centers=8, cloud_size=12, length=80))

    d_direct = tmp_path / "direct"
    d_fwd = tmp_path / "fwd"
    d_direct.mkdir()
    d_fwd.mkdir()
    args = ["-d", "1", "-o", "o.txt", "-s", "s.txt", "-w", "w.fa", "../in.fasta"]

    r1 = _run_cli(args, d_direct, env)
    env_fwd = {**env, "SWARM_TPU_SERVER": sock}
    r2 = _run_cli(args, d_fwd, env_fwd)

    assert r1.returncode == r2.returncode == 0
    assert r1.stdout == r2.stdout
    assert r1.stderr == r2.stderr
    for f in ("o.txt", "s.txt", "w.fa"):
        assert (d_direct / f).read_bytes() == (d_fwd / f).read_bytes(), f


def test_forwarded_stdin_and_stdout(server, tmp_path):
    sock, env = server
    fasta = amplicon_cloud(seed=12, n_centers=5, cloud_size=8, length=60).encode()
    env_fwd = {**env, "SWARM_TPU_SERVER": sock}
    r_direct = _run_cli(["-d", "0"], tmp_path, env, stdin_bytes=fasta)
    r_fwd = _run_cli(["-d", "0"], tmp_path, env_fwd, stdin_bytes=fasta)
    assert r_direct.returncode == r_fwd.returncode == 0
    assert r_direct.stdout == r_fwd.stdout
    assert r_direct.stderr == r_fwd.stderr


def test_forwarded_error_path(server, tmp_path):
    sock, env = server
    env_fwd = {**env, "SWARM_TPU_SERVER": sock}
    r_direct = _run_cli(["-d", "1", "missing_file.fasta"], tmp_path, env)
    r_fwd = _run_cli(["-d", "1", "missing_file.fasta"], tmp_path, env_fwd)
    assert r_direct.returncode == r_fwd.returncode == 1
    assert r_direct.stderr == r_fwd.stderr


def test_server_survives_requests_and_is_warm(server, tmp_path):
    """The same process serves repeated runs (second run reuses the
    warm interpreter: no import cost)."""
    sock, env = server
    env_fwd = {**env, "SWARM_TPU_SERVER": sock}
    fasta = tmp_path / "in2.fasta"
    fasta.write_text(amplicon_cloud(seed=13, n_centers=6, cloud_size=10, length=70))
    for _ in range(3):
        r = _run_cli(["-d", "1", "-o", "o.txt", "in2.fasta"], tmp_path, env_fwd)
        assert r.returncode == 0
    assert (tmp_path / "o.txt").exists()


def test_fallback_without_server(tmp_path):
    """SWARM_TPU_SERVER pointing nowhere falls back to in-process."""
    env = {
        **os.environ,
        "PYTHONPATH": str(REPO_ROOT) + os.pathsep + os.environ.get("PYTHONPATH", ""),
        "JAX_PLATFORMS": "cpu",
        "SWARM_TPU_FORCE_PLATFORM": "cpu",
        "SWARM_TPU_SERVER": str(tmp_path / "nonexistent.sock"),
    }
    fasta = tmp_path / "in3.fasta"
    fasta.write_text(amplicon_cloud(seed=14, n_centers=4, cloud_size=6, length=60))
    r = _run_cli(["-d", "0", "-o", "o.txt", "in3.fasta"], tmp_path, env)
    assert r.returncode == 0
    assert (tmp_path / "o.txt").exists()
