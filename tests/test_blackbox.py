"""The reconstructed 806+-case black-box acceptance suite.

The upstream project's acceptance bar is frederic-mahe/swarm-tests
(806 shell-driven differential tests, /root/reference/.travis.yml:14-18);
that corpus is not vendorable offline, so tests/blackbox/ reconstructs
the same behavior surface and oracle (byte agreement with the reference
binary on exit code, stdout, stderr, and every output file).

Runs as ONE pytest case in a fresh subprocess: the runner forks its
pre-imported interpreter per case (fast), which must not inherit an
initialized JAX backend from the pytest session.
"""

import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_blackbox_suite(ref_binary, tmp_path):
    out = tmp_path / "blackbox.json"
    proc = subprocess.run(
        [sys.executable, str(REPO_ROOT / "tests" / "blackbox" / "runner.py"),
         "--json", str(out)],
        capture_output=True, text=True, timeout=3600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-30:])
    assert proc.returncode == 0, (
        f"blackbox suite failed (rc={proc.returncode}):\n{tail}\n"
        f"stderr tail:\n{proc.stderr[-2000:]}"
    )
    assert "0 failed" in proc.stdout.splitlines()[-1]
