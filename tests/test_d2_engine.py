"""Native d>=2 clustering engine vs the Python oracle engine.

The whole seed/subseed loop runs in C (swarm_native.c: algo_cluster)
by default; SWARM_TPU_D2_ENGINE=python keeps the original Python loop.
Both must emit byte-identical output on every stream.
"""

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

from genfasta import amplicon_cloud

REPO_ROOT = Path(__file__).resolve().parent.parent

OUTPUTS = ["-o", "out.txt", "-s", "stats.txt", "-i", "structure.txt",
           "-u", "uclust.txt", "-w", "seeds.fasta"]


def _run(tmp_path, tag, args, fasta, engine):
    workdir = tmp_path / tag
    workdir.mkdir()
    (workdir / "input.fasta").write_text(fasta)
    env = {
        **os.environ,
        "PYTHONPATH": str(REPO_ROOT),
        "SWARM_TPU_PROGNAME": "swarm",
        "SWARM_TPU_D2_ENGINE": engine,
    }
    shutil.copy2(REPO_ROOT / "bin" / "swarm", workdir / "swarm")
    r = subprocess.run(
        [sys.executable, "swarm"] + args + ["input.fasta"],
        cwd=workdir, capture_output=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr
    return workdir, r


@pytest.mark.parametrize("d,seed", [(2, 601), (3, 602), (12, 603), (30, 604)])
def test_native_engine_matches_python(tmp_path, d, seed):
    fasta = amplicon_cloud(seed=seed, n_centers=5, cloud_size=20,
                           length=70, max_edits=5, max_abundance=40)
    nd, rn = _run(tmp_path, "native", ["-d", str(d)] + OUTPUTS, fasta, "native")
    pd_, rp = _run(tmp_path, "python", ["-d", str(d)] + OUTPUTS, fasta, "python")
    assert rn.stderr == rp.stderr
    for f in ("out.txt", "stats.txt", "structure.txt", "uclust.txt",
              "seeds.fasta"):
        assert (nd / f).read_bytes() == (pd_ / f).read_bytes(), f


def test_native_engine_no_break(tmp_path):
    fasta = amplicon_cloud(seed=610, n_centers=4, cloud_size=15,
                           length=60, max_edits=3)
    nd, _ = _run(tmp_path, "native", ["-d", "2", "-n", "-o", "out.txt",
                                      "-s", "stats.txt"], fasta, "native")
    pd_, _ = _run(tmp_path, "python", ["-d", "2", "-n", "-o", "out.txt",
                                       "-s", "stats.txt"], fasta, "python")
    assert (nd / "out.txt").read_bytes() == (pd_ / "out.txt").read_bytes()
    assert (nd / "stats.txt").read_bytes() == (pd_ / "stats.txt").read_bytes()


def test_native_engine_mothur(tmp_path):
    fasta = amplicon_cloud(seed=611, n_centers=3, cloud_size=12, length=50,
                           max_edits=3)
    nd, _ = _run(tmp_path, "native", ["-d", "2", "-r", "-o", "out.txt"],
                 fasta, "native")
    pd_, _ = _run(tmp_path, "python", ["-d", "2", "-r", "-o", "out.txt"],
                  fasta, "python")
    assert (nd / "out.txt").read_bytes() == (pd_ / "out.txt").read_bytes()
