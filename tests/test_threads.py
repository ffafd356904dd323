"""-t threading: outputs must be byte-identical for every thread count.

The reference parallelizes with a pthread pool (src/utils/threads.h);
swarm_tpu threads the host tails (d=1 probe phase, uclust writer, d>=2
exact diffs). Determinism rule: contiguous work ranges + in-order
merges, so -t N output == -t 1 output byte-for-byte.
"""

import numpy as np
import pytest

from genfasta import amplicon_cloud


def _run(tmp_path, tag, extra_env, args, fasta):
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    d = tmp_path / tag
    d.mkdir()
    (d / "in.fasta").write_text(fasta)
    env = {
        **os.environ,
        "PYTHONPATH": str(repo),
        "JAX_PLATFORMS": "cpu",
        "SWARM_TPU_FORCE_PLATFORM": "cpu",
        **extra_env,
    }
    r = subprocess.run(
        [sys.executable, str(repo / "bin" / "swarm")] + args + ["in.fasta"],
        cwd=d, env=env, capture_output=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr.decode()[-800:]
    return d


OUTS = ["-o", "o.txt", "-s", "s.txt", "-u", "u.txt", "-i", "i.txt",
        "-w", "w.fa"]


@pytest.mark.parametrize("threads", ["2", "4", "7"])
def test_d1_threaded_outputs_identical(tmp_path, threads):
    fasta = amplicon_cloud(seed=31, n_centers=25, cloud_size=20, length=110,
                           max_edits=3)
    d1 = _run(tmp_path, "t1", {}, ["-d", "1", "-t", "1"] + OUTS, fasta)
    dn = _run(tmp_path, f"t{threads}", {},
              ["-d", "1", "-t", threads] + OUTS, fasta)
    for f in ("o.txt", "s.txt", "u.txt", "i.txt", "w.fa"):
        assert (d1 / f).read_bytes() == (dn / f).read_bytes(), f


def test_d2_threaded_outputs_identical(tmp_path):
    fasta = amplicon_cloud(seed=32, n_centers=10, cloud_size=12, length=80,
                           max_edits=3)
    env = {"SWARM_TPU_D2_ENGINE": "network", "SWARM_TPU_D2_TILE": "256"}
    d1 = _run(tmp_path, "t1", env, ["-d", "2", "-t", "1"] + OUTS, fasta)
    dn = _run(tmp_path, "t4", env, ["-d", "2", "-t", "4"] + OUTS, fasta)
    for f in ("o.txt", "s.txt", "u.txt", "i.txt", "w.fa"):
        assert (d1 / f).read_bytes() == (dn / f).read_bytes(), f


def test_native_mt_network_matches_single(tmp_path):
    """Direct engine check across thread counts (includes cap retry)."""
    from swarm_tpu import _native

    if not _native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(33)
    seqs = []
    base = rng.integers(0, 4, size=64).astype(np.uint8)
    seen = set()
    for _ in range(600):
        v = base.copy()
        for _ in range(int(rng.integers(0, 4))):
            v[rng.integers(0, len(v))] = rng.integers(0, 4)
        if v.tobytes() in seen:
            continue
        seen.add(v.tobytes())
        seqs.append(v)
    n = len(seqs)
    codes = np.concatenate(seqs)
    lengths = np.array([len(s) for s in seqs], dtype=np.int64)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    ab = rng.integers(1, 50, size=n).astype(np.int64)
    want = _native.d1_network(codes, offsets, lengths, ab, False, nthreads=1)
    for nt in (2, 3, 8):
        got = _native.d1_network(codes, offsets, lengths, ab, False,
                                 nthreads=nt)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])
