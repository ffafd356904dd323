"""Graft engine equivalence: the whole-join sort formulation vs the
chunked bitset/searchsorted probe engine (SWARM_TPU_GRAFT=chunked)."""

import os
import shutil
import subprocess
import sys
from pathlib import Path

from genfasta import amplicon_cloud

REPO_ROOT = Path(__file__).resolve().parent.parent


def _run(tmp_path, tag, fasta, graft_engine):
    workdir = tmp_path / tag
    workdir.mkdir()
    (workdir / "input.fasta").write_text(fasta)
    env = {
        **os.environ,
        "PYTHONPATH": str(REPO_ROOT),
        "SWARM_TPU_PROGNAME": "swarm",
        # force the device engines: under "auto" these corpora resolve
        # to the native host graft and the comparison would be vacuous
        "SWARM_TPU_BACKEND": "jax",
        "JAX_PLATFORMS": "cpu",
        "SWARM_TPU_FORCE_PLATFORM": "cpu",
    }
    if graft_engine:
        env["SWARM_TPU_GRAFT"] = graft_engine
    shutil.copy2(REPO_ROOT / "bin" / "swarm", workdir / "swarm")
    r = subprocess.run(
        [sys.executable, "swarm", "-f", "-o", "out.txt", "-s", "stats.txt",
         "-i", "structure.txt", "input.fasta"],
        cwd=workdir, capture_output=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    return workdir, r


def test_sortjoin_matches_chunked(tmp_path):
    fasta = amplicon_cloud(seed=777, n_centers=12, cloud_size=35,
                           length=70, max_edits=4, max_abundance=8)
    d_new, r_new = _run(tmp_path, "sortjoin", fasta, None)
    d_old, r_old = _run(tmp_path, "chunked", fasta, "chunked")
    assert r_new.stderr == r_old.stderr
    for f in ("out.txt", "stats.txt", "structure.txt"):
        assert (d_new / f).read_bytes() == (d_old / f).read_bytes(), f
    # the corpus must actually exercise the join (guard against a
    # vacuous pass with an empty light side)
    import re

    m = re.search(rb"Made (\d+) grafts", r_new.stderr)
    assert m and int(m.group(1)) > 0, r_new.stderr[-400:]


def test_fused_matches_split(tmp_path):
    """The one-dispatch fused keygen+sort strip path must match the
    split (keygen programs + sort program) path byte-for-byte."""
    fasta = amplicon_cloud(seed=778, n_centers=10, cloud_size=30,
                           length=60, max_edits=4, max_abundance=6)
    d_new, r_new = _run(tmp_path, "fused", fasta, "fused")
    d_old, r_old = _run(tmp_path, "split", fasta, None)
    assert r_new.stderr == r_old.stderr
    for f in ("out.txt", "stats.txt", "structure.txt"):
        assert (d_new / f).read_bytes() == (d_old / f).read_bytes(), f
    import re

    m = re.search(rb"Made (\d+) grafts", r_new.stderr)
    assert m and int(m.group(1)) > 0, r_new.stderr[-400:]


def test_native_graft_matches_device(tmp_path):
    """The host radix graft join == the device sort-join engine."""
    fasta = amplicon_cloud(seed=779, n_centers=12, cloud_size=28,
                           length=65, max_edits=4, max_abundance=8)
    d_dev, r_dev = _run(tmp_path, "device", fasta, None)
    d_nat, r_nat = _run(tmp_path, "native", fasta, "native")
    assert r_dev.stderr == r_nat.stderr
    for f in ("out.txt", "stats.txt", "structure.txt"):
        assert (d_dev / f).read_bytes() == (d_nat / f).read_bytes(), f
    import re

    m = re.search(rb"Made (\d+) grafts", r_dev.stderr)
    assert m and int(m.group(1)) > 0, r_dev.stderr[-400:]


def test_native_graft_striping(monkeypatch):
    """The striped big-side path must equal the one-shot join (counts
    add across strips; per-light minima merge)."""
    import numpy as np

    from swarm_tpu import _native

    if not _native.available():
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(32)
    seqs = []
    base = rng.integers(0, 4, size=70).astype(np.uint8)
    seen = set()
    for _ in range(500):
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
    heavy = np.arange(0, n, 3, dtype=np.int64)
    light = np.setdiff1d(np.arange(n), heavy).astype(np.int64)

    want = _native._graft_join_once(codes, offsets, lengths, n, heavy, light)

    # shrink the budget so graft_join is forced onto the strip path
    orig = _native._graft_join_once
    calls = {"n": 0}

    def counting(c, o, L, nn, h, l):
        calls["n"] += 1
        if calls["n"] == 1:
            return None  # pretend the one-shot overflowed
        return orig(c, o, L, nn, h, l)

    monkeypatch.setattr(_native, "_graft_join_once", counting)
    # budget that fits the small side plus ~a third of the big side;
    # the asymmetric probe would short-circuit the whole exercise, so
    # disable it for this test
    monkeypatch.setattr(_native, "GRAFT_PROBE_MAX_TABLE_KEYS", 0)
    small_keys = int((7 * lengths[heavy] + 4).sum())
    big_keys = int((7 * lengths[light] + 4).sum())
    monkeypatch.setattr(
        _native, "GRAFT_KEY_BUDGET", small_keys + big_keys // 3
    )
    got = _native.graft_join(codes, offsets, lengths, n, heavy, light)
    assert calls["n"] > 2  # actually striped
    assert got[0] == want[0]
    np.testing.assert_array_equal(got[1], want[1])


def test_native_probe_matches_radix():
    """The asymmetric probe join (graft_probe_native) is a drop-in for
    the radix sort-join: identical counts and graft candidates across
    side imbalances, including table-side = heavy."""
    import numpy as np

    from swarm_tpu import _native

    if not _native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(77)
    seqs = []
    seen = set()
    for _ in range(80):
        base = rng.integers(0, 4, size=int(rng.integers(50, 90))).astype(
            np.uint8
        )
        for _ in range(6):
            v = base.copy()
            for _ in range(int(rng.integers(0, 3))):
                p = int(rng.integers(0, len(v)))
                v[p] = (v[p] + 1 + rng.integers(0, 3)) % 4
            if v.tobytes() not in seen:
                seen.add(v.tobytes())
                seqs.append(v)
    n = len(seqs)
    codes = np.concatenate(seqs)
    lengths = np.array([len(s) for s in seqs], dtype=np.int64)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    for split in (n // 10, n // 2, n - n // 10):
        heavy = np.arange(0, split, dtype=np.int64)
        light = np.arange(split, n, dtype=np.int64)
        want = _native._graft_join_once(codes, offsets, lengths, n, heavy, light)
        got = _native._graft_probe_once(codes, offsets, lengths, n, heavy, light)
        assert got[0] == want[0]
        np.testing.assert_array_equal(got[1], want[1])
