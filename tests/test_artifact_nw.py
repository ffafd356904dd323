"""The 16-bit search kernel's compiled-in boundary artifact.

The reference's release build miscompiles search16.cc's per-channel
H0/F0 re-initialization (lane stores through pointer aliasing into
__m128i locals): only the first 4-row block of each target sees the
intended 2(go+ge)/0 left-edge boundary; later blocks read a pair of
global registers that accumulate 4*gapextend per block over the whole
search call. search8.cc happens to compile correctly. Details and the
replication strategy: swarm_tpu/_native/swarm_native.c
(nw_diffs_refsched) and ops/search.py (search_diffs_ref).

These tests pin that behavior three ways: a minimal pair whose
reference diff count (17) differs from the ideal DP's (11), randomized
end-to-end parity in the 16-bit regime, and a C-vs-Python differential
over the mirror implementation.
"""

import random

import numpy as np
import pytest

from genfasta import amplicon_cloud

from swarm_tpu import _native
from swarm_tpu.ops import search

OUTPUTS = ["-o", "out.txt", "-s", "stats.txt", "-i", "structure.txt",
           "-u", "uclust.txt", "-w", "seeds.fasta"]


def test_minimal_artifact_pair(both):
    # ideal DP says 11 diffs; the reference binary reports 17 because
    # rows >= 4 of the target see junk left-edge boundaries
    fasta = ">a_2\nTCAATAGGTGACTA\n>b_1\nATGTT\n"
    both.compare(["-d", "30", "-i", "structure.txt", "-o", "out.txt"],
                          fasta)
    # and our engine must reproduce the artifact value, not the ideal
    # (the compare above already guarantees it matches the binary)


def test_artifact_single_pair_diff_value(both, tmp_path):
    fasta = ">a_2\nTCAATAGGTGACTA\n>b_1\nATGTT\n"
    ref_dir, _ = both.run_one("ref", ["-d", "30", "-i", "st.txt"], fasta)
    line = (ref_dir / "st.txt").read_text().strip()
    assert line.split("\t")[2] == "17"


@pytest.mark.parametrize("seed,d", [(301, 8), (302, 12), (303, 25)])
def test_sixteen_bit_regime_parity(both, seed, d):
    fasta = amplicon_cloud(seed=seed, n_centers=5, cloud_size=25,
                           length=90, max_edits=8, max_abundance=40)
    both.compare(["-d", str(d)] + OUTPUTS, fasta)


def test_eight_bit_dense_parity(both):
    # 8-bit mode (search8 compiles correctly): ideal per-target
    # boundaries; dense cloud that previously exposed a semantics mixup
    fasta = amplicon_cloud(seed=131, n_centers=4, cloud_size=40,
                           length=60, max_edits=5, max_abundance=30)
    both.compare(["-d", "5"] + OUTPUTS, fasta)


def test_long_targets_16bit(both):
    fasta = amplicon_cloud(seed=200, n_centers=3, cloud_size=30,
                           length=200, max_edits=12, max_abundance=25)
    both.compare(["-d", "40"] + OUTPUTS, fasta)


@pytest.mark.skipif(not _native.available(), reason="native module required")
@pytest.mark.parametrize("trial", range(4))
def test_refsched_c_matches_python_mirror(trial, monkeypatch):
    rng = random.Random(400 + trial)
    qlen = rng.randint(1, 60)
    q = np.array([rng.randint(1, 4) for _ in range(qlen)], dtype=np.uint8)
    B = rng.randint(1, 30)
    lens = np.array([rng.randint(1, 60) for _ in range(B)], dtype=np.int64)
    maxlen = int(lens.max())
    rows = np.zeros((B, maxlen), dtype=np.uint8)
    for b in range(B):
        rows[b, : lens[b]] = [rng.randint(1, 4) for _ in range(int(lens[b]))]
    compute = None
    if trial % 2:
        compute = np.array([rng.random() < 0.7 for _ in range(B)],
                           dtype=np.uint8)

    args = (q, rows, lens, 18, 24, 13, 16, compute)
    s_c, d_c, a_c = search.search_diffs_ref(*args)
    monkeypatch.setattr(_native, "lib", None)
    s_p, d_p, a_p = search.search_diffs_ref(*args)
    assert list(d_c) == list(d_p)
    assert list(s_c) == list(s_p)
    assert list(a_c) == list(a_p)


def test_schedule_changes_diffs():
    """The same pair aligned at a different position in the target list
    can get different diffs — the defining property of the artifact.
    Scans random pairs; at least one must be schedule-sensitive."""
    rng = random.Random(7)
    found = False
    for _ in range(40):
        qlen = rng.randint(6, 20)
        tlen = rng.randint(5, 20)
        q = np.array([rng.randint(1, 4) for _ in range(qlen)], dtype=np.uint8)
        t = np.array([rng.randint(1, 4) for _ in range(tlen)], dtype=np.uint8)
        pad = np.zeros((1, tlen), dtype=np.uint8)
        pad[0] = t
        alone = search.search_diffs_ref(
            q, pad, np.array([tlen]), 18, 24, 13, 16)[1][0]
        # same target after 40 schedule-occupying targets
        B = 41
        width = max(24, tlen)
        rows = np.zeros((B, width), dtype=np.uint8)
        lens = np.zeros(B, dtype=np.int64)
        for b in range(B - 1):
            lens[b] = 24
            rows[b, :24] = [rng.randint(1, 4) for _ in range(24)]
        lens[B - 1] = tlen
        rows[B - 1, :tlen] = t
        late = search.search_diffs_ref(
            q, rows, lens, 18, 24, 13, 16)[1][B - 1]
        if alone != late:
            found = True
            break
    assert found
