"""The 16-lane AVX-512 banded DP (swarm_native.c: d2_pair_diff_batch16)
must return byte-identical diffs to the scalar kernel on every input —
accepted diffs, rejections, ragged lengths, and boundary bands.

On hosts without AVX-512 both paths are the scalar kernel and the test
degenerates to self-consistency (still checks determinism).
"""

import os

import numpy as np
import pytest

from swarm_tpu import _native

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native library unavailable"
)


def _random_db(rng, n, length, indel=True):
    seqs = []
    base = rng.integers(0, 4, size=length, dtype=np.uint8)
    for _ in range(n):
        s = base.copy()
        for _ in range(int(rng.integers(0, 6))):
            p = int(rng.integers(0, len(s)))
            op = int(rng.integers(0, 3)) if indel else 0
            if op == 0:
                s = s.copy()
                s[p] = (s[p] + 1 + rng.integers(0, 3)) % 4
            elif op == 1 and len(s) > 10:
                s = np.delete(s, p)
            else:
                s = np.insert(s, p, rng.integers(0, 4))
        seqs.append(s)
    codes = np.concatenate(seqs).astype(np.uint8)
    lengths = np.array([len(s) for s in seqs], dtype=np.int64)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    return codes, offsets, lengths


@pytest.mark.parametrize("d", [1, 2, 3, 5])
@pytest.mark.parametrize("length", [40, 150])
def test_batch_matches_scalar(d, length):
    rng = np.random.default_rng(d * 1000 + length)
    n = 120
    codes, offsets, lengths = _random_db(rng, n, length)
    abundances = rng.integers(1, 100, size=n).astype(np.int64)
    pa = rng.integers(0, n, size=400).astype(np.int64)
    pb = rng.integers(0, n, size=400).astype(np.int64)
    keep = pa != pb
    pa, pb = pa[keep], pb[keep]

    args = (codes, offsets, lengths, abundances, pa, pb, d, 9, 12, 4, False)
    got = _native.d2_diffs_pairs(*args, nthreads=1)
    os.environ["SWARM_TPU_D2_BATCH_OFF"] = "1"
    try:
        want = _native.d2_diffs_pairs(*args, nthreads=1)
    finally:
        del os.environ["SWARM_TPU_D2_BATCH_OFF"]
    assert np.array_equal(got[0], want[0])
    assert np.array_equal(got[1], want[1])
    # sanity: some pairs must actually be accepted for the test to bite
    assert (got[0] >= 0).sum() > 0
