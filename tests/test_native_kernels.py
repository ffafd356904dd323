"""Differential tests: native C kernels vs their pure-Python oracles."""

import numpy as np
import pytest

from swarm_tpu import _native

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native module unavailable"
)


def _python_search_diffs(qseq, rows, lens, mm, go, ge, bit_mode):
    """Force the pure-numpy + python-backtrack path."""
    import swarm_tpu.ops.search as search

    lib = _native.lib
    try:
        _native.lib = None
        return search.search_diffs(qseq, rows, lens, mm, go, ge, bit_mode)
    finally:
        _native.lib = lib


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("penalties,bit_mode", [
    ((4, 12, 4), 8),     # defaults; saturation at 255 reachable
    ((3, 6, 2), 16),
    ((9, 10, 5), 8),     # saturates quickly on divergent pairs
])
def test_nw_diffs_batch_matches_python(seed, penalties, bit_mode):
    mm, go, ge = penalties
    rng = np.random.Generator(np.random.PCG64(seed))
    qlen = int(rng.integers(10, 80))
    qseq = rng.integers(0, 4, size=qlen).astype(np.uint8)
    B = 24
    max_dlen = 96
    rows = np.zeros((B, max_dlen), dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int64)
    for b in range(B):
        if b % 3 == 0:  # similar to the query (small true distance)
            t = qseq.copy()
            for _ in range(int(rng.integers(0, 4))):
                pos = int(rng.integers(0, len(t)))
                op = rng.integers(0, 3)
                if op == 0:
                    t[pos] = rng.integers(0, 4)
                elif op == 1 and len(t) > 4:
                    t = np.delete(t, pos)
                else:
                    t = np.insert(t, pos, rng.integers(0, 4))
        else:  # random (often saturating in 8-bit mode)
            t = rng.integers(0, 4, size=int(rng.integers(5, max_dlen))).astype(np.uint8)
        rows[b, : len(t)] = t
        lens[b] = len(t)

    s_py, d_py, a_py = _python_search_diffs(qseq, rows, lens, mm, go, ge, bit_mode)
    s_c, d_c, a_c = _native.nw_diffs_batch(
        qseq, rows, lens, mm, go, ge, 255 if bit_mode == 8 else 65535
    )
    assert np.array_equal(s_py, s_c)
    assert np.array_equal(d_py, d_c)
    assert np.array_equal(a_py, a_c)
    if bit_mode == 8:
        assert (s_c >= 255).any()  # the saturation path must be exercised


def test_qgram_profiles_native_matches_python():
    import swarm_tpu.ops.qgram as qgram

    rng = np.random.Generator(np.random.PCG64(9))
    n, width = 64, 96
    padded = rng.integers(0, 4, size=(n, width)).astype(np.uint8)
    lengths = rng.integers(0, width + 1, size=n).astype(np.int64)

    got = _native.qgram_profiles_native(padded, lengths)
    lib = _native.lib
    try:
        _native.lib = None
        want = qgram.qgram_profiles(padded, lengths)
    finally:
        _native.lib = lib
    assert np.array_equal(got, want)


def test_nw_align_matches_python():
    import swarm_tpu.ops.nw_scalar as nws

    rng = np.random.Generator(np.random.PCG64(3))
    for _ in range(30):
        q = rng.integers(0, 4, size=int(rng.integers(5, 60))).astype(np.uint8)
        t = q.copy()
        for _ in range(int(rng.integers(0, 6))):
            pos = int(rng.integers(0, len(t)))
            op = rng.integers(0, 3)
            if op == 0:
                t[pos] = rng.integers(0, 4)
            elif op == 1 and len(t) > 3:
                t = np.delete(t, pos)
            else:
                t = np.insert(t, pos, rng.integers(0, 4))
        got = _native.nw_align(t, q, 4, 12, 4)
        lib = _native.lib
        try:
            _native.lib = None
            want = nws.nw(t, q, 4, 12, 4)
        finally:
            _native.lib = lib
        assert got == want
