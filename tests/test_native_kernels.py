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


def test_banded_matches_full_for_accepted_pairs():
    """The banded 8-bit DP (nw_pair_ideal_banded) is bit-identical to
    the full DP for every pair the engine can accept, and never
    accepts a pair the full DP rejects (band soundness argument in
    swarm_native.c)."""
    import ctypes
    import random

    import numpy as np

    from swarm_tpu import _native

    if not _native.available():
        return
    lib = _native.lib
    lib.nw_diffs_banded_batch.restype = None
    mm, go, ge = 18, 24, 13
    for d in (2, 3, 5):
        cutoff = d * max(mm, go + ge)
        # band_for_exact: go + B*ge > cutoff + (go+ge) + ge
        band = max(1, (cutoff + go + 2 * ge + 1 - go + ge - 1) // ge)
        width = 2 * band + 1
        rng = random.Random(70 + d)
        for trial in range(40):
            ql = rng.randint(30, 200)
            q = np.array([rng.randint(1, 4) for _ in range(ql)], np.uint8)
            t = list(q)
            for _ in range(rng.randint(0, 8)):
                op = rng.randint(0, 2)
                pos = rng.randrange(len(t))
                if op == 0:
                    t[pos] = 1 + (t[pos] % 4)
                elif op == 1 and len(t) > 5:
                    del t[pos]
                else:
                    t.insert(pos, rng.randint(1, 4))
            t = np.array(t, np.uint8)
            if abs(len(t) - ql) > band:
                continue
            rows = t[None, :]
            lens = np.array([len(t)], np.int64)
            s_f, d_f, a_f = _native.nw_diffs_batch(
                q, rows, lens, mm, go, ge, 255)
            dirs = np.empty(len(t) * width, np.uint8)
            Hb = np.empty(width, np.int64)
            Eb = np.empty(width, np.int64)
            s_b = np.empty(1, np.int64)
            d_b = np.empty(1, np.int64)
            a_b = np.empty(1, np.int64)
            lib.nw_diffs_banded_batch(
                _native._ptr(np.ascontiguousarray(q)), ctypes.c_int64(ql),
                _native._ptr(np.ascontiguousarray(rows)),
                _native._ptr(lens), ctypes.c_int64(len(t)),
                ctypes.c_int64(1), ctypes.c_int64(mm), ctypes.c_int64(go),
                ctypes.c_int64(ge), ctypes.c_int64(band),
                _native._ptr(dirs), _native._ptr(Hb), _native._ptr(Eb),
                _native._ptr(s_b), _native._ptr(d_b), _native._ptr(a_b),
            )
            if int(d_f[0]) <= d:
                assert int(d_b[0]) == int(d_f[0]), (d, trial, d_f, d_b)
                assert int(a_b[0]) == int(a_f[0])
                assert int(s_b[0]) == int(s_f[0])
            else:
                assert int(d_b[0]) > d, (d, trial, d_f, d_b)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("no_break", [False, True])
def test_d1_network_native_matches_numpy(seed, no_break):
    """The host variant-hash d=1 builder vs the pure-numpy oracle."""
    import os

    import numpy as np

    from swarm_tpu import _native
    from test_jax_neighbors import _random_db

    if not _native.available():
        return
    db = _random_db(n=400, min_len=15, max_len=80, seed=100 + seed)
    ef_c, et_c = _native.d1_network(
        db.codes, db.offsets, db.lengths,
        np.asarray(db.abundances, dtype=np.int64), no_break,
    )
    old = os.environ.pop("SWARM_TPU_BACKEND", None)
    os.environ["SWARM_TPU_BACKEND"] = "numpy"
    os.environ["SWARM_TPU_NATIVE_D1"] = "0"
    try:
        from swarm_tpu.ops.neighbors import (
            variant_hashes, verify_candidates, _join,
            pad_codes, make_zobrist,
        )

        max_len = max(int(db.longest), 1)
        padded = pad_codes(db.codes, db.offsets, db.lengths, max_len)
        zob = make_zobrist(max_len)
        seqhash, hashes, valid = variant_hashes(padded, db.lengths, zob)
        order = np.argsort(seqhash, kind="stable")
        amp, slot, tgt = _join(hashes, valid, seqhash[order], order)
        ok = verify_candidates(padded, db.lengths, amp, slot, tgt)
        amp, tgt = amp[ok], tgt[ok]
        keep = amp != tgt
        if not no_break:
            keep &= db.abundances[amp] >= db.abundances[tgt]
        amp, tgt = amp[keep], tgt[keep]
        o = np.lexsort((tgt, amp))
        ef_py, et_py = amp[o], tgt[o]
    finally:
        if old is None:
            os.environ.pop("SWARM_TPU_BACKEND", None)
        else:
            os.environ["SWARM_TPU_BACKEND"] = old
        os.environ.pop("SWARM_TPU_NATIVE_D1", None)
    assert np.array_equal(ef_c, ef_py.astype(np.int64))
    assert np.array_equal(et_c, et_py.astype(np.int64))
    assert len(ef_c) > 0


def test_nw_align_banded_matches_full():
    """nw_align_banded must be byte-identical to nw_align whenever it
    accepts (band-exit cost bound), across random pairs, near-identical
    pairs, indel-heavy pairs and equal-cost tie shapes."""
    from swarm_tpu import _native

    if not _native.available():
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(99)
    n_accepted = 0
    for trial in range(400):
        L = int(rng.integers(10, 120))
        a = rng.integers(0, 4, size=L).astype(np.uint8)
        mode = trial % 4
        if mode == 0:  # few substitutions
            b = a.copy()
            for _ in range(int(rng.integers(0, 4))):
                b[rng.integers(0, len(b))] = rng.integers(0, 4)
        elif mode == 1:  # indels
            b = a.copy()
            for _ in range(int(rng.integers(1, 5))):
                if rng.random() < 0.5 and len(b) > 5:
                    b = np.delete(b, rng.integers(0, len(b)))
                else:
                    b = np.insert(b, rng.integers(0, len(b) + 1),
                                  rng.integers(0, 4))
        elif mode == 2:  # unrelated
            b = rng.integers(0, 4, size=int(rng.integers(10, 120))).astype(np.uint8)
        else:  # repeat-heavy (gap placement ties)
            a = np.repeat(rng.integers(0, 4, size=max(2, L // 8)),
                          8)[:L].astype(np.uint8)
            b = a.copy()
            b = np.delete(b, rng.integers(0, len(b)))
        for scores in ((4, 12, 4), (2, 3, 1), (5, 6, 3)):
            want = _native.nw_align(b, a, *scores)
            for band in (2, 8):
                got = _native.nw_align_banded(b, a, *scores, band)
                if got is not None:
                    n_accepted += 1
                    assert got == want, (trial, scores, band)
    assert n_accepted > 300  # the band must actually accept often
