"""Banded NW: jnp reference and Pallas kernel vs the exact host kernel."""

import numpy as np
import pytest

from swarm_tpu.ops.search import search_diffs


def _pairs(seed, P=16, W=64):
    rng = np.random.Generator(np.random.PCG64(seed))
    qrows = np.zeros((P, W), dtype=np.uint8)
    trows = np.zeros((P, W), dtype=np.uint8)
    qlens = rng.integers(20, W // 2, size=P).astype(np.int64)
    tlens = np.zeros(P, dtype=np.int64)
    for p in range(P):
        q = rng.integers(0, 4, size=qlens[p]).astype(np.uint8)
        t = q.copy()
        for _ in range(int(rng.integers(0, 5))):
            op = rng.integers(0, 3)
            pos = int(rng.integers(0, len(t)))
            if op == 0:
                t[pos] = (t[pos] + 1 + rng.integers(0, 3)) % 4
            elif op == 1 and len(t) > 5:
                t = np.delete(t, pos)
            else:
                t = np.insert(t, pos, rng.integers(0, 4))
        qrows[p, : len(q)] = q
        trows[p, : len(t)] = t
        tlens[p] = len(t)
    return qrows, trows, qlens, tlens


def _host_scores(qrows, trows, qlens, tlens, mm, go, ge):
    P = len(qlens)
    out = np.zeros(P, dtype=np.int64)
    for p in range(P):
        s, _, _ = search_diffs(
            qrows[p, : qlens[p]],
            trows[p : p + 1],
            tlens[p : p + 1],
            mm, go, ge, 16,
        )
        out[p] = s[0]
    return out


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("band", [8, 16])
def test_banded_reference_matches_host_within_cutoff(seed, band):
    import jax.numpy as jnp

    from swarm_tpu.ops.pallas_nw import banded_scores_reference

    mm, go, ge = 4, 12, 4
    qrows, trows, qlens, tlens = _pairs(seed)
    host = _host_scores(qrows, trows, qlens, tlens, mm, go, ge)
    got = np.asarray(
        banded_scores_reference(
            jnp.asarray(qrows), jnp.asarray(trows),
            jnp.asarray(qlens.astype(np.int32)),
            jnp.asarray(tlens.astype(np.int32)),
            mm, go, ge, band,
        )
    )
    # exact whenever the true cost fits in the band budget
    cutoff = band * ge  # any path within the band costs < this bound
    exact = host <= cutoff
    assert np.array_equal(got[exact], host[exact])
    # and never UNDER-estimates
    assert np.all(got >= host)


@pytest.mark.parametrize("penalties", [(4, 12, 4), (3, 6, 2)])
def test_pallas_kernel_matches_host_exactly(penalties):
    """The Pallas full-row kernel is bit-identical to the exact host
    kernel (same cost model, no band approximation)."""
    import jax.numpy as jnp

    from swarm_tpu.ops.pallas_nw import make_banded_scores_pallas

    mm, go, ge = penalties
    qrows, trows, qlens, tlens = _pairs(3, P=16, W=128)
    host = _host_scores(qrows, trows, qlens, tlens, mm, go, ge)
    call = make_banded_scores_pallas(P_TILE=8, interpret=True)
    got = np.asarray(
        call(
            jnp.asarray(qrows), jnp.asarray(trows),
            jnp.asarray(qlens), jnp.asarray(tlens),
            mm, go, ge,
        )
    )
    assert np.array_equal(got, host.astype(np.int32))


def test_banded_kernel_interpret():
    """The production banded kernel (O(rows*128)): exact scores up to
    the band bound, conservative beyond (ops/pallas_nw.py)."""
    import numpy as np

    from swarm_tpu.ops.pallas_nw import (
        band_for_cutoff,
        make_banded_scores_pallas_band,
    )

    rng = np.random.default_rng(5)
    P, W = 16, 256
    mm, go, ge = 18, 24, 13
    d = 3
    cutoff = d * max(mm, go + ge)
    band = band_for_cutoff(cutoff, go, ge)
    assert go + band * ge > cutoff

    qrows = np.zeros((P, W), np.uint8)
    trows = np.zeros((P, W), np.uint8)
    qlens = np.zeros(P, np.int32)
    tlens = np.zeros(P, np.int32)
    for p in range(P):
        L = int(rng.integers(150, 230))
        q = rng.integers(1, 5, L).astype(np.uint8)
        t = q.copy()
        n_ed = int(rng.integers(1, 4) if p % 2 == 0 else rng.integers(30, 60))
        for _ in range(n_ed):
            op = int(rng.integers(0, 3))
            pos = int(rng.integers(0, len(t)))
            if op == 0:
                t[pos] = 1 + (t[pos] % 4)
            elif op == 1 and len(t) > 5:
                t = np.delete(t, pos)
            else:
                t = np.insert(t, pos, rng.integers(1, 5))
        qrows[p, :L] = q
        qlens[p] = L
        tlens[p] = len(t)
        trows[p, : len(t)] = t

    call = make_banded_scores_pallas_band(P_TILE=8, interpret=True)
    got = np.asarray(call(qrows, trows, qlens, tlens, mm, go, ge, band))
    for p in range(P):
        s_ideal, _, _ = search_diffs(
            qrows[p, : qlens[p]], trows[p : p + 1, : tlens[p]],
            np.array([tlens[p]]), mm, go, ge, 16,
        )
        si, sb = int(s_ideal[0]), int(got[p])
        if si <= cutoff:
            assert sb == si, (p, si, sb)
        else:
            assert sb > cutoff, (p, si, sb)
