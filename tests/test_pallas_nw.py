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
