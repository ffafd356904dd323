"""Cross-checks: the device alignment screen vs the exact host kernel."""

import numpy as np
import pytest

from swarm_tpu.ops.search import search_diffs, set_bit_mode


def _random_batch(seed, B=32, qlen=40, max_dlen=64):
    rng = np.random.Generator(np.random.PCG64(seed))
    qseq = rng.integers(0, 4, size=qlen).astype(np.uint8)
    rows = rng.integers(0, 4, size=(B, max_dlen)).astype(np.uint8)
    lens = rng.integers(qlen - 6, max_dlen + 1, size=B).astype(np.int64)
    # make half the targets near-identical to the query (small diffs)
    for b in range(0, B, 2):
        L = min(int(lens[b]), qlen)
        rows[b, :L] = qseq[:L]
        lens[b] = L
        for _ in range(int(rng.integers(0, 4))):
            rows[b, int(rng.integers(0, L))] = rng.integers(0, 4)
    idx = np.arange(max_dlen)
    rows[idx[None, :] >= lens[:, None]] = 0
    return qseq, rows, lens


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("penalties", [(4, 12, 4), (3, 6, 2)])
def test_device_scores_match_host(seed, penalties):
    import jax.numpy as jnp

    from swarm_tpu.ops.search_jax import nw_scores_device

    mm, go, ge = penalties
    qseq, rows, lens = _random_batch(seed)
    B, W = rows.shape

    scores_np, _, _ = search_diffs(qseq, rows, lens, mm, go, ge, 16)

    n = B + 1
    padded = np.zeros((n, 64), dtype=np.uint8)
    lengths = np.zeros(n, dtype=np.int32)
    padded[0, : len(qseq)] = qseq
    lengths[0] = len(qseq)
    padded[1:, :W] = rows
    lengths[1:] = lens

    ids = np.arange(1, n, dtype=np.int32)
    out = nw_scores_device(
        jnp.asarray(padded), jnp.asarray(lengths),
        jnp.int32(0), jnp.asarray(ids),
        jnp.int32(mm), jnp.int32(go), jnp.int32(ge),
    )
    assert np.array_equal(np.asarray(out), scores_np.astype(np.int32))


def test_screen_soundness():
    """diff <= d implies score <= d * max(mm, go + ge) — the cutoff the
    d>=2 engine uses to reject without exact rescoring."""
    mm, go, ge = 4, 12, 4
    for seed in range(5):
        qseq, rows, lens = _random_batch(seed, B=64)
        scores, diffs, _ = search_diffs(qseq, rows, lens, mm, go, ge, 16)
        for d in (1, 2, 3, 5):
            cutoff = d * max(mm, go + ge)
            accepted = diffs <= d
            assert np.all(scores[accepted] <= cutoff)
