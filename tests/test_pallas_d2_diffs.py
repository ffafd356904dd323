"""Pallas forward-diff kernel vs the XLA-scan program (and thereby the
native oracle — d2_diffs_program is pinned to _native.d2_diffs_pairs by
test_d2_diffs_jax.py over the same tie-heavy corpora).

Runs in interpret mode: Mosaic cannot compile on the CPU backend, but
the interpreter executes the identical kernel logic, so any divergence
in the tie-break forwarding or the band boundary init shows up here.
"""

import io

import numpy as np
import pytest

import jax.numpy as jnp

from swarm_tpu import _native
from swarm_tpu.ops.d2_diffs_jax import DeviceDiffEngine, d2_diffs_program
from swarm_tpu.ops.pallas_d2_diffs import BLOCK, d2_diffs_pallas

from test_d2_diffs_jax import _chain_corpus, _mkdb

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native kernels unavailable"
)


@pytest.mark.parametrize(
    "seed,d,scores",
    [
        (1, 2, (4, 12, 4)),
        (4, 2, (2, 2, 2)),   # gap-open == extend: dense b4/b8 ties
        (5, 4, (1, 1, 1)),   # everything ties
        (6, 2, (9, 3, 1)),
        (3, 3, (4, 12, 4)),
    ],
)
def test_pallas_matches_scan(tmp_path, seed, d, scores):
    mismatch, go, ge = scores
    db = _mkdb(tmp_path, _chain_corpus(seed, 50, 48, d + 1))
    n = len(db)
    pa, pb = np.triu_indices(n, k=1)
    eng = DeviceDiffEngine(db, d)
    cutoff = d * max(mismatch, go + ge)
    B = eng.band_for_exact(cutoff, go, ge)

    tq = np.concatenate([pa, pb]).astype(np.int64)
    td = np.concatenate([pb, pa]).astype(np.int64)
    npad = -(-len(tq) // BLOCK) * BLOCK
    qi = np.zeros(npad, dtype=np.int64)
    di = np.zeros(npad, dtype=np.int64)
    qi[: len(tq)] = tq
    di[: len(td)] = td
    lanes_q = jnp.take(eng.rows_dev, jnp.asarray(qi), axis=0)
    lanes_d = jnp.take(eng.rows_dev, jnp.asarray(di), axis=0)
    qlen = jnp.take(eng.len_dev, jnp.asarray(qi))
    dlen = jnp.take(eng.len_dev, jnp.asarray(di))
    qlen = jnp.where(jnp.arange(npad) < len(tq), qlen, 0)

    want = np.asarray(d2_diffs_program(
        lanes_q, lanes_d, qlen, dlen, B=B, Lmax=eng.Lmax,
        mismatch=mismatch, go=go, ge=ge, d=d))
    got = np.asarray(d2_diffs_pallas(
        lanes_q, lanes_d, qlen, dlen, B=B, Lmax=eng.Lmax,
        mismatch=mismatch, go=go, ge=ge, d=d, interpret=True))
    np.testing.assert_array_equal(got, want)
