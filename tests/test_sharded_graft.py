"""Sharded fastidious graft join == single-device graft join.

The hash-range decomposition (parallel/mesh.py:ShardedGraftEngine) must
produce identical graft pairs and identical candidate counts for any
shard count: key runs are contained in one hash range, so the union of
per-range joins is exactly the global join.
"""

import numpy as np
import pytest

import jax

from genfasta import amplicon_cloud


def _corpus(seed=77, n_centers=12, cloud_size=18, length=90):
    import io
    import sys

    from swarm_tpu.db import db_read
    from swarm_tpu.params import Parameters
    from swarm_tpu.progress import Progress

    fasta = amplicon_cloud(
        seed=seed, n_centers=n_centers, cloud_size=cloud_size, length=length,
        max_edits=3,
    )
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as fh:
        fh.write(fasta)
        path = fh.name
    p = Parameters()
    p.input_filename = path
    p.logfile = io.StringIO()
    return db_read(p, Progress(p.logfile, False))


@pytest.fixture(scope="module")
def engines():
    from swarm_tpu.ops.neighbors import pad_codes
    from swarm_tpu.ops.neighbors_jax import _round_up, make_zobrist_pair

    db = _corpus()
    n = len(db)
    width = _round_up(max(int(db.longest), 1), 64)
    padded = pad_codes(db.codes, db.offsets, db.lengths, width)
    lengths = db.lengths.astype(np.int32)
    zob = np.asarray(make_zobrist_pair(width))

    # split amplicons into pseudo heavy/light halves by abundance rank
    order = np.argsort(-db.abundances, kind="stable")
    heavy = np.sort(order[: n // 3]).astype(np.int64)
    light = np.sort(order[n // 3 :]).astype(np.int64)
    return padded, lengths, zob, heavy, light


def _single_device(padded, lengths, zob, heavy, light):
    from swarm_tpu.ops.fastidious_jax import GraftEngine

    eng = GraftEngine(padded, lengths, zob)
    return eng.graft_candidates(heavy, light)


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_sharded_matches_single_device(engines, n_dev):
    from jax.sharding import Mesh

    from swarm_tpu.parallel.mesh import ShardedGraftEngine

    padded, lengths, zob, heavy, light = engines
    want_total, want_cand = _single_device(padded, lengths, zob, heavy, light)
    assert want_total > 0  # non-vacuous corpus

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("amps",))
    eng = ShardedGraftEngine(padded, lengths, zob, mesh=mesh)
    got_total, got_cand = eng.graft_candidates(heavy, light)

    assert got_total == want_total
    np.testing.assert_array_equal(got_cand, want_cand)


def test_sharded_swapped_sides(engines):
    """heavy side bigger than light side (small_is_heavy=False path)."""
    from jax.sharding import Mesh

    from swarm_tpu.parallel.mesh import ShardedGraftEngine

    padded, lengths, zob, heavy, light = engines
    # swap roles: now "heavy" is the big side
    want_total, want_cand = _single_device(padded, lengths, zob, light, heavy)

    mesh = Mesh(np.array(jax.devices()[:4]), ("amps",))
    eng = ShardedGraftEngine(padded, lengths, zob, mesh=mesh)
    got_total, got_cand = eng.graft_candidates(light, heavy)
    assert got_total == want_total
    np.testing.assert_array_equal(got_cand, want_cand)


def test_sharded_empty_side(engines):
    from swarm_tpu.parallel.mesh import ShardedGraftEngine

    padded, lengths, zob, heavy, light = engines
    eng = ShardedGraftEngine(padded, lengths, zob)
    total, cand = eng.graft_candidates(heavy, np.zeros(0, dtype=np.int64))
    assert total == 0
    assert (cand == -1).all()
