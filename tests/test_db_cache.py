"""Serving-model DB cache (swarm_tpu/db.py:_DB_CACHE).

A resident process re-clustering an unchanged input file must reuse the
parsed Db while keeping the stderr/progress/output byte streams
identical to a cold parse; a modified file must be re-parsed.
"""

import io
import contextlib

from genfasta import amplicon_cloud


def _run_inproc(args):
    from swarm_tpu.main import run

    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        rc = run(args, "swarm")
    return rc, err.getvalue()


def _clear_cache():
    from swarm_tpu import db as dbmod

    dbmod._DB_CACHE.clear()


def test_db_cache_byte_parity(tmp_path):
    fasta = tmp_path / "in.fasta"
    fasta.write_text(amplicon_cloud(seed=31, n_centers=6, cloud_size=12, length=80))
    out1 = tmp_path / "o1.txt"
    out2 = tmp_path / "o2.txt"
    st1 = tmp_path / "s1.txt"
    st2 = tmp_path / "s2.txt"

    _clear_cache()
    rc1, err1 = _run_inproc(["-d", "1", "-o", str(out1), "-s", str(st1), str(fasta)])
    from swarm_tpu import db as dbmod

    assert rc1 == 0
    assert len(dbmod._DB_CACHE) == 1  # stored by the first parse

    rc2, err2 = _run_inproc(["-d", "1", "-o", str(out2), "-s", str(st2), str(fasta)])
    assert rc2 == 0
    # stderr differs only in the output file paths echoed by args_show
    norm1 = err1.replace(str(out1), "OUT").replace(str(st1), "ST")
    norm2 = err2.replace(str(out2), "OUT").replace(str(st2), "ST")
    assert norm1 == norm2
    assert out1.read_bytes() == out2.read_bytes()
    assert st1.read_bytes() == st2.read_bytes()


def test_db_cache_invalidation_on_change(tmp_path):
    import os

    fasta = tmp_path / "in.fasta"
    fasta.write_text(">a_5\nACGT\n>b_3\nACGA\n")
    out1 = tmp_path / "o1.txt"
    out2 = tmp_path / "o2.txt"

    _clear_cache()
    rc1, _ = _run_inproc(["-d", "1", "-o", str(out1), str(fasta)])
    assert rc1 == 0

    fasta.write_text(">c_9\nTTTT\n>d_2\nTTTA\n")
    # force a distinct mtime_ns even on coarse filesystems
    stt = fasta.stat()
    os.utime(fasta, ns=(stt.st_atime_ns + 1_000_000, stt.st_mtime_ns + 1_000_000))

    rc2, _ = _run_inproc(["-d", "1", "-o", str(out2), str(fasta)])
    assert rc2 == 0
    assert b"c_9" in out2.read_bytes()
    assert b"a_5" not in out2.read_bytes()


def test_db_cache_disabled_by_env(tmp_path, monkeypatch):
    monkeypatch.setenv("SWARM_TPU_DB_CACHE", "0")
    fasta = tmp_path / "in.fasta"
    fasta.write_text(">a_5\nACGT\n")
    _clear_cache()
    rc, _ = _run_inproc(["-d", "1", "-o", str(tmp_path / "o.txt"), str(fasta)])
    assert rc == 0
    from swarm_tpu import db as dbmod

    assert len(dbmod._DB_CACHE) == 0
