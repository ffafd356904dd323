"""Multi-host execution: 2-process jax.distributed CPU integration.

Launches two coordinated worker processes (each with 2 virtual CPU
devices, a 4-device global mesh spanning both) running the
range-partitioned d=1 sort-join, and checks that both return the same
edge list as the single-process sharded engine on the same database
(SURVEY.md sect. 5.8 / sect. 7 stage 6).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
REPO = HERE.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_join_matches_single():
    port = _free_port()
    env = {
        **os.environ,
        "PYTHONPATH": f"{REPO}:{HERE}",
    }
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(HERE / "multihost_worker.py"),
             str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
        outs.append(json.loads(out.decode().strip().splitlines()[-1]))

    assert outs[0]["edges"] == outs[1]["edges"]

    # single-process oracle on the same database
    from test_jax_neighbors import _random_db
    from swarm_tpu.parallel.mesh import SortJoinShardedEngine

    db = _random_db(n=240, min_len=20, max_len=60, seed=9100)
    engine = SortJoinShardedEngine(db)
    ef, et = engine.build_network(no_break=False, abundances=db.abundances)
    expected = [[int(a), int(b)] for a, b in zip(ef, et)]
    assert outs[0]["edges"] == expected
    assert len(expected) > 0  # planted neighbors guarantee edges
