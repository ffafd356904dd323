"""Worker process for the multi-host (jax.distributed) integration
test: joins the coordination service, runs the range-partitioned d=1
sort-join over the global 2-process CPU mesh, and prints the verified
edge list as JSON (which must match every other process and the
single-process engine).

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import json
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["SWARM_TPU_FORCE_PLATFORM"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["SWARM_TPU_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["SWARM_TPU_NUM_PROCESSES"] = str(nproc)
    os.environ["SWARM_TPU_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_compilation_cache", False)

    from swarm_tpu.parallel import distributed

    assert distributed.maybe_initialize() == pid
    assert jax.process_count() == nproc

    from test_jax_neighbors import _random_db

    db = _random_db(n=240, min_len=20, max_len=60, seed=9100)

    engine = distributed.DistributedJoin(db)
    ef, et = engine.build_network(no_break=False, abundances=db.abundances)
    print(json.dumps({
        "process": pid,
        "edges": [[int(a), int(b)] for a, b in zip(ef, et)],
    }))


if __name__ == "__main__":
    main()
