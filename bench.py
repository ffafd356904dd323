#!/usr/bin/env python3
"""Round benchmark: d=1 clustering throughput vs the reference binary.

Prints ONE JSON line:
  {"metric": "d1_cluster_amps_per_s", "value": N, "unit": "amplicons/s",
   "vs_baseline": ours/reference}

Methodology: both sides cluster the same deterministic synthetic corpus
(default 1M dereplicated amplicons (the BASELINE.md north-star scale), ~150 nt, amplicon clouds around
random centers) end to end — fasta from disk, -o/-s outputs written —
in the hot/steady state:
  - reference (torognes/swarm built from /root/reference with `make`):
    subprocess, all host cores, best of 3 runs (page cache warm);
  - swarm_tpu: in-process pipeline on the device backend, best of 2
    runs after one warm-up run (XLA executables compiled/loaded once —
    the serving model for a resident clustering service; the persistent
    compile cache gives fresh CLI processes the same executables).
Both timings include fasta parsing, clustering, and output writing.

Environment knobs: SWARM_TPU_BENCH_N (amplicon count), SWARM_TPU_BENCH_LEN
(read length), SWARM_TPU_BENCH_BACKEND (jax|jax_probe|jax_shard|numpy).
"""

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
REF_SRC = Path("/root/reference")
REF_BUILD = Path("/tmp/swarm_ref_build_bench")
WORK = Path("/tmp/swarm_tpu_bench")


def log(msg: str) -> None:
    sys.stderr.write(f"[bench] {msg}\n")
    sys.stderr.flush()


def build_reference() -> Path:
    for cand in (
        REF_BUILD / "bin" / "swarm",
        Path("/tmp/swarm_ref_build/bin/swarm"),
        Path("/tmp/ref_build/bin/swarm"),
    ):
        if cand.exists():
            return cand
    if not REF_SRC.exists():
        return None
    shutil.copytree(REF_SRC, REF_BUILD, dirs_exist_ok=True)
    subprocess.run(["make", "-j", "8"], cwd=REF_BUILD, check=True, capture_output=True)
    return REF_BUILD / "bin" / "swarm"


def gen_corpus(path: Path, n: int, length: int, seed: int = 20260816) -> int:
    """Deterministic dereplicated amplicon clouds; returns actual count."""
    rng = np.random.Generator(np.random.Philox(seed))
    cloud = 20
    n_centers = max(1, n // cloud)
    seen = set()
    records = []
    idx = 0
    for _ in range(n_centers):
        L = int(rng.integers(length - 8, length + 9))
        center = rng.integers(0, 4, size=L).astype(np.uint8)
        variants = [center]
        for _ in range(cloud - 1):
            v = variants[int(rng.integers(0, len(variants)))].copy()
            for _ in range(int(rng.integers(1, 3))):
                op = int(rng.integers(0, 3))
                p = int(rng.integers(0, len(v)))
                if op == 0:
                    v = v.copy()
                    v[p] = (v[p] + 1 + rng.integers(0, 3)) % 4
                elif op == 1 and len(v) > 10:
                    v = np.delete(v, p)
                else:
                    v = np.insert(v, p, rng.integers(0, 4))
            variants.append(v)
        for v in variants:
            key = v.tobytes()
            if key in seen:
                continue
            seen.add(key)
            ab = int(rng.integers(1, 1000))
            records.append(f">b{idx}_{ab}\n" + "".join("ACGT"[c] for c in v) + "\n")
            idx += 1
            if idx >= n:
                break
        if idx >= n:
            break
    order = rng.permutation(len(records))
    with open(path, "w") as fh:
        fh.writelines(records[i] for i in order)
    return idx


def time_reference(ref_bin: Path, fasta: Path, threads: int) -> float:
    args = [
        str(ref_bin), "-t", str(threads), "-d", "1",
        "-o", str(WORK / "ref_o.txt"), "-s", str(WORK / "ref_s.txt"),
        str(fasta),
    ]
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = subprocess.run(args, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        dt = time.perf_counter() - t0
        if r.returncode != 0:
            raise RuntimeError("reference run failed")
        best = min(best, dt)
    return best


def time_ours(fasta: Path, backend: str) -> float:
    os.environ["SWARM_TPU_BACKEND"] = backend
    sys.path.insert(0, str(REPO))
    from swarm_tpu.main import run

    argv = [
        "-d", "1",
        "-o", str(WORK / "tpu_o.txt"), "-s", str(WORK / "tpu_s.txt"),
        str(fasta),
    ]
    log("warm-up run (compiles/loads XLA executables) ...")
    t0 = time.perf_counter()
    rc = run(argv, "swarm")
    log(f"warm-up done in {time.perf_counter() - t0:.1f}s (rc={rc})")
    if rc != 0:
        raise RuntimeError("swarm_tpu warmup failed")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        rc = run(argv, "swarm")
        dt = time.perf_counter() - t0
        if rc != 0:
            raise RuntimeError("swarm_tpu run failed")
        best = min(best, dt)
    return best


def main() -> None:
    n_req = int(os.environ.get("SWARM_TPU_BENCH_N", "1000000"))
    length = int(os.environ.get("SWARM_TPU_BENCH_LEN", "150"))
    backend = os.environ.get("SWARM_TPU_BENCH_BACKEND", "jax")

    WORK.mkdir(parents=True, exist_ok=True)
    fasta = WORK / f"bench_{n_req}_{length}.fasta"
    count_file = WORK / f"{fasta.name}.count"
    if not fasta.exists() or not count_file.exists():
        log(f"generating corpus n={n_req} len~{length} ...")
        n_actual = gen_corpus(fasta, n_req, length)
        count_file.write_text(str(n_actual))
    n_actual = int(count_file.read_text())
    log(f"corpus: {n_actual} amplicons at {fasta}")

    threads = os.cpu_count() or 1
    ref_bin = build_reference()
    if ref_bin is None:
        ref_time = None
        log("reference unavailable")
    else:
        log(f"timing reference ({ref_bin}, -t {threads}) ...")
        ref_time = time_reference(ref_bin, fasta, threads)
        log(f"reference: {ref_time:.3f}s ({n_actual / ref_time:.0f} amps/s)")

    our_time = time_ours(fasta, backend)
    ours_tp = n_actual / our_time
    log(f"swarm_tpu ({backend}): {our_time:.3f}s ({ours_tp:.0f} amps/s)")

    # sanity: outputs must agree with the reference byte-for-byte
    if ref_time is not None:
        for name in ("o.txt", "s.txt"):
            a = (WORK / f"ref_{name}").read_bytes()
            b = (WORK / f"tpu_{name}").read_bytes()
            if a != b:
                log(f"WARNING: output {name} differs from reference!")

    vs = (ours_tp / (n_actual / ref_time)) if ref_time else None
    print(
        json.dumps(
            {
                "metric": "d1_cluster_amps_per_s",
                "value": round(ours_tp, 1),
                "unit": "amplicons/s",
                "vs_baseline": round(vs, 3) if vs is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
