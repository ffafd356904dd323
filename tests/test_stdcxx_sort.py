"""The d>=2 seeds sort: libstdc++ introsort replication.

The reference's tie comparator (`strcmp(...) == -1`,
src/algo.cc:165-179) is not a strict weak order, so byte parity of
`-w`/`-u`/`-s` output at d>=2 depends on replicating std::sort's exact
algorithm, not just the comparator. These tests stress the mass-tie
regime the round-1 suite never exercised:

- differential: C `sort_seeds_stdcxx` vs the pure-Python mirror on
  random tie-heavy inputs across the insertion-sort (n<=16),
  quicksort, and heapsort (depth-limit) regimes;
- end-to-end: `-w` seeds output vs the reference binary on corpora
  where every swarm has the same mass.
"""

import random

import numpy as np
import pytest

from genfasta import random_seq

from swarm_tpu import _native
from swarm_tpu.stdcxx_sort import stdcxx_sort


def _random_labels(rng, n):
    """Labels with many adjacent-digit / adjacent-letter pairs so the
    `== -1` branch fires for some ties but not others."""
    labels = set()
    while len(labels) < n:
        kind = rng.randrange(3)
        if kind == 0:
            labels.add("s%d_1" % rng.randrange(n * 2))
        elif kind == 1:
            labels.add("%s%d_1" % (rng.choice("abcdefgh"), rng.randrange(50)))
        else:
            labels.add(
                "".join(rng.choice("abc123") for _ in range(rng.randint(2, 6)))
                + "_1"
            )
    return sorted(labels, key=lambda _: rng.random())


@pytest.mark.skipif(not _native.available(), reason="native module required")
@pytest.mark.parametrize("n", [2, 5, 16, 17, 40, 300, 3000])
def test_native_matches_python_mirror(n):
    rng = random.Random(n)
    headers = _random_labels(rng, n)
    hdr_bytes = [h.encode() for h in headers]
    # heavy mass ties: only a few distinct masses
    masses = [rng.choice([5, 5, 5, 7, 9]) for _ in range(n)]
    seeds = list(zip(range(n), masses))

    def strcmp_glibc(a, b):
        for x, y in zip(a, b):
            if x != y:
                return x - y
        return len(a) - len(b)

    def lt(lhs, rhs):
        if lhs[1] != rhs[1]:
            return lhs[1] > rhs[1]
        return strcmp_glibc(hdr_bytes[lhs[0]], hdr_bytes[rhs[0]]) == -1

    expected = list(seeds)
    stdcxx_sort(expected, lt)

    arena_bytes = np.frombuffer(b"".join(hdr_bytes), dtype=np.uint8)
    lens = np.array([len(h) for h in hdr_bytes], dtype=np.int64)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    arena = type("A", (), {"arena": arena_bytes, "hdr_off": offs, "hdr_len": lens})
    mass_arr = np.array(masses, dtype=np.int64)
    seed_arr = np.arange(n, dtype=np.int64)
    assert _native.sort_seeds_stdcxx(mass_arr, seed_arr, arena)
    got = list(zip(seed_arr.tolist(), mass_arr.tolist()))
    assert got == expected


def _tie_corpus(seed, n, length=70):
    """n dissimilar singleton amplicons, all abundance 1: at d>=2 most
    end up as their own swarm and every swarm mass ties."""
    rng = random.Random(seed)
    labels = _random_labels(rng, n)
    seqs = set()
    while len(seqs) < n:
        seqs.add(random_seq(rng, rng.randint(length - 5, length + 5)))
    return "".join(
        f">{label}\n{seq}\n" for label, seq in zip(labels, sorted(seqs))
    )


@pytest.mark.parametrize("n", [15, 60, 400])
def test_seeds_output_all_masses_tie(both, n):
    fasta = _tie_corpus(seed=1000 + n, n=n)
    both.compare(
        ["-d", "2", "-o", "out.txt", "-w", "seeds.fasta", "-u", "uclust.txt",
         "-s", "stats.txt"],
        fasta,
    )


def test_seeds_output_tie_heavy_d3(both):
    fasta = _tie_corpus(seed=77, n=120, length=40)
    both.compare(["-d", "3", "-o", "out.txt", "-w", "seeds.fasta"], fasta)
