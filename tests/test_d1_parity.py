"""d=1 clustering parity against the reference binary."""

import pytest

from genfasta import amplicon_cloud, with_duplicates

ALL_OUTPUTS = [
    "-o", "out.txt",
    "-s", "stats.txt",
    "-u", "uclust.txt",
    "-i", "structure.txt",
    "-w", "seeds.fasta",
    "-j", "network.txt",
    "-l", "log.txt",
]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_d1_all_outputs(both, seed):
    fasta = amplicon_cloud(seed=seed, n_centers=6, cloud_size=20, length=70, max_edits=2)
    both.compare(ALL_OUTPUTS, fasta)


def test_d1_dense_cloud(both):
    # many 1-edit chains: exercises multi-generation growth
    fasta = amplicon_cloud(seed=11, n_centers=2, cloud_size=60, length=40, max_edits=1)
    both.compare(ALL_OUTPUTS, fasta)


def test_d1_uclust_batch_escalation(both):
    # members 17+ generations of pure deletions below their seed:
    # |len(seed) - len(member)| > 16 exceeds the 16-lane batch's FCAP
    # envelope, so these H-lines must escalate through the scalar
    # banded ladder / full NW — byte parity proves the handoff
    import random

    from genfasta import random_seq

    rng = random.Random(5150)
    records = []
    idx = 0
    for _ in range(3):
        seq = random_seq(rng, 160)
        chain = [seq]
        for _ in range(24):  # successive single deletions
            parent = chain[-1]
            p = rng.randrange(len(parent))
            chain.append(parent[:p] + parent[p + 1 :])
        # abundance descends along the chain so the longest is the seed
        for k, s in enumerate(chain):
            records.append(f">e{idx}_{1000 - 10 * k}\n{s}\n")
            idx += 1
    # pad with unrelated amplicons so the >=64-member batch pre-pass runs
    seen = set(r.split("\n")[1] for r in records)
    while idx < 220:
        s = random_seq(rng, rng.randint(140, 170))
        if s in seen:
            continue
        seen.add(s)
        records.append(f">p{idx}_{rng.randint(1, 900)}\n{s}\n")
        idx += 1
    rng.shuffle(records)
    both.compare(ALL_OUTPUTS, "".join(records))


def test_d1_uclust_batch_aligner(both):
    # >64 members with indel-rich mutation CHAINS: multi-generation
    # swarms whose H-lines carry real insertions/deletions, so the
    # 16-lane batched banded aligner (uclust_align_batch16) owns most
    # of the uclust writer's alignments rather than the substitution
    # fast path; output must stay byte-identical to the reference
    import random

    from genfasta import mutate, random_seq

    rng = random.Random(77)
    seen = set()
    records = []
    idx = 0
    for _ in range(12):
        chain = [random_seq(rng, rng.randint(120, 160))]
        for _ in range(59):
            parent = chain[rng.randrange(len(chain))]
            chain.append(mutate(parent, rng, 1))
        for seq in chain:
            if seq in seen:
                continue
            seen.add(seq)
            records.append(f">c{idx}_{rng.randint(1, 500)}\n{seq}\n")
            idx += 1
    rng.shuffle(records)
    both.compare(ALL_OUTPUTS, "".join(records))


def test_d1_duplicate_sequences_fatal(both):
    both.compare(["-o", "out.txt", "-l", "log.txt"], with_duplicates())


def test_d1_no_otu_breaking(both):
    fasta = amplicon_cloud(seed=12, n_centers=3, cloud_size=30, length=50, max_edits=1)
    both.compare(["-n"] + ALL_OUTPUTS, fasta)


def test_d1_mothur(both):
    fasta = amplicon_cloud(seed=13, n_centers=3, cloud_size=15, length=50)
    both.compare(["-r", "-o", "out.txt", "-l", "log.txt"], fasta)


def test_d1_equal_abundances(both):
    # equal abundances: bidirectional edges, header-based tie order
    fasta = amplicon_cloud(seed=14, n_centers=2, cloud_size=25, length=40,
                           max_edits=1, max_abundance=2)
    both.compare(ALL_OUTPUTS, fasta)


def test_d1_usearch(both):
    fasta = amplicon_cloud(seed=15, n_centers=3, cloud_size=15, length=50, usearch=True)
    both.compare(["-z"] + ALL_OUTPUTS, fasta)


def test_d1_short_sequences(both):
    fasta = ">a_9\nAC\n>b_5\nAG\n>c_3\nA\n>d_2\nACG\n>e_1\nC\n"
    both.compare(ALL_OUTPUTS, fasta)


@pytest.mark.parametrize("seed", [21, 22])
def test_d1_fastidious(both, seed):
    fasta = amplicon_cloud(seed=seed, n_centers=8, cloud_size=8, length=60,
                           max_edits=2, max_abundance=50)
    both.compare(["-f"] + ALL_OUTPUTS, fasta)


def test_d1_fastidious_boundary(both):
    fasta = amplicon_cloud(seed=23, n_centers=8, cloud_size=8, length=60,
                           max_edits=2, max_abundance=20)
    both.compare(["-f", "-b", "10"] + ALL_OUTPUTS, fasta)


def test_d1_fastidious_bloom_bits(both):
    fasta = amplicon_cloud(seed=24, n_centers=6, cloud_size=6, length=50,
                           max_edits=2, max_abundance=10)
    both.compare(["-f", "-y", "8"] + ALL_OUTPUTS, fasta)


def test_fastidious_graft_heavy_all_outputs(both):
    """Graft-dense corpus (many singleton light swarms near heavy
    seeds) through every writer — exercises the native grafted-path
    swarms/uclust/stats writers."""
    from genfasta import amplicon_cloud

    fasta = amplicon_cloud(seed=451, n_centers=15, cloud_size=40,
                           length=60, max_edits=4, max_abundance=6)
    both.compare(
        ["-f", "-b", "4", "-o", "out.txt", "-s", "stats.txt",
         "-u", "uclust.txt", "-i", "structure.txt", "-w", "seeds.fasta"],
        fasta,
    )
