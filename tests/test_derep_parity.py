"""d=0 dereplication parity against the reference binary."""

import pytest

from genfasta import amplicon_cloud, with_duplicates

ALL_OUTPUTS = [
    "-o", "out.txt",
    "-s", "stats.txt",
    "-u", "uclust.txt",
    "-i", "structure.txt",
    "-w", "seeds.fasta",
    "-l", "log.txt",
]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_derep_all_outputs(both, seed):
    fasta = amplicon_cloud(seed=seed, n_centers=5, cloud_size=10, length=60)
    both.compare(["-d", "0"] + ALL_OUTPUTS, fasta)


def test_derep_with_duplicate_sequences(both):
    # duplicates are allowed (and merged) when d=0
    both.compare(["-d", "0"] + ALL_OUTPUTS, with_duplicates())


def test_derep_mothur(both):
    fasta = amplicon_cloud(seed=4, n_centers=4, cloud_size=6, length=50)
    both.compare(["-d", "0", "-r", "-o", "out.txt", "-l", "log.txt"], fasta)


def test_derep_usearch_style(both):
    fasta = amplicon_cloud(seed=5, n_centers=4, cloud_size=6, length=50, usearch=True)
    both.compare(["-z", "-d", "0"] + ALL_OUTPUTS, fasta)


def test_derep_equal_abundance_ties(both):
    # abundance ties exercise the header-lexicographic sort order
    fasta = ">b_5\nACGT\n>a_5\nACGG\n>c_5\nACGA\n>d_5\nACGT\n>e_1\nTTTT\n"
    both.compare(["-d", "0"] + ALL_OUTPUTS, fasta)


def test_derep_stdout_output(both):
    fasta = amplicon_cloud(seed=6, n_centers=3, cloud_size=5, length=40)
    both.compare(["-d", "0", "-l", "log.txt"], fasta)
