"""d>=2 clustering parity against the reference binary."""

import pytest

from genfasta import amplicon_cloud

ALL_OUTPUTS = [
    "-o", "out.txt",
    "-s", "stats.txt",
    "-u", "uclust.txt",
    "-i", "structure.txt",
    "-w", "seeds.fasta",
    "-l", "log.txt",
]


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_d2_all_outputs(both, seed):
    fasta = amplicon_cloud(seed=seed, n_centers=5, cloud_size=15, length=60, max_edits=3)
    both.compare(["-d", "2"] + ALL_OUTPUTS, fasta)


def test_d3(both):
    fasta = amplicon_cloud(seed=34, n_centers=4, cloud_size=15, length=60, max_edits=4)
    both.compare(["-d", "3"] + ALL_OUTPUTS, fasta)


def test_d5(both):
    fasta = amplicon_cloud(seed=35, n_centers=3, cloud_size=12, length=50, max_edits=6)
    both.compare(["-d", "5"] + ALL_OUTPUTS, fasta)


def test_d2_custom_scores(both):
    fasta = amplicon_cloud(seed=36, n_centers=4, cloud_size=10, length=50, max_edits=3)
    both.compare(
        ["-d", "2", "-m", "2", "-p", "3", "-g", "6", "-e", "2"] + ALL_OUTPUTS, fasta
    )


def test_d2_16bit_mode(both):
    # high d forces 16-bit kernel in the reference
    fasta = amplicon_cloud(seed=37, n_centers=2, cloud_size=10, length=50, max_edits=8)
    both.compare(["-d", "30"] + ALL_OUTPUTS, fasta)


def test_d2_no_otu_breaking(both):
    fasta = amplicon_cloud(seed=38, n_centers=4, cloud_size=10, length=50, max_edits=3)
    both.compare(["-d", "2", "-n"] + ALL_OUTPUTS, fasta)


def test_d2_mothur(both):
    fasta = amplicon_cloud(seed=39, n_centers=3, cloud_size=8, length=50, max_edits=3)
    both.compare(["-d", "2", "-r", "-o", "out.txt", "-l", "log.txt"], fasta)


def test_d2_equal_abundance_seed_ties(both):
    # equal masses exercise the reference's quirky seed tie comparator
    fasta = (
        ">a_5\nACGTACGTACGTACGTACGT\n"
        ">b_5\nTTTTGGGGCCCCAAAATTTT\n"
        ">c_5\nGGGGGGGGGGGGGGGGGGGG\n"
        ">d_5\nACACACACACACACACACAC\n"
    )
    both.compare(["-d", "2"] + ALL_OUTPUTS, fasta)


def test_d2_varied_lengths(both):
    fasta = amplicon_cloud(seed=40, n_centers=4, cloud_size=12, length=30, max_edits=5)
    both.compare(["-d", "4"] + ALL_OUTPUTS, fasta)
