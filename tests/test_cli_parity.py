"""CLI and error-path parity against the reference binary."""

import pytest

TINY = ">a_5\nACGT\n>b_3\nACGG\n"


@pytest.mark.parametrize(
    "args",
    [
        ["-v"],
        ["--version"],
        ["-h"],
        ["--help"],
        ["-k"],  # invalid option
        ["--frobnicate"],  # unrecognized
        ["--frobnicate=3"],
        ["-t"],  # missing argument
        ["--threads"],
        ["--thr"],  # abbreviated, missing argument
        ["--b"],  # ambiguous
        ["--b=3"],
        ["--version=x"],  # unexpected argument
        ["-t", "2", "-t", "3"],  # duplicate option
        ["--threads", "2", "-t", "3"],
        ["-t", "0"],
        ["-t", "513"],
        ["-t", "abc"],
        ["-t", "2x"],
        ["-t", ""],
        ["-d", "-1"],
        ["-d", "256"],
        ["-d", "0", "-f"],
        ["-d", "2", "-f"],
        ["-x"],  # disable-sse3 with d<2
        ["-b", "4"],  # boundary without fastidious
        ["-c", "100"],
        ["-y", "12"],
        ["-d", "1", "-m", "3"],  # alignment options with d<2
        ["-d", "1", "-p", "3"],
        ["-d", "1", "-g", "3"],
        ["-d", "1", "-e", "3"],
        ["-d", "2", "-g", "-1"],
        ["-d", "2", "-e", "-1"],
        ["-d", "2", "-g", "0", "-e", "0"],
        ["-d", "2", "-m", "0"],
        ["-d", "2", "-p", "0"],
        ["-f", "-b", "1"],
        ["-f", "-c", "39"],
        ["-f", "-c", "1073741825"],
        ["-f", "-y", "1"],
        ["-f", "-y", "65"],
        ["-a", "0"],
        ["-j", "net.txt", "-d", "2"],
        ["-d", "255"],  # resolution too high for default scoring
        ["-d", "2", "-m", "120", "-p", "120"],  # mismatch penalty > 255
        ["doesnotexist.fasta"],
    ],
)
def test_cli_errors(both, args):
    both.compare(args, None, stdin_data=b"")


def test_empty_input_d0(both):
    both.compare(["-d", "0", "-o", "out.txt", "-l", "log.txt"], "")


def test_stdin_not_regular(both):
    both.compare(["-d", "0", "-o", "out.txt", "-l", "log.txt"], None, stdin_data=TINY.encode())


@pytest.mark.parametrize(
    "fasta",
    [
        "not a fasta\n",
        ">a_5\n",  # empty sequence at EOF
        ">a_5\n>b_3\nACGT\n",  # empty sequence mid-file
        ">a_5\nAXGT\n",  # illegal character
        ">a_5\nAC GT\n",  # space in sequence
        ">a_5\nACGT\n>a_3\nACGG\n",  # duplicate identifier
        ">a_0\nACGT\n",  # zero abundance
        ">a\nACGT\n",  # missing abundance
        ">a\nACGT\n>b\nACGG\n",
        ">_5\nACGT\n",  # empty identifier
        "\n>a_5\nACGT\n",  # leading empty line
        ">a_5\r\nACGT\r\n",  # CRLF
        ">a_5 comment text\nACGT\n",  # header with comment
        ">a_5\nacgu\n",  # lowercase + U
        ">a_5\nACGT\n\n>b_3\nACGG\n",  # blank line between records
        ">a_5\nACG\nT\n>b_3\nACGG\n",  # multi-line sequence
    ],
)
def test_fasta_error_and_edge_parity(both, fasta):
    both.compare(["-d", "0", "-o", "out.txt", "-l", "log.txt"], fasta)


@pytest.mark.parametrize(
    "fasta",
    [
        ">a;size=5;\nACGT\n>b;size=3\nACGG\n",
        ">size=5;a\nACGT\n>size=3;b\nACGG\n",
        ">x;size=0;\nACGT\n",
        ">a\nACGT\n",
    ],
)
def test_usearch_abundance_parity(both, fasta):
    both.compare(["-z", "-d", "0", "-o", "out.txt", "-l", "log.txt"], fasta)


def test_append_abundance(both):
    fasta = ">a\nACGT\n>b_3\nACGG\n"
    both.compare(["-a", "7", "-d", "0", "-o", "out.txt", "-l", "log.txt", "-w", "seeds.fasta"], fasta)
