"""Black-box differential test cases: swarm_tpu vs the reference binary.

The upstream project is validated by frederic-mahe/swarm-tests (806
shell-driven black-box tests, wired in at
/root/reference/.travis.yml:14-18); that corpus is not vendorable in
this offline environment, so this module reconstructs the same
acceptance bar: a generated battery covering the identical behavior
surface — option validation (src/swarm.cc:486-630), fasta/abundance
parsing (src/db.cc:161-383, 432-803), all output writers, all three
engines, fastidious, and the error paths — executed side by side
against the reference binary with byte-exact comparison of exit code,
stdout, stderr, and every output file (no per-case expected values:
agreement with the binary is the oracle, exactly as in swarm-tests).

Every case is a dict: name, args (list of str), fasta (bytes|None),
stdin (bytes|None). A None fasta means no input file argument is
appended (the case supplies its own positional args or reads stdin).
"""

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from genfasta import amplicon_cloud, mutate, random_seq  # noqa: E402


def _fa(records):
    """records: list of (header, seq) -> fasta bytes."""
    out = []
    for hdr, seq in records:
        out.append(f">{hdr}\n{seq}\n")
    return "".join(out).encode()


# --- standard corpora ---------------------------------------------------

STD = amplicon_cloud(seed=11, n_centers=6, cloud_size=12, length=60).encode()
STDZ = amplicon_cloud(
    seed=12, n_centers=6, cloud_size=12, length=60, usearch=True
).encode()
TINY = _fa([("a_5", "ACGTACGTAC"), ("b_3", "ACGTACGTAT"), ("c_1", "TTTTTTTTTT")])
# a chain a-b-c-d of single edits with descending abundance: exercises
# the d=1 breaking rule (attach iff seed abundance >= candidate)
CHAIN = _fa([
    ("a_100", "ACGTACGTACGTACGTACGT"),
    ("b_50", "ACGTACGTACGTACGTACGA"),
    ("c_10", "ACGTACGTACGTACGTACAA"),
    ("d_60", "ACGTACGTACGTACGTAAAA"),  # higher abundance than its only link
    ("e_1", "GGGGGGGGGGGGGGGGGGGG"),
])
# ties everywhere: ordering falls back to header strcmp
TIES = _fa([
    ("t3_7", "AAAAACCCCCGGGGGTTTTT"),
    ("t1_7", "AAAAACCCCCGGGGGTTTTA"),
    ("t2_7", "AAAAACCCCCGGGGGTTTAA"),
    ("t0_7", "CCCCCAAAAATTTTTGGGGG"),
])
SINGLETONS = _fa([(f"s{i}_1", random_seq(random.Random(100 + i), 40))
                  for i in range(12)])
# light + heavy swarms for fastidious (boundary default 3)
FAST = amplicon_cloud(seed=13, n_centers=10, cloud_size=6, length=50,
                      max_abundance=4).encode()
LONG = _fa([
    ("l1_9", random_seq(random.Random(1), 900)),
    ("l2_5", mutate(random_seq(random.Random(1), 900), random.Random(2), 2)),
    ("l3_2", random_seq(random.Random(3), 700)),
])

CORPORA = {
    "std": STD, "stdz": STDZ, "tiny": TINY, "chain": CHAIN,
    "ties": TIES, "singles": SINGLETONS, "fast": FAST, "long": LONG,
}


def meta_cases():
    yield dict(name="version-short", args=["-v"], fasta=None)
    yield dict(name="version-long", args=["--version"], fasta=None)
    yield dict(name="help-short", args=["-h"], fasta=None)
    yield dict(name="help-long", args=["--help"], fasta=None)
    yield dict(name="unknown-short", args=["-Q"], fasta=TINY)
    yield dict(name="unknown-long", args=["--bogus"], fasta=TINY)
    yield dict(name="unknown-long-with-value", args=["--bogus=3"], fasta=TINY)
    yield dict(name="missing-value-d", args=["-d"], fasta=None)
    yield dict(name="missing-value-o", args=["-o"], fasta=None)
    yield dict(name="two-positional", args=["a.fasta", "b.fasta"], fasta=TINY)
    yield dict(name="nonexistent-input", args=["no_such_file.fasta"],
               fasta=None)
    yield dict(name="empty-file", args=[], fasta=b"")
    yield dict(name="stdin-dash", args=["-"], fasta=None,
               stdin=TINY)
    yield dict(name="stdin-dash-empty", args=["-"], fasta=None, stdin=b"")
    yield dict(name="stdin-dash-d0", args=["-d", "0", "-"], fasta=None,
               stdin=TINY)
    yield dict(name="double-dash-then-file", args=["--"], fasta=TINY)
    yield dict(name="abbrev-long-unambig", args=["--vers"], fasta=None)
    yield dict(name="abbrev-long-ambig", args=["--s", "x.txt"], fasta=TINY)
    yield dict(name="bundled-short-flags", args=["-zn"], fasta=STDZ)
    yield dict(name="long-with-equals", args=["--differences=2"], fasta=STD)
    yield dict(name="output-to-dash", args=["-o", "-"], fasta=TINY)
    yield dict(name="log-to-dash", args=["-l", "-"], fasta=TINY)
    yield dict(name="version-wins-over-input", args=["-v", "no_file.fasta"],
               fasta=None)
    yield dict(name="opt-after-positional", args=["input.fasta", "-d", "0"],
               fasta=TINY)


_NUMERIC_SWEEPS = [
    # (short flag, long name, values, extra args, fasta)
    ("-d", "differences",
     ["-1", "0", "1", "2", "3", "255", "256", "99999999999999999999",
      "abc", "", "2.5", " 2", "0x2", "+2"], [], STD),
    ("-t", "threads",
     ["0", "1", "2", "8", "512", "513", "-3", "abc", ""], [], TINY),
    ("-b", "boundary",
     ["-1", "0", "1", "2", "3", "4", "100", "abc", ""], ["-f"], FAST),
    ("-c", "ceiling",
     ["-1", "0", "1", "39", "40", "41", "1073741824", "1073741825",
      "abc", ""], ["-f"], FAST),
    ("-y", "bloom-bits",
     ["0", "1", "2", "3", "8", "16", "32", "64", "65", "abc", ""],
     ["-f"], FAST),
    ("-a", "append-abundance",
     ["-1", "0", "1", "2", "9223372036854775807", "abc", ""], [], TINY),
    ("-m", "match-reward",
     ["-2", "0", "1", "2", "5", "100", "255", "abc", ""], ["-d", "2"], STD),
    ("-p", "mismatch-penalty",
     ["-2", "0", "1", "4", "100", "abc", ""], ["-d", "2"], STD),
    ("-g", "gap-opening-penalty",
     ["-1", "0", "1", "12", "100", "abc", ""], ["-d", "2"], STD),
    ("-e", "gap-extension-penalty",
     ["-1", "0", "1", "4", "100", "abc", ""], ["-d", "2"], STD),
]


def numeric_cases():
    for short, longname, values, extra, fasta in _NUMERIC_SWEEPS:
        for v in values:
            tag = v if v.strip() else f"blank{len(v)}"
            yield dict(name=f"num{short}-{tag}", args=extra + [short, v],
                       fasta=fasta)
            yield dict(name=f"num--{longname}-{tag}",
                       args=extra + [f"--{longname}={v}"], fasta=fasta)
    # duplicate-option detection (each option may be given only once)
    for args in (["-d", "1", "-d", "1"], ["-t", "1", "-t", "2"],
                 ["-f", "-f"], ["-z", "-z"], ["-n", "-n"],
                 ["-o", "x.txt", "-o", "y.txt"],
                 ["-d", "2", "-m", "5", "-m", "5"],
                 ["-l", "a.log", "-l", "b.log"],
                 ["-d", "1", "--differences", "1"]):
        yield dict(name="dup-" + "".join(args[:3]).replace("/", ""),
                   args=args, fasta=TINY)


def constraint_cases():
    # fastidious requires d=1; alignment options require d>1; network d=1
    for d in ("0", "2", "3"):
        yield dict(name=f"f-with-d{d}", args=["-d", d, "-f"], fasta=STD)
    for opt, val in (("-b", "3"), ("-c", "100"), ("-y", "12")):
        yield dict(name=f"{opt}-without-f", args=[opt, val], fasta=STD)
        yield dict(name=f"{opt}-without-f-d0",
                   args=["-d", "0", opt, val], fasta=STD)
    for opt, val in (("-m", "5"), ("-p", "4"), ("-g", "12"), ("-e", "4")):
        yield dict(name=f"{opt}-with-d1", args=["-d", "1", opt, val],
                   fasta=STD)
        yield dict(name=f"{opt}-with-d0", args=["-d", "0", opt, val],
                   fasta=STD)
    for d in ("0", "2"):
        yield dict(name=f"j-with-d{d}",
                   args=["-d", d, "-j", "net.txt"], fasta=STD)
    yield dict(name="n-with-d0", args=["-d", "0", "-n"], fasta=STD)
    yield dict(name="n-with-d2", args=["-d", "2", "-n"], fasta=STD)
    # 16-bit score saturation check (src/swarm.cc:618-629)
    yield dict(name="saturation-big-scores",
               args=["-d", "255", "-m", "100", "-p", "100", "-g", "100",
                     "-e", "100"], fasta=STD)
    yield dict(name="saturation-boundary",
               args=["-d", "255", "-m", "1", "-p", "1", "-g", "1", "-e", "1"],
               fasta=STD)
    yield dict(name="d0-with-u", args=["-d", "0", "-u", "u.txt"], fasta=STD)
    yield dict(name="d0-with-i", args=["-d", "0", "-i", "i.txt"], fasta=STD)
    yield dict(name="gcd-reduction",
               args=["-d", "2", "-m", "2", "-p", "6", "-g", "8", "-e", "2"],
               fasta=STD)
    yield dict(name="zero-mismatch-penalty-d2",
               args=["-d", "2", "-p", "0"], fasta=STD)


_HEADER_FORMS = [
    # (tag, header, needs_z)
    ("plain", "a_5", False),
    ("zero-ab", "a_0", False),
    ("neg-ab", "a_-1", False),
    ("leading-zero", "a_007", False),
    ("multi-underscore", "a_b_3", False),
    ("only-underscore-num", "_5", False),
    ("no-abundance", "a", False),
    ("trailing-underscore", "a_", False),
    ("huge-ab", "a_9223372036854775807", False),
    ("too-huge-ab", "a_99999999999999999999", False),
    ("size-mid", "a;size=5;b", True),
    ("size-end-semi", "a;size=5;", True),
    ("size-end-nosemi", "a;size=5", True),
    ("size-start", "size=5;a", True),
    ("size-zero", "a;size=0;", True),
    ("size-empty", "a;size=;", True),
    ("size-neg", "a;size=-2;", True),
    ("size-twice", "a;size=5;size=6;", True),
    ("size-no-prefix-semi", "asize=5;", True),
    ("size-huge", "a;size=9223372036854775807;", True),
    ("size-and-underscore", "a_3;size=5;", True),
    ("space-in-header", "a b_5", False),
    ("tab-in-header", "a\tb_5", False),
    ("semicolon-only", "a;b_5", False),
]


def abundance_cases():
    for tag, hdr, needs_z in _HEADER_FORMS:
        fasta = _fa([(hdr, "ACGTACGTACGT"), ("other_2", "TTTTGGGGCCCC")])
        base_args = ["-z"] if needs_z else []
        yield dict(name=f"ab-{tag}", args=base_args, fasta=fasta)
        yield dict(name=f"ab-{tag}-a2", args=base_args + ["-a", "2"],
                   fasta=fasta)
        if not needs_z:
            # the same header parsed under usearch rules
            yield dict(name=f"ab-{tag}-zmode", args=["-z"], fasta=fasta)
    # underscore abundance used in -z mode and vice versa
    yield dict(name="ab-z-with-underscore-only", args=["-z"],
               fasta=_fa([("a_5", "ACGTACGT"), ("b_1", "TTTTAAAA")]))
    yield dict(name="ab-underscore-mode-with-size-only", args=[],
               fasta=_fa([("a;size=5;", "ACGTACGT"), ("b;size=1;", "TTTTAAAA")]))
    # -w abundance rewriting both modes
    for z in ([], ["-z"]):
        corp = STDZ if z else STD
        yield dict(name=f"ab-w-rewrite{'-z' if z else ''}",
                   args=z + ["-w", "seeds.fasta"], fasta=corp)
        yield dict(name=f"ab-w-rewrite-a3{'-z' if z else ''}",
                   args=z + ["-a", "3", "-w", "seeds.fasta"],
                   fasta=_fa([("x", "ACGTACGTAA"), ("y_2", "ACGTACGTAT")])
                   if not z else
                   _fa([("x", "ACGTACGTAA"), ("y;size=2;", "ACGTACGTAT")]))


def fasta_format_cases():
    S = "ACGTACGTACGT"
    yield dict(name="fmt-crlf", args=[],
               fasta=f">a_5\r\n{S}\r\n>b_2\r\nTTTTGGGGAAAA\r\n".encode())
    yield dict(name="fmt-empty-lines", args=[],
               fasta=f">a_5\n{S}\n\n\n>b_2\nTTTTGGGGAAAA\n".encode())
    yield dict(name="fmt-multiline-seq", args=[],
               fasta=b">a_5\nACGTAC\nGTACGT\n>b_2\nTTTTGGGGAAAA\n")
    yield dict(name="fmt-lowercase", args=[],
               fasta=b">a_5\nacgtacgtacgt\n>b_2\nttttggggaaaa\n")
    yield dict(name="fmt-mixed-case", args=[],
               fasta=b">a_5\nAcGtAcGtAcGt\n>b_2\nTTttGGggAAaa\n")
    for ch in ("N", "U", "R", "X", "-", "*", " ", "0"):
        yield dict(name=f"fmt-badchar-{ord(ch)}", args=[],
                   fasta=f">a_5\nACGT{ch}ACGT\n".encode())
    yield dict(name="fmt-empty-seq", args=[],
               fasta=b">a_5\n\n>b_2\nACGTACGT\n")
    yield dict(name="fmt-empty-seq-last", args=[],
               fasta=b">a_5\nACGTACGT\n>b_2\n")
    yield dict(name="fmt-header-only", args=[], fasta=b">a_5\n")
    yield dict(name="fmt-no-gt-start", args=[], fasta=b"ACGTACGT\n")
    yield dict(name="fmt-blank-then-record", args=[],
               fasta=b"\n>a_5\nACGTACGT\n")
    yield dict(name="fmt-empty-header", args=[], fasta=b">\nACGTACGT\n")
    yield dict(name="fmt-gt-only-abund", args=[], fasta=b">_5\nACGTACGT\n")
    yield dict(name="fmt-no-final-newline", args=[],
               fasta=b">a_5\nACGTACGT\n>b_2\nTTTTAAAA")
    yield dict(name="fmt-long-header", args=[],
               fasta=(">" + "h" * 1000 + "_5\nACGTACGT\n").encode())
    yield dict(name="fmt-single-record", args=[], fasta=b">a_5\nACGTACGT\n")
    yield dict(name="fmt-single-base", args=[], fasta=b">a_5\nA\n")
    yield dict(name="fmt-8bit-header", args=[],
               fasta=b">a\xc3\xa9_5\nACGTACGT\n")
    yield dict(name="fmt-dos-eof-char", args=[],
               fasta=b">a_5\nACGTACGT\n\x1a")
    # duplicate handling
    dup_ids = _fa([("a_5", "ACGTACGT"), ("a_3", "TTTTAAAA")])
    dup_seqs = _fa([("a_5", "ACGTACGT"), ("b_3", "ACGTACGT")])
    for d in ("0", "1", "2"):
        yield dict(name=f"dup-ids-d{d}", args=["-d", d], fasta=dup_ids)
        yield dict(name=f"dup-seqs-d{d}", args=["-d", d], fasta=dup_seqs)
    # same ID different abundance annotations (IDs compared without them?)
    yield dict(name="dup-id-diff-ab", args=[],
               fasta=_fa([("a_5", "ACGTACGT"), ("a_7", "TTTTAAAA")]))


_OUTPUT_SETS = [
    ("stdout", []),
    ("ofile", ["-o", "out.txt"]),
    ("all", ["-o", "out.txt", "-s", "stats.txt", "-u", "uclust.txt",
             "-i", "structure.txt", "-w", "seeds.fasta", "-l", "log.txt"]),
    ("mothur", ["-r", "-o", "out.txt"]),
    ("mothur-log", ["-r", "-l", "log.txt"]),
    ("seeds-only", ["-w", "seeds.fasta", "-o", "out.txt"]),
    ("stats-log", ["-s", "stats.txt", "-l", "log.txt"]),
]


def writer_cases():
    for cname, corpus in CORPORA.items():
        zflag = ["-z"] if cname == "stdz" else []
        for d in ("0", "1", "2", "3"):
            for sname, outset in _OUTPUT_SETS:
                # prune the matrix a little: mothur-log/stats-log/seeds
                # only on representative corpora
                if sname in ("mothur-log", "stats-log", "seeds-only") and \
                        cname not in ("std", "stdz", "ties"):
                    continue
                yield dict(name=f"wr-{cname}-d{d}-{sname}",
                           args=["-d", d] + zflag + list(outset),
                           fasta=corpus)
        # d=1 network dump
        yield dict(name=f"wr-{cname}-network",
                   args=["-d", "1"] + zflag + ["-j", "network.txt",
                                               "-o", "out.txt"],
                   fasta=corpus)
        # no-otu-breaking at d=1 and d=2
        yield dict(name=f"wr-{cname}-d1-n",
                   args=["-d", "1", "-n"] + zflag + ["-o", "out.txt",
                                                     "-s", "stats.txt"],
                   fasta=corpus)
        # append-abundance pathway
        yield dict(name=f"wr-{cname}-a7",
                   args=["-a", "7"] + zflag + ["-o", "out.txt",
                                               "-w", "seeds.fasta"],
                   fasta=corpus)


def fastidious_cases():
    allout = ["-o", "out.txt", "-s", "stats.txt", "-u", "uclust.txt",
              "-i", "structure.txt", "-w", "seeds.fasta", "-l", "log.txt"]
    for bname, extra in (
        ("plain", []),
        ("b2", ["-b", "2"]),
        ("b4", ["-b", "4"]),
        ("b1000", ["-b", "1000"]),  # everything light
        ("y2", ["-y", "2"]),
        ("y4", ["-y", "4"]),
        ("y64", ["-y", "64"]),
        ("c40", ["-c", "40"]),
        ("c1024", ["-c", "1024"]),
        ("c40-y4", ["-c", "40", "-y", "4"]),
    ):
        yield dict(name=f"fast-{bname}", args=["-f"] + extra + allout,
                   fasta=FAST)
    yield dict(name="fast-singletons", args=["-f"] + allout,
               fasta=SINGLETONS)
    yield dict(name="fast-all-heavy", args=["-f", "-b", "1"] + allout,
               fasta=FAST)
    yield dict(name="fast-chain", args=["-f"] + allout, fasta=CHAIN)
    yield dict(name="fast-ties", args=["-f"] + allout, fasta=TIES)
    yield dict(name="fast-z", args=["-f"] + allout + ["-z"], fasta=STDZ)
    yield dict(name="fast-n", args=["-f", "-n"] + allout, fasta=FAST)


def scoring_cases():
    combos = [
        ("default", []),
        ("m2p3g6e2", ["-m", "2", "-p", "3", "-g", "6", "-e", "2"]),
        ("m1p1g1e1", ["-m", "1", "-p", "1", "-g", "1", "-e", "1"]),
        ("m10p10g10e10", ["-m", "10", "-p", "10", "-g", "10", "-e", "10"]),
        ("g0e4", ["-g", "0", "-e", "4"]),
        ("g12e0", ["-g", "12", "-e", "0"]),
        ("m5p4g0e0", ["-g", "0", "-e", "0"]),
        ("asym", ["-m", "3", "-p", "7", "-g", "11", "-e", "3"]),
    ]
    for d in ("2", "3", "5"):
        for tag, extra in combos:
            yield dict(name=f"score-d{d}-{tag}",
                       args=["-d", d] + extra + ["-o", "out.txt",
                                                 "-s", "stats.txt",
                                                 "-u", "uclust.txt"],
                       fasta=STD)


def fuzz_cases(count=320):
    """Seeded random corpora x random valid option sets."""
    for seed in range(count):
        rng = random.Random(9000 + seed)
        d = rng.choice([0, 1, 1, 1, 2, 2, 3])
        corpus = amplicon_cloud(
            seed=5000 + seed,
            n_centers=rng.randint(1, 8),
            cloud_size=rng.randint(1, 15),
            length=rng.randint(20, 120),
            max_edits=rng.randint(1, 4),
            usearch=rng.random() < 0.3,
            max_abundance=rng.choice([1, 3, 10, 1000]),
        ).encode()
        args = ["-d", str(d)]
        if b"size=" in corpus:
            args.append("-z")
        if d == 1 and rng.random() < 0.35:
            args.append("-f")
            if rng.random() < 0.4:
                args += ["-b", str(rng.randint(2, 8))]
            if rng.random() < 0.3:
                args += ["-y", str(rng.choice([2, 4, 8, 16, 32]))]
        if d >= 2 and rng.random() < 0.4:
            args += ["-m", str(rng.randint(1, 6)),
                     "-p", str(rng.randint(1, 6))]
            if rng.random() < 0.5:
                args += ["-g", str(rng.randint(0, 15)),
                         "-e", str(rng.randint(0, 6))]
        if rng.random() < 0.3:
            args.append("-n")
        if rng.random() < 0.2:
            args.append("-r")
        outs = rng.sample(
            [["-o", "out.txt"], ["-s", "stats.txt"], ["-u", "uclust.txt"],
             ["-i", "structure.txt"], ["-w", "seeds.fasta"],
             ["-l", "log.txt"]],
            k=rng.randint(1, 4),
        )
        for o in outs:
            args += o
        if d == 1 and rng.random() < 0.15:
            args += ["-j", "network.txt"]
        if rng.random() < 0.15:
            args += ["-a", str(rng.randint(1, 9))]
        yield dict(name=f"fuzz-{seed}", args=args, fasta=corpus)


def all_cases():
    cases = []
    for gen in (meta_cases, numeric_cases, constraint_cases,
                abundance_cases, fasta_format_cases, writer_cases,
                fastidious_cases, scoring_cases, fuzz_cases):
        cases.extend(gen())
    names = [c["name"] for c in cases]
    dupes = {n for n in names if names.count(n) > 1}
    assert not dupes, f"duplicate case names: {sorted(dupes)[:10]}"
    return cases


if __name__ == "__main__":
    cs = all_cases()
    print(f"{len(cs)} cases")
