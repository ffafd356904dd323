#!/usr/bin/env python3
"""Build a sorted amplicon contingency table from per-sample fasta files.

Companion analysis script (equivalent of the reference's
scripts/amplicon_contingency_table.py, reimplemented): each input fasta
is one sample (named after the file, extension stripped); headers carry
usearch-style abundances (`>id;size=N`). Output (stdout) is a
tab-separated table: amplicon id, one column per sample, and the row
total, sorted by decreasing total abundance then amplicon id.

Usage: python3 amplicon_contingency_table.py samples_*.fas
"""

import os
import sys
from collections import defaultdict

SEPARATOR = ";size="


def read_samples(paths):
    totals = defaultdict(int)
    per_sample = defaultdict(dict)
    sample_seen = defaultdict(int)
    for path in paths:
        sample = os.path.splitext(os.path.basename(path))[0]
        sample_seen[sample] += 1
        with open(path) as handle:
            for line in handle:
                if not line.startswith(">"):
                    continue
                header = line[1:].rstrip("\n").rstrip(";")
                amplicon, _, size_text = header.rpartition(SEPARATOR)
                abundance = int(size_text)
                row = per_sample[amplicon]
                row[sample] = row.get(sample, 0) + abundance
                totals[amplicon] += abundance

    duplicates = [s for s, k in sample_seen.items() if k > 1]
    if duplicates:
        print("Warning: some samples are duplicated", file=sys.stderr)
        print("\n".join(duplicates), file=sys.stderr)
    return totals, per_sample, sorted(sample_seen)


def main(argv):
    if not argv:
        print(__doc__.strip(), file=sys.stderr)
        return 1
    totals, per_sample, samples = read_samples(argv)

    print("amplicon", "\t".join(samples), "total", sep="\t")
    # ties sort by decreasing id after decreasing abundance (reverse of
    # an (abundance, id) ascending sort)
    order = sorted(totals.items(), key=lambda kv: (kv[1], kv[0]))
    order.reverse()
    for amplicon, total in order:
        counts = [per_sample[amplicon].get(s, 0) for s in samples]
        if sum(counts) != total:
            print(
                "Abundance sum is not correct for this amplicon",
                amplicon, total, sum(counts), file=sys.stderr,
            )
            return -1
        print(amplicon, "\t".join(map(str, counts)), total, sep="\t")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
