#!/usr/bin/env python3
"""Visualize the internal structure of one swarm cluster.

Companion analysis script (equivalent of the reference's
scripts/graph_plot.py, reimplemented): takes the internal-structure
file (`swarm -i`) and the swarms file (`swarm -o`), picks the cluster
containing a seed (by rank with --cluster, or the cluster of a given
--seed id), and renders the microvariant graph with vertices colored by
abundance. Requires python-igraph; without it, emits a Graphviz DOT
file instead so the graph is still inspectable.

Usage:
  graph_plot.py --internal_structure FILE --swarms FILE
                (--cluster RANK | --seed ID) [--output out.pdf]
"""

import argparse
import sys


def parse_args(argv):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-i", "--internal_structure", required=True)
    ap.add_argument("-s", "--swarms", required=True)
    ap.add_argument("-c", "--cluster", type=int, default=0,
                    help="1-based cluster rank in the swarms file")
    ap.add_argument("-d", "--seed", default=None,
                    help="amplicon id whose cluster to plot")
    ap.add_argument("-o", "--output", default=None,
                    help="output image (pdf/png/svg) or .dot file")
    return ap.parse_args(argv)


def strip_abundance(name):
    if ";size=" in name:
        return name.split(";size=")[0], int(name.split(";size=")[1].rstrip(";"))
    if "_" in name:
        stem, _, ab = name.rpartition("_")
        if ab.isdigit():
            return stem, int(ab)
    return name, 1


def load_cluster(args):
    with open(args.swarms) as handle:
        clusters = [line.split() for line in handle if line.strip()]
    if args.seed is not None:
        wanted = None
        for members in clusters:
            names = {strip_abundance(m)[0] for m in members}
            if args.seed in names or members and args.seed == members[0]:
                wanted = members
                break
        if wanted is None:
            sys.exit(f"seed {args.seed!r} not found in any cluster")
    else:
        rank = max(args.cluster, 1)
        if rank > len(clusters):
            sys.exit(f"cluster rank {rank} out of range (n={len(clusters)})")
        wanted = clusters[rank - 1]
    return {strip_abundance(m)[0]: strip_abundance(m)[1] for m in wanted}


def load_edges(path, members):
    edges = []
    with open(path) as handle:
        for line in handle:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 3:
                continue
            a, b, diffs = parts[0], parts[1], parts[2]
            if a in members and b in members:
                edges.append((a, b, int(diffs)))
    return edges


def main(argv):
    args = parse_args(argv)
    members = load_cluster(args)
    edges = load_edges(args.internal_structure, members)
    names = sorted(members)

    try:
        from igraph import Graph, plot  # noqa: F401
    except ImportError:
        out = args.output or "cluster.dot"
        if not out.endswith(".dot"):
            out += ".dot"
        with open(out, "w") as fh:
            fh.write("graph cluster {\n")
            for name in names:
                fh.write(
                    f'  "{name}" [label="{name}\\n{members[name]}"];\n'
                )
            for a, b, d in edges:
                fh.write(f'  "{a}" -- "{b}" [label="{d}"];\n')
            fh.write("}\n")
        print(
            f"igraph not available; wrote Graphviz file {out} "
            f"({len(names)} vertices, {len(edges)} edges)",
            file=sys.stderr,
        )
        return 0

    from igraph import Graph, plot

    idx = {name: i for i, name in enumerate(names)}
    g = Graph([(idx[a], idx[b]) for a, b, _ in edges])
    g.vs["label"] = names
    abundances = [members[n] for n in names]
    top = max(abundances) if abundances else 1
    g.vs["size"] = [10 + 30 * (a / top) for a in abundances]
    layout = g.layout("fr")
    target = args.output or "cluster.pdf"
    plot(g, target, layout=layout, margin=40)
    print(f"wrote {target}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
