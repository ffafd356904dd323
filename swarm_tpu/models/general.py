"""d>=2 engine (reference: src/algo.cc).

Sequential seed/subseed growth over an order-maintained amplicon list,
with two batched device-friendly screens per subseed:
  1. qgram parity-profile lower bounds over the remaining pool;
  2. exact cost-space alignment diffs (search-kernel semantics) for
     survivors.
Both are pure functions of (subseed, target) so they batch freely; the
host replays the reference's array-rotation bookkeeping, which defines
member output order.
"""

import os
from typing import List

import numpy as np

from ..db import Db
from ..ops.neighbors import pad_codes
from ..ops.nw_scalar import nw
from ..ops.qgram import qgram_mindiff, qgram_profiles
from ..ops.search import search_diffs, set_bit_mode
from ..params import Parameters
from ..progress import Progress


class Amp:
    __slots__ = ("ampliconid", "diffestimate", "swarmid", "generation", "radius")

    def __init__(self, ampliconid: int):
        self.ampliconid = ampliconid
        self.diffestimate = 0
        self.swarmid = 0
        self.generation = 0
        self.radius = 0


def algo_run(p: Parameters, db: Db, progress: Progress) -> None:
    n = len(db)
    ua = p.opt_usearch_abundance
    aa = p.opt_append_abundance
    d = p.opt_differences
    abundances = db.abundances
    lengths = db.lengths

    max_len = max(int(db.longest), 1)
    padded = pad_codes(db.codes, db.offsets, db.lengths, max_len)

    progress.init("Find qgram vects: ", n)
    profiles = qgram_profiles(padded, lengths)
    progress.done()

    bit_mode = set_bit_mode(d, p.penalty_mismatch, p.penalty_gapopen, p.penalty_gapextend)

    # device screening: reject pairs whose alignment cost already proves
    # diff > d, then re-run the few survivors through the exact host
    # kernel (see ops/search_jax.py for the soundness argument)
    device_aligner = None
    backend = os.environ.get("SWARM_TPU_BACKEND", "auto")
    if backend in ("jax", "jax_probe", "jax_shard") or (
        backend == "auto" and n * max_len >= 4_000_000
    ):
        try:
            from ..ops.search_jax import DeviceAligner

            device_aligner = DeviceAligner(padded, lengths)
        except ImportError:
            device_aligner = None
    cutoff = d * max(p.penalty_mismatch, p.penalty_gapopen + p.penalty_gapextend)

    def _exact_diffs(seed_id: int, target_ids: np.ndarray):
        qseq = padded[seed_id, : lengths[seed_id]]
        rows = padded[target_ids]
        lens = lengths[target_ids]
        batch_max = int(lens.max())
        _, diffs, _ = search_diffs(
            qseq,
            rows[:, :batch_max],
            lens,
            p.penalty_mismatch,
            p.penalty_gapopen,
            p.penalty_gapextend,
            bit_mode,
        )
        return diffs

    def aligner(seed_id: int, target_ids: np.ndarray):
        if (
            device_aligner is None
            or len(target_ids) < device_aligner.MIN_DEVICE_BATCH
        ):
            return _exact_diffs(seed_id, target_ids)
        scr = device_aligner.scores(
            seed_id, target_ids,
            p.penalty_mismatch, p.penalty_gapopen, p.penalty_gapextend,
        )
        diffs = np.full(len(target_ids), d + 1, dtype=np.int64)
        surv = np.nonzero(scr <= cutoff)[0]
        if len(surv):
            diffs[surv] = _exact_diffs(seed_id, target_ids[surv])
        return diffs

    amps: List[Amp] = [Amp(i) for i in range(n)]

    structure_out = []
    uclust_out = []
    stats_out = []

    largestswarm = 0
    maxgenerations = 0
    swarmid = 0
    seeded = 0
    swarmed = 0

    progress.init("Clustering:       ", n)
    while seeded < n:
        swarmid += 1

        swarmsize = 1
        amplicons_copies = 0
        singletons = 0
        hits = []
        maxradius = 0
        maxgen = 1

        seedindex = seeded
        seeded += 1
        amps[seedindex].swarmid = swarmid
        seedampliconid = amps[seedindex].ampliconid
        hits.append(seedampliconid)

        abundance = int(abundances[seedampliconid])
        amplicons_copies += abundance
        if abundance == 1:
            singletons += 1
        swarmed += 1

        # gen-1 candidates: whole remaining pool (abundance rule)
        pool_ids = np.array(
            [
                a.ampliconid
                for a in amps[swarmed:]
                if p.opt_no_cluster_breaking
                or abundances[a.ampliconid] <= abundance
            ],
            dtype=np.int64,
        )
        qdiffs = qgram_mindiff(profiles, seedampliconid, pool_ids)

        targetindices = []
        targetampliconids = []
        for i, poolampliconid in enumerate(pool_ids):
            amps[swarmed + i].diffestimate = int(qdiffs[i])
            if qdiffs[i] <= d:
                targetindices.append(swarmed + i)
                targetampliconids.append(int(poolampliconid))

        if targetindices:
            diffs = aligner(seedampliconid, np.array(targetampliconids, dtype=np.int64))

            for t_id in range(len(targetampliconids)):
                diff = int(diffs[t_id])
                if diff > d:
                    continue
                target = targetindices[t_id]
                # rotate target to the first unswarmed position
                if target > swarmed:
                    amps.insert(swarmed, amps.pop(target))
                entry = amps[swarmed]
                entry.swarmid = swarmid
                entry.generation = 1
                entry.radius = diff
                maxradius = max(maxradius, diff)
                poolampliconid = entry.ampliconid
                hits.append(poolampliconid)

                if p.opt_internal_structure:
                    structure_out.append(
                        f"{db.print_id_noabundance(seedampliconid, ua)}\t"
                        f"{db.print_id_noabundance(poolampliconid, ua)}\t"
                        f"{diff}\t{swarmid}\t1\n"
                    )

                abundance = int(abundances[poolampliconid])
                amplicons_copies += abundance
                if abundance == 1:
                    singletons += 1
                swarmsize += 1
                swarmed += 1

            while seeded < swarmed:
                subseed = amps[seeded]
                seeded += 1

                subseedabundance = int(abundances[subseed.ampliconid])
                sub_ids = []
                sub_indices = []
                for i in range(swarmed, n):
                    targetampliconid = amps[i].ampliconid
                    if amps[i].diffestimate <= subseed.radius + d and (
                        p.opt_no_cluster_breaking
                        or abundances[targetampliconid] <= subseedabundance
                    ):
                        sub_ids.append(targetampliconid)
                        sub_indices.append(i)

                qdiffs2 = qgram_mindiff(
                    profiles, subseed.ampliconid, np.array(sub_ids, dtype=np.int64)
                )
                targetindices = []
                targetampliconids = []
                for i in range(len(sub_ids)):
                    if qdiffs2[i] <= d:
                        targetindices.append(sub_indices[i])
                        targetampliconids.append(sub_ids[i])

                if not targetindices:
                    continue

                diffs = aligner(
                    subseed.ampliconid, np.array(targetampliconids, dtype=np.int64)
                )

                for t_id in range(len(targetampliconids)):
                    diff = int(diffs[t_id])
                    if diff > d:
                        continue
                    target = targetindices[t_id]

                    # find correct position: keep the newest generation
                    # ordered by amplicon id (src/algo.cc:205-219)
                    pos = swarmed
                    targetampliconid = amps[target].ampliconid
                    while (
                        pos > seeded
                        and amps[pos - 1].ampliconid > targetampliconid
                        and amps[pos - 1].generation > subseed.generation
                    ):
                        pos -= 1

                    if target > pos:
                        amps.insert(pos, amps.pop(target))
                    entry = amps[pos]
                    entry.swarmid = swarmid
                    entry.generation = subseed.generation + 1
                    maxgen = max(maxgen, entry.generation)
                    entry.radius = subseed.radius + diff
                    maxradius = max(maxradius, entry.radius)

                    poolampliconid = entry.ampliconid
                    hits.append(poolampliconid)

                    if p.opt_internal_structure:
                        structure_out.append(
                            f"{db.print_id_noabundance(subseed.ampliconid, ua)}\t"
                            f"{db.print_id_noabundance(poolampliconid, ua)}\t"
                            f"{diff}\t{swarmid}\t{subseed.generation + 1}\n"
                        )

                    abundance = int(abundances[poolampliconid])
                    amplicons_copies += abundance
                    if abundance == 1:
                        singletons += 1
                    swarmsize += 1
                    swarmed += 1

        largestswarm = max(largestswarm, swarmsize)
        maxgenerations = max(maxgenerations, maxgen)

        if p.uclustfile is not None:
            seed_id_str = db.print_id(seedampliconid, ua, aa)
            uclust_out.append(
                f"C\t{swarmid - 1}\t{swarmsize}\t*\t*\t*\t*\t*\t{seed_id_str}\t*\n"
            )
            uclust_out.append(
                f"S\t{swarmid - 1}\t{lengths[seedampliconid]}\t*\t*\t*\t*\t*\t"
                f"{seed_id_str}\t*\n"
            )
            qseq = db.sequence_codes(seedampliconid)
            for hit in hits[1:]:
                dseq = db.sequence_codes(hit)
                nwdiff, alen, cigar = nw(
                    dseq, qseq, p.penalty_mismatch, p.penalty_gapopen, p.penalty_gapextend
                )
                percentid = 100.0 * (alen - nwdiff) / alen
                uclust_out.append(
                    f"H\t{swarmid - 1}\t{lengths[hit]}\t{percentid:.1f}\t+\t0\t0\t"
                    f"{cigar if nwdiff > 0 else '='}\t"
                    f"{db.print_id(hit, ua, aa)}\t{seed_id_str}\n"
                )

        if p.statsfile is not None:
            abundance = int(abundances[seedampliconid])
            stats_out.append(
                f"{swarmsize}\t{amplicons_copies}\t"
                f"{db.print_id_noabundance(seedampliconid, ua)}\t"
                f"{abundance}\t{singletons}\t{maxgen}\t{maxradius}\n"
            )
        progress.update(seeded)
    progress.done()

    if p.opt_internal_structure:
        p.internal_structure_file.write("".join(structure_out))
    if p.uclustfile is not None:
        p.uclustfile.write("".join(uclust_out))
    if p.statsfile is not None:
        p.statsfile.write("".join(stats_out))

    # swarms output
    if n != 0:
        out = []
        if p.opt_mothur:
            out.append(f"swarm_{p.opt_differences}\t{swarmid}\t")
            previous_id = amps[0].swarmid
            out.append(db.print_id(amps[0].ampliconid, ua, aa))
            for i in range(1, n):
                current_id = amps[i].swarmid
                out.append("," if current_id == previous_id else "\t")
                out.append(db.print_id(amps[i].ampliconid, ua, aa))
                previous_id = current_id
            out.append("\n")
        else:
            previous_id = amps[0].swarmid
            out.append(db.print_id(amps[0].ampliconid, ua, aa))
            for i in range(1, n):
                current_id = amps[i].swarmid
                out.append(" " if current_id == previous_id else "\n")
                out.append(db.print_id(amps[i].ampliconid, ua, aa))
                previous_id = current_id
            out.append("\n")
        p.outfile.write("".join(out))

    # seeds
    if p.opt_seeds and n != 0:
        _write_seeds(p, db, progress, amps, n)

    p.logfile.write("\n")
    p.logfile.write(f"Number of swarms:  {swarmid}\n")
    p.logfile.write(f"Largest swarm:     {largestswarm}\n")
    p.logfile.write(f"Max generations:   {maxgenerations}\n")


def _write_seeds(p, db, progress, amps, n):
    """Collect per-swarm seeds+mass, sort, write (src/algo.cc:123-202).

    The reference's tie comparator tests `strcmp(...) == -1`, which with
    glibc is only true for specific byte differences; ties therefore
    frequently compare "equal" and keep std::sort's order. We replicate
    with a stable sort on the same comparator (exact for the insertion-
    sort regime used on small ranges; see docs/PARITY.md)."""
    import functools

    ua = p.opt_usearch_abundance

    progress.init("Collecting seeds:    ", n)
    seeds = []
    mass = 0
    previous_id = amps[0].swarmid
    seed = amps[0].ampliconid
    mass += int(db.abundances[seed])
    for i in range(1, n):
        current_id = amps[i].swarmid
        if current_id != previous_id:
            seeds.append((seed, mass))
            mass = 0
            seed = amps[i].ampliconid
        mass += int(db.abundances[amps[i].ampliconid])
        previous_id = current_id
        progress.update(i)
    seeds.append((seed, mass))
    progress.done()

    progress.init("Sorting seeds:    ", len(seeds))

    def strcmp_glibc(a: bytes, b: bytes) -> int:
        """glibc strcmp: difference of the first differing unsigned bytes."""
        for x, y in zip(a, b):
            if x != y:
                return x - y
        return len(a) - len(b)

    def compare(lhs, rhs) -> int:
        if lhs[1] > rhs[1]:
            return -1
        if lhs[1] < rhs[1]:
            return 1
        status = strcmp_glibc(db.headers[lhs[0]], db.headers[rhs[0]])
        if status == -1:
            return -1
        status = strcmp_glibc(db.headers[rhs[0]], db.headers[lhs[0]])
        if status == -1:
            return 1
        return 0

    seeds.sort(key=functools.cmp_to_key(compare))
    progress.done()

    progress.init("Writing seeds:    ", len(seeds))
    out = []
    for ticker, (seed, swarm_mass) in enumerate(seeds):
        out.append(">")
        out.append(db.print_id_with_new_abundance(seed, swarm_mass, ua))
        out.append("\n")
        out.append(db.sequence_string(seed))
        out.append("\n")
        progress.update(ticker)
    p.seeds_file.write("".join(out))
    progress.done()
