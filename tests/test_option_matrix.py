"""Option-interaction parity matrix (man/swarm.1 behaviors).

Parametrized black-box coverage of option interactions and boundary
values against the reference binary, extending the per-feature suites:
-z with -r/-f/-a, the -c ceiling boundary values (40 MB is the
smallest accepted ceiling, 2^30 the documented extreme), -y bloom-bit
extremes, -b extremes, -d boundary resolutions and alignment-penalty
extremes for the d>1 engines.
"""

import pytest

from genfasta import amplicon_cloud

OUTS = ["-o", "out.txt", "-s", "stats.txt", "-l", "log.txt"]
FULL = OUTS + ["-u", "uclust.txt", "-i", "structure.txt", "-w", "seeds.fasta"]


def _fasta(seed=50, usearch=False, **kw):
    kw.setdefault("n_centers", 5)
    kw.setdefault("cloud_size", 14)
    kw.setdefault("length", 60)
    kw.setdefault("max_edits", 3)
    return amplicon_cloud(seed=seed, usearch=usearch, **kw)


# --- -z interactions -------------------------------------------------

def test_z_with_mothur(both):
    both.compare(["-z", "-r", "-o", "out.txt", "-l", "log.txt"],
                 _fasta(seed=51, usearch=True))


def test_z_with_fastidious_full(both):
    both.compare(["-z", "-f"] + FULL, _fasta(seed=52, usearch=True))


def test_z_with_append_abundance(both):
    # headers missing annotations + -a + -z: the appended value must be
    # emitted in usearch syntax
    recs = _fasta(seed=53, usearch=True).splitlines(keepends=True)
    # strip the annotation from every third record
    out = []
    for i, line in enumerate(recs):
        if line.startswith(">") and (i // 2) % 3 == 0:
            out.append(line.split(";size=")[0] + "\n")
        else:
            out.append(line)
    both.compare(["-z", "-a", "7"] + FULL, "".join(out))


def test_z_with_d2(both):
    both.compare(["-z", "-d", "2"] + FULL, _fasta(seed=54, usearch=True))


# --- ceiling / bloom boundary values (-f) ----------------------------

@pytest.mark.parametrize("ceiling", ["40", "41", "1073741824"])
def test_fastidious_ceiling_bounds(both, ceiling):
    both.compare(["-f", "-c", ceiling] + OUTS, _fasta(seed=55))


@pytest.mark.parametrize("bits", ["2", "3", "64"])
def test_fastidious_bloom_bits_bounds(both, bits):
    both.compare(["-f", "-y", bits] + OUTS, _fasta(seed=56))


@pytest.mark.parametrize("boundary", ["2", "1000000000"])
def test_fastidious_boundary_bounds(both, boundary):
    both.compare(["-f", "-b", boundary] + OUTS, _fasta(seed=57))


def test_fastidious_ceiling_39_rejected(both):
    both.compare(["-f", "-c", "39"] + OUTS, _fasta(seed=58))


# --- resolution boundaries ------------------------------------------

def test_d255(both):
    # maximum accepted resolution: 16-bit kernel, everything links
    both.compare(["-d", "255", "-o", "out.txt", "-s", "stats.txt"],
                 _fasta(seed=59, n_centers=3, cloud_size=8, length=40))


def test_d256_rejected(both):
    both.compare(["-d", "256", "-o", "out.txt"], _fasta(seed=60))


@pytest.mark.parametrize(
    "scores",
    [
        ["-m", "1", "-p", "1", "-g", "1", "-e", "1"],
        ["-m", "120", "-p", "100", "-g", "100", "-e", "70"],
        ["-m", "5", "-p", "30", "-g", "1", "-e", "1"],  # gaps cheap
    ],
)
def test_d2_score_extremes(both, scores):
    both.compare(["-d", "2"] + scores + FULL,
                 _fasta(seed=61, n_centers=4, cloud_size=10, length=50))


# --- long sequences at d=1 ------------------------------------------

def test_d1_long_sequences(both):
    # multi-kilobase sequences through the d=1 microvariant engine
    import numpy as np

    rng = np.random.default_rng(62)
    base = rng.integers(0, 4, size=5000)
    recs = []
    seen = set()
    for i in range(12):
        v = base.copy()
        for _ in range(int(rng.integers(0, 3))):
            p = int(rng.integers(0, len(v)))
            v[p] = (v[p] + 1 + rng.integers(0, 3)) % 4
        key = v.tobytes()
        if key in seen:
            continue
        seen.add(key)
        recs.append(
            f">L{i}_{int(rng.integers(1, 50))}\n"
            + "".join("ACGT"[c] for c in v) + "\n"
        )
    both.compare(["-d", "1"] + FULL, "".join(recs))


# --- output-target interactions -------------------------------------

def test_all_outputs_to_stdout_conflict(both):
    # two streams on '-' both write to stdout interleaved by phase
    both.compare(["-o", "-", "-s", "stats.txt", "-l", "log.txt"],
                 _fasta(seed=63))


def test_mothur_with_statistics_and_seeds(both):
    both.compare(["-r", "-o", "out.txt", "-s", "stats.txt",
                  "-w", "seeds.fasta", "-l", "log.txt"], _fasta(seed=64))


# --- no-break / derep / graft-direction interactions ------------------

def test_nobreak_with_fastidious_structure(both):
    # -n changes the abundance rule both in the d=1 network and in the
    # graft direction bookkeeping that -i's generation column exposes
    both.compare(["-n", "-f"] + FULL, _fasta(seed=65))


def test_mothur_with_d2_and_append(both):
    recs = _fasta(seed=66).splitlines(keepends=True)
    out = []
    for i, line in enumerate(recs):
        if line.startswith(">") and (i // 2) % 2 == 0:
            out.append(line.rsplit("_", 1)[0] + "\n")
        else:
            out.append(line)
    both.compare(["-r", "-d", "2", "-a", "2"] + OUTS, "".join(out))


def test_derep_with_mothur_and_usearch(both):
    both.compare(["-d", "0", "-z", "-r"] + FULL,
                 _fasta(seed=67, usearch=True))


def test_fastidious_heavy_side_smaller(both):
    # a high -b boundary makes most swarms light, so the graft join
    # tables the HEAVY side — the probe engine's other orientation
    both.compare(["-f", "-b", "200"] + FULL,
                 _fasta(seed=68, cloud_size=6, n_centers=12))


def test_stdin_input_with_fastidious(both):
    both.compare(["-f"] + OUTS + ["-"], None,
                 stdin_data=_fasta(seed=69).encode())


def test_mixed_length_bucketed_device_join(both, monkeypatch):
    """End-to-end CLI run through the width-bucketed device join
    (forced jax backend + buckets) on a corpus spanning three width
    levels, including a cross-bucket 1-edit pair."""
    import numpy as np

    monkeypatch.setenv("SWARM_TPU_BACKEND", "jax")
    monkeypatch.setenv("SWARM_TPU_D1_BUCKETS", "1")
    rng = np.random.default_rng(90)
    recs = []
    seen = set()

    def push(v, i, ab):
        key = v.tobytes()
        if key in seen:
            return
        seen.add(key)
        recs.append(f">m{i}_{ab}\n" + "".join("ACGT"[c] for c in v) + "\n")

    base = rng.integers(0, 4, size=55).astype(np.uint8)
    for i in range(30):
        v = base.copy()
        for _ in range(int(rng.integers(0, 2))):
            v[rng.integers(0, len(v))] = rng.integers(0, 4)
        push(v, i, int(rng.integers(1, 50)))
    b64 = rng.integers(0, 4, size=64).astype(np.uint8)
    push(b64, 100, 9)
    push(np.insert(b64, 20, 1).astype(np.uint8), 101, 4)  # cross-bucket
    long1 = rng.integers(0, 4, size=700).astype(np.uint8)
    long2 = long1.copy()
    long2[350] = (long2[350] + 2) % 4
    push(long1, 200, 7)
    push(long2, 201, 3)
    both.compare(["-d", "1"] + FULL, "".join(recs))


# --- round-4 widening: writer/threads/network interactions ----------

def test_derep_full_output_set(both):
    both.compare(["-d", "0"] + FULL, _fasta(seed=71))


def test_network_file_with_threads(both):
    both.compare(
        ["-d", "1", "-t", "4", "-j", "network.txt"] + OUTS, _fasta(seed=72)
    )


def test_uclust_with_fastidious_grafts(both):
    # grafting rewrites member chains; the uclust writer must follow
    # the spliced order (reference src/algod1.cc:852-934)
    both.compare(
        ["-d", "1", "-f", "-u", "uclust.txt", "-i", "structure.txt"] + OUTS,
        _fasta(seed=73, cloud_size=4, n_centers=12),
    )


def test_no_break_with_d2(both):
    both.compare(["-d", "2", "-n"] + FULL, _fasta(seed=74))


def test_threads_boundary_512(both):
    both.compare(["-d", "1", "-t", "512"] + OUTS, _fasta(seed=75))


def test_threads_513_rejected(both):
    ref, _ = both.compare(["-d", "1", "-t", "513", "-o", "out.txt"], _fasta())
    assert ref.returncode == 1


def test_append_abundance_derep_seeds(both):
    # -a supplies the missing abundance; -w rewrites with the summed
    # mass (both syntaxes, src/db.cc:1001-1026)
    fasta = ">s1\nACGTACGT\n>s2_3\nACGTACGT\n>s3\nACGAACGT\n"
    both.compare(["-d", "0", "-a", "2", "-w", "seeds.fasta"] + OUTS, fasta)


def test_append_abundance_d2_usearch(both):
    fasta = ">q1;size=4\nACGTACGTAA\n>q2\nACGTACCTAA\n>q3;size=2\nTTTTACGTAA\n"
    both.compare(["-d", "2", "-z", "-a", "7"] + FULL, fasta)


def test_d5_wide_band_engine(both):
    # d=5 widens the exact band; crosses the batch kernel's width cap
    # logic and the subseed radius bound (src/algo.cc:518-531)
    both.compare(["-d", "5"] + FULL, _fasta(seed=76, max_edits=6))
