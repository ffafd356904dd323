"""Deterministic fasta test-corpus generators."""

import random

BASES = "ACGT"


def mutate(seq: str, rng: random.Random, n_edits: int) -> str:
    seq = list(seq)
    for _ in range(n_edits):
        op = rng.choice(("sub", "ins", "del"))
        if op == "sub" and seq:
            pos = rng.randrange(len(seq))
            seq[pos] = rng.choice([b for b in BASES if b != seq[pos]])
        elif op == "ins":
            pos = rng.randrange(len(seq) + 1)
            seq.insert(pos, rng.choice(BASES))
        elif op == "del" and len(seq) > 1:
            pos = rng.randrange(len(seq))
            del seq[pos]
    return "".join(seq)


def random_seq(rng: random.Random, length: int) -> str:
    return "".join(rng.choice(BASES) for _ in range(length))


def amplicon_cloud(
    seed: int = 1,
    n_centers: int = 10,
    cloud_size: int = 20,
    length: int = 80,
    max_edits: int = 3,
    usearch: bool = False,
    max_abundance: int = 1000,
) -> str:
    """Clusters of mutated amplicons around random centers, dereplicated."""
    rng = random.Random(seed)
    seen = set()
    records = []
    idx = 0
    for _ in range(n_centers):
        center = random_seq(rng, rng.randint(max(length - 10, 10), length + 10))
        candidates = [center] + [
            mutate(center, rng, rng.randint(1, max_edits)) for _ in range(cloud_size - 1)
        ]
        for seq in candidates:
            if seq in seen:
                continue
            seen.add(seq)
            abundance = rng.randint(1, max_abundance)
            if usearch:
                records.append(f">s{idx};size={abundance};\n{seq}\n")
            else:
                records.append(f">s{idx}_{abundance}\n{seq}\n")
            idx += 1
    rng.shuffle(records)
    return "".join(records)


def with_duplicates(seed: int = 7) -> str:
    """Non-dereplicated input (same sequence twice) — must be fatal for d>=1."""
    rng = random.Random(seed)
    seq = random_seq(rng, 50)
    other = mutate(seq, rng, 2)
    return f">a_5\n{seq}\n>b_3\n{seq}\n>c_2\n{other}\n"
