"""5-mer qgram parity profiles and popcount distances.

Reference: src/qgram.cc — each sequence gets a 1024-bit vector where bit
b is the XOR-parity of occurrences of 5-mers whose low 10 bits equal b;
half the Hamming distance between two vectors, divided by the qgram
length (ceil), lower-bounds the edit distance:
mindiff = (diffbits + 2*5 - 1) / (2*5).

Profiles are stored unpacked ([n, 1024] uint8 of 0/1) so that distance
is a plain elementwise-xor + sum — on TPU this maps onto the VPU (and
the seed-vs-pool batch onto an int8 matmul on the MXU if needed).
"""

import numpy as np

QGRAM_LENGTH = 5
VECTOR_BITS = 1024


def qgram_profiles(padded: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """[n, 1024] uint8 parity profiles."""
    n, max_len = padded.shape
    if n == 0 or max_len < QGRAM_LENGTH:
        return np.zeros((n, VECTOR_BITS), dtype=np.uint8)
    codes = padded.astype(np.int64)
    # value at position p (p >= 4): low 10 bits of the rolling 5-mer
    vals = np.zeros((n, max_len), dtype=np.int64)
    for k in range(QGRAM_LENGTH):
        shifted = np.zeros_like(codes)
        shifted[:, k:] = codes[:, : max_len - k] << (2 * k)
        vals += shifted
    vals &= VECTOR_BITS - 1

    pos = np.arange(max_len)
    mask = (pos[None, :] < lengths[:, None]) & (pos[None, :] >= QGRAM_LENGTH - 1)

    seq_ids = np.broadcast_to(np.arange(n)[:, None], vals.shape)
    flat_vals = (vals + seq_ids * VECTOR_BITS)[mask]
    counts = np.bincount(flat_vals, minlength=n * VECTOR_BITS)
    return (counts.reshape(n, VECTOR_BITS) & 1).astype(np.uint8)


def qgram_mindiff(profiles: np.ndarray, seed: int, targets: np.ndarray) -> np.ndarray:
    """Lower-bound edit distances between `seed` and each target."""
    if len(targets) == 0:
        return np.zeros(0, dtype=np.int64)
    diffs = np.count_nonzero(profiles[seed][None, :] != profiles[targets], axis=1)
    return (diffs + 2 * QGRAM_LENGTH - 1) // (2 * QGRAM_LENGTH)
