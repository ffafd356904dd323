"""Cost-space global alignment with the search-kernel's exact semantics.

The reference's hot kernel (src/search8.cc / search16.cc) is a striped
SIMD Needleman-Wunsch in cost space whose per-cell direction bits and
backtrack tie-breaking (src/utils/backtrack.h) determine the *number of
differences* used for all d>=2 clustering decisions. This module
reproduces those bits exactly with wide-integer arithmetic, batched
over target sequences (one query vs many targets — the same batching
axis the reference maps onto SIMD channels, here mapped onto VPU lanes).

Saturation semantics: the SIMD kernels saturate at 255 (8-bit mode) or
65535 (16-bit mode) and reject saturated scores with diff=max. Because
saturating arithmetic preserves min(true, MAX) for every cell (costs
are non-negative), computing the DP unsaturated and rejecting scores
>= MAX yields identical results (proof in repo docs/PARITY.md).

Direction-bit semantics per cell (column i = query pos, row j = target
pos), derived from onestep_8 (src/search8.cc:451-474):
  bit_up      set iff  Hdiag + V <= F_in
  bit_left    set iff  E_in <= min(Hdiag + V, F_in)
  bit_extup   set iff  Hnew + Q <= F_in + R
  bit_extleft set iff  Hnew + Q <= E_in + R
with Q = gapopen + gapextend, R = gapextend; F runs along the row
(consumes query), E is carried down columns (consumes target).
"""

from typing import Tuple

import numpy as np

BIT_UP = 1
BIT_LEFT = 2
BIT_EXTUP = 4
BIT_EXTLEFT = 8


def search_diffs(
    qseq: np.ndarray,
    target_rows: np.ndarray,
    target_lens: np.ndarray,
    mismatch: int,
    gapopen: int,
    gapextend: int,
    bit_mode: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Align one query against a batch of targets.

    target_rows: [B, max_dlen] uint8 code matrix; target_lens: [B].
    Returns (scores, diffs, alignment_lengths), with diff = saturation
    max when score saturates (reference: src/search8.cc:792-805).
    """
    from .. import _native

    B, max_dlen = target_rows.shape
    qlen = len(qseq)
    if _native.available() and B > 0 and qlen > 0:
        sat = 255 if bit_mode == 8 else 65535
        return _native.nw_diffs_batch(
            qseq, target_rows, target_lens, mismatch, gapopen, gapextend, sat
        )
    Q = np.int64(gapopen + gapextend)
    R = np.int64(gapextend)
    go = np.int64(gapopen)
    ge = np.int64(gapextend)
    sat_max = np.int64(255 if bit_mode == 8 else 65535)

    cols = np.arange(qlen, dtype=np.int64)

    # boundaries (derived from channel init in search8: H0=0,
    # F0=2(go+ge), masked-restart reconstruction H_top=Q+i*R, E=2Q+i*R)
    H = Q + cols * R  # H[-1 row][i] = go+ge + i*ge
    E = 2 * Q + cols * R
    H = np.broadcast_to(H, (B, qlen)).copy()
    E = np.broadcast_to(E, (B, qlen)).copy()

    dirs = np.zeros((B, max_dlen, qlen), dtype=np.uint8)
    scores = np.zeros(B, dtype=np.int64)

    mismatch_cost = np.int64(mismatch)

    for row in range(max_dlen):
        d_codes = target_rows[:, row]  # [B]
        V = np.where(d_codes[:, None] == qseq[None, :], np.int64(0), mismatch_cost)

        diag_boundary = np.int64(0) if row == 0 else go + row * ge
        diag_in = np.empty((B, qlen), dtype=np.int64)
        diag_in[:, 0] = diag_boundary
        diag_in[:, 1:] = H[:, :-1]
        diag = diag_in + V

        E_in = E

        # F recurrence along the row via min-plus prefix scan:
        # F_in[0] = 2go + (row+2)*ge;  F_out[i] = min(Hnew[i]+Q, F_in[i]+R)
        # Hnew[i] = min(diag[i], F_in[i], E_in[i]).
        # Using pre = min(diag, E) in the scan is exact for Q >= R >= 0.
        pre = np.minimum(diag, E_in)
        f_boundary = 2 * go + (row + 2) * ge
        # F_in[i] = min(f_boundary + i*R, min_{k<i}(Hnew[k] + Q + (i-1-k)*R));
        # substituting pre[k] for Hnew[k] is exact because Q >= R >= 0.
        A = pre + Q - (cols + 1) * R
        running = np.minimum.accumulate(A, axis=1)
        F_in = np.empty((B, qlen), dtype=np.int64)
        F_in[:, 0] = f_boundary
        if qlen > 1:
            F_in[:, 1:] = np.minimum(
                f_boundary + cols[1:] * R, running[:, :-1] + cols[1:] * R
            )

        Hnew = np.minimum(pre, F_in)

        row_dirs = np.where(diag <= F_in, BIT_UP, 0)
        row_dirs |= np.where(E_in <= np.minimum(diag, F_in), BIT_LEFT, 0)
        hq = Hnew + Q
        row_dirs |= np.where(hq <= F_in + R, BIT_EXTUP, 0)
        row_dirs |= np.where(hq <= E_in + R, BIT_EXTLEFT, 0)
        dirs[:, row, :] = row_dirs.astype(np.uint8)

        E = np.minimum(hq, E_in + R)
        H = Hnew

        ended = target_lens == row + 1
        if np.any(ended):
            scores[ended] = H[ended, qlen - 1]

    from .. import _native

    if _native.available() and B > 0:
        diffs, alignlengths = _native.nw_backtrack_batch(
            qseq, target_rows, target_lens, dirs
        )
        saturated = scores >= sat_max
        diffs[saturated] = sat_max
        alignlengths[saturated] = 0
        return scores, diffs, alignlengths

    diffs = np.empty(B, dtype=np.int64)
    alignlengths = np.zeros(B, dtype=np.int64)
    for b in range(B):
        if scores[b] >= sat_max:
            diffs[b] = sat_max
            continue
        diffs[b], alignlengths[b] = _backtrack(
            qseq, target_rows[b], int(target_lens[b]), dirs[b]
        )
    return scores, diffs, alignlengths


def _backtrack(qseq, dcodes, dlen, dirs) -> Tuple[int, int]:
    """Count differences along the kernel's tie-broken optimal path
    (reference: src/utils/backtrack.h:51-138)."""
    qlen = len(qseq)
    column = qlen - 1
    row = dlen - 1
    aligned = 0
    matches = 0
    UNKNOWN, INSERTION, DELETION, MATCH = 0, 1, 2, 3
    op = UNKNOWN
    while column >= 0 and row >= 0:
        aligned += 1
        cell = dirs[row, column]
        if op == INSERTION and not (cell & BIT_EXTLEFT):
            row -= 1
        elif op == DELETION and not (cell & BIT_EXTUP):
            column -= 1
        elif cell & BIT_LEFT:
            row -= 1
            op = INSERTION
        elif not (cell & BIT_UP):
            column -= 1
            op = DELETION
        else:
            if qseq[column] == dcodes[row]:
                matches += 1
            column -= 1
            row -= 1
            op = MATCH
    aligned += column + 1 + row + 1
    return aligned - matches, aligned


def set_bit_mode(d: int, penalty_mismatch: int, penalty_gapopen: int,
                 penalty_gapextend: int) -> int:
    """8-bit unless d or penalties overflow uint8 (src/algo.cc:96-120)."""
    diff_saturation = min(
        255 // penalty_mismatch, 255 // (penalty_gapopen + penalty_gapextend)
    )
    return 16 if d > diff_saturation else 8
