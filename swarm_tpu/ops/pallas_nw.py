"""Banded cost-space Needleman-Wunsch — Pallas TPU kernel + jnp reference.

The reference's hot kernel computes the FULL L x L cost DP
(src/search8.cc); swarm only ever accepts pairs with <= d differences,
whose optimal paths stay within |i - j| <= band of the main diagonal
(each off-diagonal step costs >= gapextend, so cells outside the band
have cost > cutoff = d * max(mismatch, gapopen + gapextend)). A banded
DP with +INF outside the band therefore computes costs EXACTLY for
every pair the engine can accept and >= cutoff otherwise — which is all
the screen needs (see ops/search_jax.py for the soundness argument).

Band coordinates: k in [0, 2B], query index i = j + k - B at target row
j. Per row the three inputs map to:
    diagonal (i-1, j-1) -> same k of the previous row;
    up       (i,   j-1) -> k+1 of the previous row (E carries columns);
    left     (i-1, j  ) -> k-1 of the current row (F, solved with the
                           same min-plus prefix scan as ops/search.py).

Work drops from O(L^2) to O(L * B) per pair, and the Pallas kernel
keeps the band state resident in VMEM across all rows (the jnp/XLA
scan version writes its carry back to HBM every row).
"""


import numpy as np

import jax
import jax.numpy as jnp

INF = np.int32(1 << 28)


def _band_row_update(H_prev, E_prev, row, q_band, t_code, qlen,
                     mm, go, ge, B):
    """One banded DP row. All arrays [..., 2B+1] (band on the last axis).

    q_band: query codes at band positions (i = row + k - B), INF-masked
    via i_valid; t_code: target code at this row (broadcastable).
    Returns (H, E) for this row.
    """
    W = H_prev.shape[-1]
    Q = go + ge
    R = ge
    k = jnp.arange(W, dtype=jnp.int32)
    i = row + k - B  # query index per band slot
    i_valid = (i >= 0) & (i < qlen)

    V = jnp.where(q_band == t_code, 0, mm)

    # diagonal: (i-1, j-1) = same slot, previous row; i == 0 boundary
    diag_in = jnp.where(
        i == 0,
        jnp.where(row == 0, 0, go + row * ge),
        H_prev,
    )
    diag = jnp.where(i_valid, diag_in + V, INF)

    # up: E carried per column -> slot k+1 of previous row
    E_in = jnp.concatenate(
        [E_prev[..., 1:], jnp.full(E_prev.shape[:-1] + (1,), INF, jnp.int32)],
        axis=-1,
    )
    E_in = jnp.where(i_valid, E_in, INF)

    # left: F along the row via min-plus prefix scan over band slots,
    # seeded by the i == 0 boundary (2go + (row+2)ge) where it is in
    # band; out-of-band-left contributions are > cutoff == INF here.
    pre = jnp.minimum(diag, E_in)
    f_boundary = 2 * go + (row + 2) * ge
    seed = jnp.where(i == 0, f_boundary - k * R, INF)
    A = jnp.minimum(pre + Q - (k + 1) * R, seed)
    running = jax.lax.associative_scan(jnp.minimum, A, axis=-1)
    shifted = jnp.concatenate(
        [jnp.full(running.shape[:-1] + (1,), INF, jnp.int32), running[..., :-1]],
        axis=-1,
    )
    F_in = jnp.minimum(shifted + k * R, jnp.where(i == 0, f_boundary, INF))

    H = jnp.minimum(jnp.minimum(pre, F_in), INF)
    E = jnp.minimum(jnp.minimum(H + Q, E_in + R), INF)
    return H, E


def banded_scores_reference(qrows, trows, qlens, tlens, mm, go, ge, band):
    """jnp reference: [P] i32 scores (>= INF when out of band/invalid)."""
    P, W = qrows.shape
    B = band
    width = 2 * B + 1
    Q = go + ge
    R = ge
    k = jnp.arange(width, dtype=jnp.int32)

    # row -1 boundaries in band coords at row 0: H[-1][i] = Q + iR at
    # slot of row 0: i = 0 + k - B ... but H_prev is consumed as the
    # DIAGONAL (i-1, j-1) of row j: at row 0 the diag boundary is
    # handled inside the update; initialize with the top boundary for
    # i-1 = (k - B) - 1 + 1 ... H_prev[k] must equal H[-1][i-1] where
    # i = k - B for row 0 -> H[-1][k - B - 1 + ... ]
    # Simplest: H_prev[k] = Q + (k - B - 1) * R where valid (i-1 >= 0).
    i0 = k - B  # query index at row 0
    H0 = jnp.where(i0 - 1 >= 0, Q + (i0 - 1) * R, INF).astype(jnp.int32)
    # E_in of row 0 reads slot k+1, so store at slot m the value for
    # column m - 1 - B + 0 = i0 - 1
    E0 = jnp.where(i0 - 1 >= 0, 2 * Q + (i0 - 1) * R, INF).astype(jnp.int32)
    H_prev = jnp.broadcast_to(H0, (P, width))
    E_prev = jnp.broadcast_to(E0, (P, width))

    # extended query for dynamic band slices
    q_ext = jnp.concatenate(
        [jnp.zeros((P, B), jnp.uint8), qrows, jnp.zeros((P, B + W), jnp.uint8)],
        axis=1,
    )

    scores0 = jnp.full((P,), INF, dtype=jnp.int32)

    def step(carry, row):
        H_prev, E_prev, scores = carry
        q_band = jax.lax.dynamic_slice_in_dim(q_ext, row, width, axis=1)
        t_code = trows[:, row][:, None]
        H, E = _band_row_update(
            H_prev, E_prev, row, q_band, t_code, qlens[:, None], mm, go, ge, B
        )
        k_final = qlens - tlens + B  # slot of (qlen-1) at row tlen-1
        in_band = (k_final >= 0) & (k_final < width)
        final = jnp.take_along_axis(
            H, jnp.clip(k_final, 0, width - 1)[:, None], axis=1
        )[:, 0]
        ended = (tlens == row + 1) & in_band
        scores = jnp.where(ended, final, scores)
        return (H, E, scores), None

    (_, _, scores), _ = jax.lax.scan(
        step, (H_prev, E_prev, scores0), jnp.arange(W, dtype=jnp.int32)
    )
    return jnp.minimum(scores, INF)


def make_banded_scores_pallas(P_TILE=8, interpret=False):
    """Pallas kernel factory: the DP state lives in VMEM for all rows.

    Full-row formulation (query positions on the lane axis): Mosaic has
    no unaligned lane slices or gathers, so the per-row target base and
    the per-pair final score are extracted with one-hot masked sums —
    all shapes static, zero dynamic indexing. The XLA scan version
    (ops/search_jax.py) writes its [B, W] carry back to HBM on every
    row; here H/E stay in vector registers/VMEM for the whole pair
    tile, cutting HBM traffic by ~2 * W per cell.

    Exact same cost model as ops/search.py — scores are bit-identical,
    not just cutoff-compatible.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(qrows_ref, trows_ref, qlens_ref, tlens_ref, params_ref,
               out_ref):
        mm = params_ref[0]
        go = params_ref[1]
        ge = params_ref[2]
        W = qrows_ref.shape[1]

        Q = go + ge
        R = ge
        cols = jax.lax.broadcasted_iota(jnp.int32, (P_TILE, W), 1)
        qlens = qlens_ref[:, 0][:, None]
        tlens = tlens_ref[:, 0][:, None]

        H0 = Q + cols * R
        E0 = 2 * Q + cols * R

        qcodes = qrows_ref[:, :].astype(jnp.int32)
        tcodes = trows_ref[:, :].astype(jnp.int32)

        def row_body(row, carry):
            H_prev, E_prev, scores = carry
            # target base of this row via one-hot reduction (no slices)
            tj = jnp.sum(
                jnp.where(cols == row, tcodes, 0), axis=1, keepdims=True
            )
            V = jnp.where(qcodes == tj, 0, mm)

            diag_boundary = jnp.where(row == 0, 0, go + row * ge)
            diag = jnp.concatenate(
                [
                    jnp.full((P_TILE, 1), 1, jnp.int32) * diag_boundary,
                    H_prev[:, :-1],
                ],
                axis=1,
            ) + V

            pre = jnp.minimum(diag, E_prev)
            f_boundary = 2 * go + (row + 2) * ge
            seed = jnp.where(cols == 0, f_boundary - cols * R, INF)
            A = jnp.minimum(pre + Q - (cols + 1) * R, seed)
            # prefix-min via shift doubling (associative_scan emits
            # zero-width slices Mosaic rejects)
            running = A
            s = 1
            while s < W:
                running = jnp.minimum(
                    running,
                    jnp.concatenate(
                        [
                            jnp.full((P_TILE, s), INF, jnp.int32),
                            running[:, :-s],
                        ],
                        axis=1,
                    ),
                )
                s *= 2
            shifted = jnp.concatenate(
                [jnp.full((P_TILE, 1), INF, jnp.int32), running[:, :-1]],
                axis=1,
            )
            F_in = jnp.minimum(
                shifted + cols * R, jnp.where(cols == 0, f_boundary, INF)
            )

            H = jnp.minimum(pre, F_in)
            E = jnp.minimum(H + Q, E_prev + R)

            ended = tlens == row + 1
            final = jnp.sum(
                jnp.where(cols == qlens - 1, H, 0), axis=1, keepdims=True
            )
            scores = jnp.where(ended, jnp.broadcast_to(final, (P_TILE, W)),
                               scores)
            return H, E, scores

        H, E, scores = jax.lax.fori_loop(
            0, W, row_body,
            (
                jnp.broadcast_to(H0, (P_TILE, W)),
                jnp.broadcast_to(E0, (P_TILE, W)),
                jnp.full((P_TILE, W), INF, jnp.int32),
            ),
        )
        out_ref[:, :] = scores

    def call(qrows, trows, qlens, tlens, mm, go, ge, band=None):
        P, W = qrows.shape
        assert W % 128 == 0, "pad the code width to a lane multiple"
        grid = (P // P_TILE,)
        params = jnp.array([mm, go, ge, 0], dtype=jnp.int32)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((P, W), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((P_TILE, W), lambda p: (p, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P_TILE, W), lambda p: (p, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P_TILE, 1), lambda p: (p, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P_TILE, 1), lambda p: (p, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((P_TILE, W), lambda p: (p, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(
            qrows, trows,
            qlens.astype(jnp.int32).reshape(P, 1),
            tlens.astype(jnp.int32).reshape(P, 1),
            params,
        )
        return out[:, 0]

    return call


def make_banded_scores_pallas_band(P_TILE=8, interpret=False):
    """The PRODUCTION banded kernel: O(rows * 128) per pair.

    The band lives on the lane axis (128 slots, covering query indices
    i in [row-B, row-B+127], which contains the |i-j| <= B band for
    any B <= 63). Per target row the window slides one query position:
    Mosaic has no unaligned lane slices, so the query codes shift one
    lane per row with the incoming code extracted by a one-hot sum
    from a host-precomputed shifted copy — all slices static.

    Scores are EXACT (bit-identical to ops/search.py) for every pair
    whose optimal cost is <= gapopen + B*gapextend; anything whose
    optimal path leaves the band reports >= that bound (the screen's
    cutoff-compatibility contract — see banded_scores_reference and
    ops/search_jax.py). Choose B with band_for_cutoff().

    Versus the full-row kernel (make_banded_scores_pallas) the VPU work
    per row drops from O(qlen) to O(128) — ~4x for 400-500 nt
    amplicons — and VMEM residency per pair shrinks the same way.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BW = 128  # band window lanes

    def kernel(qinit_ref, qshift_ref, trows_ref, qlens_ref, tlens_ref,
               params_ref, out_ref):
        mm = params_ref[0]
        go = params_ref[1]
        ge = params_ref[2]
        B = params_ref[3]
        W = trows_ref.shape[1]

        Q = go + ge
        R = ge
        k = jax.lax.broadcasted_iota(jnp.int32, (P_TILE, BW), 1)
        qlens = qlens_ref[:, 0][:, None]
        tlens = tlens_ref[:, 0][:, None]

        q_band0 = qinit_ref[:, :].astype(jnp.int32)

        # row -1 boundaries in band coordinates at row 0 (i = k - B):
        # H_prev[k] = H[-1][i-1], E_prev[k] holds E entering row 0 at
        # column i-1 (consumed through the k+1 shift)
        i0 = k - B
        H_prev0 = jnp.where(i0 - 1 >= 0, Q + (i0 - 1) * R, INF)
        E_prev0 = jnp.where(i0 - 1 >= 0, 2 * Q + (i0 - 1) * R, INF)

        def row_body(row, carry):
            H_prev, E_prev, q_band, scores = carry
            i = row + k - B
            i_valid = (i >= 0) & (i < qlens)

            # per-row codes come from SMEM scalar reads (the one-hot
            # reductions over the full row dominated the kernel: 2W
            # lanes of work per row vs the band's 128)
            t_code = jnp.stack(
                [trows_ref[p, row] for p in range(P_TILE)]
            ).astype(jnp.int32)[:, None]
            V = jnp.where(q_band == t_code, 0, mm)

            diag_in = jnp.where(
                i == 0,
                jnp.where(row == 0, 0, go + row * ge),
                H_prev,
            )
            diag = jnp.where(i_valid, diag_in + V, INF)

            # up (E): slot k+1 of the previous row
            E_in = jnp.concatenate(
                [E_prev[:, 1:], jnp.full((P_TILE, 1), INF, jnp.int32)],
                axis=1,
            )
            E_in = jnp.where(i_valid, E_in, INF)

            # left (F): min-plus prefix scan over band slots
            pre = jnp.minimum(diag, E_in)
            f_boundary = 2 * go + (row + 2) * ge
            seed = jnp.where(i == 0, f_boundary - k * R, INF)
            A = jnp.minimum(pre + Q - (k + 1) * R, seed)
            running = A
            s = 1
            while s < BW:
                running = jnp.minimum(
                    running,
                    jnp.concatenate(
                        [
                            jnp.full((P_TILE, s), INF, jnp.int32),
                            running[:, :-s],
                        ],
                        axis=1,
                    ),
                )
                s *= 2
            shifted = jnp.concatenate(
                [jnp.full((P_TILE, 1), INF, jnp.int32), running[:, :-1]],
                axis=1,
            )
            F_in = jnp.minimum(
                shifted + k * R, jnp.where(i == 0, f_boundary, INF)
            )

            H = jnp.minimum(jnp.minimum(pre, F_in), INF)
            E = jnp.minimum(jnp.minimum(H + Q, E_in + R), INF)

            # final score: row tlen-1, band slot qlen-1-row+B
            k_final = qlens - 1 - row + B
            ended = tlens == row + 1
            final = jnp.sum(jnp.where(k == k_final, H, 0), axis=1,
                            keepdims=True)
            scores = jnp.where(
                ended & (k_final >= 0) & (k_final < BW),
                jnp.broadcast_to(final, (P_TILE, BW)),
                scores,
            )

            # slide the query window one lane: incoming code for the
            # next row is q[row+1 + (BW-1) - B] = qshift[:, row+1]
            nxt = jnp.minimum(row + 1, W - 1)
            incoming = jnp.stack(
                [qshift_ref[p, nxt] for p in range(P_TILE)]
            ).astype(jnp.int32)[:, None]
            q_band = jnp.concatenate([q_band[:, 1:], incoming], axis=1)
            return H, E, q_band, scores

        H, E, q_band, scores = jax.lax.fori_loop(
            0, W, row_body,
            (
                H_prev0,
                E_prev0,
                q_band0,
                jnp.full((P_TILE, BW), INF, jnp.int32),
            ),
        )
        out_ref[:, :] = scores

    def call(qrows, trows, qlens, tlens, mm, go, ge, band):
        P, W = qrows.shape
        assert W % 128 == 0, "pad the code width to a lane multiple"
        assert 1 <= band <= 63, "band window covers B <= 63"
        B = int(band)
        # q_band at row 0: slot k holds q[k - B] (zeros where i < 0)
        qinit = jnp.concatenate(
            [
                jnp.zeros((P, B), jnp.uint8),
                qrows[:, : BW - B],
            ],
            axis=1,
        )
        # incoming code per row r: q[r + (BW-1) - B] -> shift left
        shift = BW - 1 - B
        qshift = jnp.concatenate(
            [qrows[:, shift:], jnp.zeros((P, shift), jnp.uint8)], axis=1
        )
        grid = (P // P_TILE,)
        params = jnp.array([mm, go, ge, B], dtype=jnp.int32)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((P, BW), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((P_TILE, BW), lambda p: (p, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P_TILE, W), lambda p: (p, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((P_TILE, W), lambda p: (p, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((P_TILE, 1), lambda p: (p, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P_TILE, 1), lambda p: (p, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((P_TILE, BW), lambda p: (p, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(
            qinit,
            qshift.astype(jnp.int32),
            trows.astype(jnp.int32),
            qlens.astype(jnp.int32).reshape(P, 1),
            tlens.astype(jnp.int32).reshape(P, 1),
            params,
        )
        return out[:, 0]

    return call


def band_for_cutoff(cutoff: int, go: int, ge: int) -> int:
    """Smallest band B with gapopen + B*gapextend > cutoff: every cell
    off the band costs more than any acceptable pair, so the banded
    score classifies accept/reject exactly (docs/PARITY.md sect. 5)."""
    B = (cutoff - go) // ge + 1
    return max(1, int(B))
