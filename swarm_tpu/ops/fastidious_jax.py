"""Device path for the fastidious graft join (reference src/algod1.cc:211-555).

A light amplicon l grafts onto the smallest heavy amplicon h with
dist(h, l) <= 2, discovered through a shared *microvariant midpoint* m
with dist(h, m) = dist(m, l) = 1. The reference realizes this as a
Bloom filter of light microvariant hashes probed by heavy gen-1/gen-2
variants (src/algod1.cc:374-552); here the same relation is ONE
sort-join between the microvariant hash sets of the two sides:

  triple (h, m, l) exists  <=>  variant-hash tables of h and l share m.

Pipeline (all uint32-pair hashes, exact verification, same counting
semantics as the host path in models/d1.py:_graft_join — the verified
triple count feeds the "Got N graft candidates" log line):

  1. light side: chunked variant-hash generation (neighbors_jax
     machinery), concatenated into a device-resident table;
  2. per heavy chunk: concat + lax.sort by (hi, lo), windowed run
     detection restricted to cross-side pairs, static compaction;
  3. verification: both variants are reconstructed from (amp, slot) by
     index arithmetic and compared as sequences (hash collisions are
     rejected; multiplicity = number of distinct midpoints, matching
     the reference's per-probe counter).

The host keeps only the tiny verified candidate list and applies the
smallest-heavy-seed rule + (parent, child) attach ordering.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .neighbors_jax import _OTHER3_TABLE, variant_hash_halves


def _decode_slots(slot, W, padded_rows):
    """(var_type, pos, base) for variant slots (device mirror of
    swarm_tpu.ops.neighbors.decode_slot).

    var_type: 0 substitution, 1 deletion, 2 insertion; `pos` is the edit
    position in the NEW sequence; padded_rows: [P, W] owner code rows.
    """
    tail = slot >= 8 * W
    block = jnp.where(tail, 0, slot // 8)
    sub_slot = jnp.where(tail, 0, slot % 8)

    var_type = jnp.where(
        tail, 2, jnp.where(sub_slot < 4, 0, jnp.where(sub_slot == 4, 1, 2))
    )
    block_c = jnp.minimum(block, W - 1)
    s_p = jnp.take_along_axis(padded_rows, block_c[:, None], axis=1)[:, 0]
    ins_base = _OTHER3_TABLE[
        s_p.astype(jnp.int32), jnp.clip(sub_slot - 5, 0, 2)
    ]
    pos = jnp.where(tail, 0, jnp.where(sub_slot < 5, block, block + 1))
    base = jnp.where(
        tail,
        slot - 8 * W,
        jnp.where(sub_slot < 4, sub_slot, jnp.where(sub_slot == 4, 0, ins_base)),
    )
    return var_type, pos, base


def _variant_rows(padded, lengths, amp, slot, W):
    """Reconstruct variant sequences ([P, W+1] rows, [P] lengths)."""
    rows = padded[amp]  # [P, W]
    var_type, pos, base = _decode_slots(slot, W, rows)
    src_len = lengths[amp]
    out_len = src_len + jnp.where(var_type == 1, -1, jnp.where(var_type == 2, 1, 0))

    idx = jnp.arange(W + 1, dtype=jnp.int32)[None, :]
    pos_col = pos[:, None]
    src_idx = jnp.where(
        var_type[:, None] == 1,
        idx + (idx >= pos_col),  # deletion: skip pos
        jnp.where(var_type[:, None] == 2, idx - (idx > pos_col), idx),
    )
    src_idx = jnp.clip(src_idx, 0, W - 1)
    out = jnp.take_along_axis(rows, src_idx, axis=1)
    place = (var_type != 1)[:, None] & (idx == pos_col)
    out = jnp.where(place, base[:, None].astype(jnp.uint8), out)
    out = jnp.where(idx < out_len[:, None], out, jnp.uint8(0))
    return out, out_len


@partial(jax.jit, static_argnames=("cap", "window"))
def graft_chunk(
    t_hi, t_lo, t_owner, t_slot, t_side,  # light table + heavy chunk, concat'd
    padded, lengths,
    cap: int,
    window: int,
):
    """Verified (heavy, light) variant matches within one joined block.

    Returns (h_amp [cap], h_slot, l_amp, l_slot, good [cap], n_flagged,
    overflow_run). side: 0 = light, 1 = heavy; owner < 0 = invalid.
    """
    M = t_hi.shape[0]
    W = padded.shape[1]

    invalid = t_owner < 0
    sent = jnp.uint32(0xFFFFFFFF)
    sentinel_hits = jnp.sum(
        (~invalid) & (t_hi == sent) & (t_lo == sent), dtype=jnp.int32
    )
    key_hi = jnp.where(invalid, sent, t_hi)
    key_lo = jnp.where(invalid, sent, t_lo)

    s_hi, s_lo, s_own, s_slot, s_side = jax.lax.sort(
        (key_hi, key_lo, t_owner, t_slot, t_side), num_keys=2
    )

    def shifted_eq(j):
        eq = (s_hi[j:] == s_hi[:-j]) & (s_lo[j:] == s_lo[:-j])
        eq = eq & (s_own[j:] >= 0) & (s_own[:-j] >= 0)
        return jnp.concatenate([jnp.zeros(j, dtype=bool), eq])

    eqs = []
    cross = []
    for j in range(1, window + 1):
        e = shifted_eq(j)
        x = jnp.concatenate(
            [jnp.zeros(j, dtype=bool), s_side[j:] != s_side[:-j]]
        )
        eqs.append(e)
        cross.append(e & x)

    anyflag = cross[0]
    for c in cross[1:]:
        anyflag = anyflag | c
    over = shifted_eq(window + 1) if M > window + 1 else jnp.zeros(1, bool)
    overflow_run = jnp.sum(over, dtype=jnp.int32)

    n_flagged = jnp.sum(
        sum(c.astype(jnp.int32) for c in cross), dtype=jnp.int32
    )

    # flatten (element, j) pair space and compact
    pair_flags = jnp.stack(cross, axis=1).reshape(-1)  # [M * window]
    (sel,) = jnp.nonzero(pair_flags, size=cap, fill_value=0)
    picked = jnp.arange(cap, dtype=jnp.int32) < n_flagged
    elem = sel // window
    j_off = sel % window + 1
    prev = jnp.clip(elem - j_off, 0, M - 1)

    own_a = s_own[elem]
    own_b = s_own[prev]
    side_a = s_side[elem]
    h_amp = jnp.where(side_a == 1, own_a, own_b)
    h_slot = jnp.where(side_a == 1, s_slot[elem], s_slot[prev])
    l_amp = jnp.where(side_a == 1, own_b, own_a)
    l_slot = jnp.where(side_a == 1, s_slot[prev], s_slot[elem])

    h_amp = jnp.where(picked, h_amp, 0)
    l_amp = jnp.where(picked, l_amp, 0)
    h_slot = jnp.where(picked, h_slot, 0)
    l_slot = jnp.where(picked, l_slot, 0)

    rows_h, len_h = _variant_rows(padded, lengths, h_amp, h_slot, W)
    rows_l, len_l = _variant_rows(padded, lengths, l_amp, l_slot, W)
    good = picked & (len_h == len_l) & jnp.all(rows_h == rows_l, axis=1)

    return h_amp, l_amp, good, n_flagged, overflow_run, sentinel_hits


@partial(jax.jit, static_argnames=("chunk_rows",))
def variant_keys_chunk(padded, lengths, zob, ids, chunk_rows):
    """Variant-hash key arrays for a chunk of amplicons.

    ids: [chunk_rows] global amplicon ids (-1 pad). Returns flattened
    (hi, lo, owner, slot) of length chunk_rows * S.
    """
    rows = padded[jnp.maximum(ids, 0)]
    lens = jnp.where(ids >= 0, lengths[jnp.maximum(ids, 0)], 0)
    (h_hi, h_lo), _, valid = variant_hash_halves(rows, lens, zob)
    S = h_hi.shape[1]
    owner = jnp.where(valid & (ids[:, None] >= 0), ids[:, None], -1)
    slot = jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.int32)[None, :], owner.shape
    )
    return (
        h_hi.reshape(-1), h_lo.reshape(-1),
        owner.reshape(-1), slot.reshape(-1),
    )


class GraftEngine:
    """Device-side graft-candidate discovery for the fastidious pass."""

    CHUNK = 4096

    def __init__(self, padded_np, lengths_np, zob_pair_np):
        self.width = padded_np.shape[1]
        self.padded = jnp.asarray(padded_np)
        self.lengths = jnp.asarray(lengths_np.astype(np.int32))
        self.zob = jnp.asarray(zob_pair_np)
        self.n = padded_np.shape[0]

    def _side_keys(self, amps: np.ndarray):
        his, los, owners, slots = [], [], [], []
        C = self.CHUNK
        for start in range(0, len(amps), C):
            ids = np.full(C, -1, dtype=np.int32)
            sel = amps[start : start + C]
            ids[: len(sel)] = sel
            hi, lo, owner, slot = variant_keys_chunk(
                self.padded, self.lengths, self.zob, jnp.asarray(ids),
                chunk_rows=C,
            )
            his.append(hi)
            los.append(lo)
            owners.append(owner)
            slots.append(slot)
        return (
            jnp.concatenate(his), jnp.concatenate(los),
            jnp.concatenate(owners), jnp.concatenate(slots),
        )

    #: device-resident table-side key budget (keys ~12 bytes; joins add
    #: the streamed chunk and the sort's double buffer on top)
    MAX_TABLE_KEYS = 120_000_000

    def graft_candidates(self, heavy_amps: np.ndarray, light_amps: np.ndarray):
        """(count, graft_cand[n]) — same contract as models/d1.py:_graft_join.

        The smaller side is tabled on device and the bigger side is
        streamed in chunks (the join is symmetric; pair orientation
        comes from the side flags). Very large table sides are further
        processed in strips: triple counts add across strips (each
        tabled amplicon belongs to exactly one) and per-light heavy
        minima merge with an element-wise min.
        """
        keys_per_amp = 8 * self.width + 4
        max_table = max(self.CHUNK, self.MAX_TABLE_KEYS // keys_per_amp)
        table_is_heavy = len(heavy_amps) < len(light_amps)
        table_amps = heavy_amps if table_is_heavy else light_amps
        if len(table_amps) > max_table:
            total = 0
            graft_cand = np.full(self.n, -1, dtype=np.int64)
            for start in range(0, len(table_amps), max_table):
                strip = table_amps[start : start + max_table]
                if table_is_heavy:
                    cnt, cand = self._graft_strip(strip, light_amps)
                else:
                    cnt, cand = self._graft_strip(heavy_amps, strip)
                total += cnt
                both = (graft_cand >= 0) & (cand >= 0)
                graft_cand = np.where(
                    both,
                    np.minimum(graft_cand, cand),
                    np.where(cand >= 0, cand, graft_cand),
                )
            return total, graft_cand
        return self._graft_strip(heavy_amps, light_amps)

    def _graft_strip(self, heavy_amps: np.ndarray, light_amps: np.ndarray):
        graft_cand = np.full(self.n, -1, dtype=np.int64)
        if len(heavy_amps) == 0 or len(light_amps) == 0:
            return 0, graft_cand

        if len(heavy_amps) < len(light_amps):
            table_amps, table_side_val = heavy_amps, 1
            chunk_amps, chunk_side_val = light_amps, 0
        else:
            table_amps, table_side_val = light_amps, 0
            chunk_amps, chunk_side_val = heavy_amps, 1

        tb_hi, tb_lo, tb_own, tb_slot = self._side_keys(table_amps)
        tb_side = jnp.full(tb_hi.shape[0], table_side_val, dtype=jnp.int32)

        total = 0
        all_h, all_l = [], []
        C = self.CHUNK
        for start in range(0, len(chunk_amps), C):
            sel = chunk_amps[start : start + C]
            ids = np.full(C, -1, dtype=np.int32)
            ids[: len(sel)] = sel
            c_hi, c_lo, c_own, c_slot = variant_keys_chunk(
                self.padded, self.lengths, self.zob, jnp.asarray(ids),
                chunk_rows=C,
            )
            t_hi = jnp.concatenate([tb_hi, c_hi])
            t_lo = jnp.concatenate([tb_lo, c_lo])
            t_own = jnp.concatenate([tb_own, c_own])
            t_slot = jnp.concatenate([tb_slot, c_slot])
            t_side = jnp.concatenate(
                [tb_side, jnp.full(c_hi.shape[0], chunk_side_val, jnp.int32)]
            )

            cap = 1 << 16
            window = 8
            while True:
                h_amp, l_amp, good, n_flagged, over, sentinel = graft_chunk(
                    t_hi, t_lo, t_own, t_slot, t_side,
                    self.padded, self.lengths, cap=cap, window=window,
                )
                if int(sentinel) > 0:
                    raise RuntimeError("sentinel collision in graft join")
                if int(over) > 0:
                    window *= 2
                    continue
                if int(n_flagged) > cap:
                    cap *= 2
                    continue
                break

            good_np = np.asarray(good)
            if good_np.any():
                all_h.append(np.asarray(h_amp)[good_np].astype(np.int64))
                all_l.append(np.asarray(l_amp)[good_np].astype(np.int64))
                total += int(good_np.sum())

        if total:
            h = np.concatenate(all_h)
            l = np.concatenate(all_l)
            order = np.lexsort((h, l))
            l_sorted, h_sorted = l[order], h[order]
            first = np.ones(len(l_sorted), dtype=bool)
            first[1:] = l_sorted[1:] != l_sorted[:-1]
            graft_cand[l_sorted[first]] = h_sorted[first]
        return total, graft_cand
