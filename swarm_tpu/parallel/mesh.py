"""Sharded d=1 network construction over a jax.sharding.Mesh.

Parallel decomposition (mirrors the reference's per-amplicon work
stealing, src/algod1.cc:641-669, recast as SPMD):

  - mesh axis "amps": the amplicon chunk axis is sharded — every device
    generates variant hashes and joins them against the table for its
    own slice of the chunk (data parallelism over ICI);
  - the sorted sequence-hash table, Zobrist table and abundance ranks
    are replicated (they are small: O(n) u32 words);
  - each device compacts its own candidate list (static per-device
    capacity); per-device counts are returned sharded for overflow
    detection and psum-merged into a replicated total.

Edge merging happens on host: per-device candidate lists concatenate in
device order, and the final (from, to) lexsort makes the edge network
canonical regardless of shard count (SURVEY.md section 7 "multi-host
determinism").
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.neighbors_jax import DeviceNeighborEngine, candidates_body


def make_mesh(n_devices: int = 0) -> Mesh:
    """1-D device mesh over the amplicon axis."""
    devices = jax.devices()
    if n_devices:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("amps",))


def _sharded_body(
    padded, lengths, base_ids, zob, t_hi, t_lo, t_ids, ab_rank,
    cap_local, probes, no_break,
):
    amp, slot, tgt, count = candidates_body(
        padded, lengths, base_ids, zob, t_hi, t_lo, t_ids, ab_rank,
        cap=cap_local, probes=probes, no_break=no_break,
    )
    total = jax.lax.psum(count, "amps")
    return amp, slot, tgt, count[None], total


class ShardedNeighborEngine(DeviceNeighborEngine):
    """DeviceNeighborEngine with the chunk axis sharded over a mesh."""

    def __init__(self, db, chunk: int = 0, mesh: Mesh = None):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_dev = self.mesh.devices.size
        super().__init__(db, chunk=chunk)
        # chunk must split evenly across devices
        per_dev = max(64, -(-self.chunk // self.n_dev))
        self.chunk = per_dev * self.n_dev
        self._fns = {}

    def _shard_fn(self, cap_local: int, no_break: bool):
        key = (cap_local, self.probes, no_break)
        fn = self._fns.get(key)
        if fn is None:
            body = partial(
                _sharded_body,
                cap_local=cap_local,
                probes=self.probes,
                no_break=no_break,
            )
            mapped = jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=(
                    P("amps"), P("amps"), P("amps"),
                    P(), P(), P(), P(), P(),
                ),
                out_specs=(P("amps"), P("amps"), P("amps"), P("amps"), P()),
            )
            fn = jax.jit(mapped)
            self._fns[key] = fn
        return fn

    def _run_chunk(self, pc, lc, ids_j, cap: int, no_break: bool):
        cap_local = max(256, -(-cap // self.n_dev))
        fn = self._shard_fn(cap_local, no_break)
        amp, slot, tgt, counts, total = fn(
            pc, lc, ids_j, self.zob,
            self.table_hi, self.table_lo, self.table_ids, self.ab_rank,
        )
        # a single shard overflowing its local capacity must trigger the
        # retry even when the global total fits
        max_local = int(jnp.max(counts))
        if max_local > cap_local:
            return amp, slot, tgt, jnp.asarray(2 * cap + 1)
        return amp, slot, tgt, total
