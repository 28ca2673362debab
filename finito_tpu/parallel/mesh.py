"""Multi-device scale-out: (dp, tp) sharding of the query pipeline.

The reference is a single-process CPU program (SURVEY.md section 2.5);
all multi-chip structure here is TPU-native design:

  * dp ("data parallel"): query reads are sharded along the batch axis --
    embarrassingly parallel, rides ICI only for the final gather.
  * tp ("table parallel"): the index's colex axis -- the four bitvectors,
    their rank blocks, and the position table -- is sharded into
    contiguous word-aligned colex ranges, one per tp device. Because
    rank is a prefix sum, a global rank query decomposes into a sum of
    clamped shard-local ranks:

        rank_c(i) = sum_shards rank_c^local(clip(i - start_s, 0, n_s))

    so each extension step is a shard-local gather + one psum over tp --
    no index routing, no host round-trips. The same clamp+psum trick
    gathers from the sharded position table. This is what lets
    pangenome-scale indexes exceed single-chip HBM (BASELINE.json
    configs[4]).

pp/sp/ep axes from the transformer world have no analog here (no
pipeline stages, no attention context, no experts); dp x tp is the
complete parallelism structure of this workload.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from finito_tpu.ops.bitvec import DeviceSBWT


def make_mesh(n_devices: int, tp: int = 2) -> Mesh:
    devices = np.array(jax.devices()[:n_devices])
    if n_devices % tp != 0:
        tp = 1
    dp = n_devices // tp
    return Mesh(devices.reshape(dp, tp), ("dp", "tp"))


@dataclass
class ShardedIndex:
    """Host-side container of per-shard arrays, stacked on a leading tp axis."""

    words: np.ndarray  # (tp, 4, words_per_shard) uint32
    blocks: np.ndarray  # (tp, 4, words_per_shard) int32  (shard-local cumsum)
    loc_table: np.ndarray  # (tp, nodes_per_shard, 2) int32 (unitig id, offset), -1 dummy
    node_start: np.ndarray  # (tp,) int32 first colex rank of each shard
    C: np.ndarray  # (4,) int32
    ends: np.ndarray  # (n_unitigs,) int32 (replicated; small)
    k: int
    n_nodes: int
    words_per_shard: int
    nodes_per_shard: int

    @staticmethod
    def from_index(index, pos_table: np.ndarray, tp: int) -> "ShardedIndex":
        sbwt = index.sbwt
        n = sbwt.number_of_subsets()
        bit_rows = sbwt.bit_rows()
        nodes_per_shard = -(-n // (32 * tp)) * 32  # word-aligned shard width
        words_per_shard = nodes_per_shard // 32
        words = np.zeros((tp, 4, words_per_shard), dtype=np.uint32)
        blocks = np.zeros((tp, 4, words_per_shard), dtype=np.int32)
        loc_sh = np.full((tp, nodes_per_shard, 2), -1, dtype=np.int32)
        node_start = np.zeros(tp, dtype=np.int32)
        from finito_tpu.utils.bits import pack_bits

        # per-colex (uid, offset), resolved once host-side (same tradeoff as
        # engine.build_locate_tables: 2 gathers/k-mer instead of searchsorted)
        k = sbwt.get_k()
        ends64 = np.asarray(index.unitigs.ends, dtype=np.int64)
        g_end = np.asarray(pos_table, dtype=np.int64)
        found = g_end >= 0
        g_start = g_end - k + 1
        uid_all = np.searchsorted(ends64, g_start, side="right").astype(np.int32)
        u_start = np.where(uid_all > 0, ends64[np.maximum(uid_all - 1, 0)], 0)
        off_all = (g_start - u_start).astype(np.int32)
        uid_all = np.where(found, uid_all, -1)
        off_all = np.where(found, off_all, -1)

        for s in range(tp):
            lo = s * nodes_per_shard
            hi = min(n, lo + nodes_per_shard)
            node_start[s] = lo
            if lo >= n:
                continue
            for c in range(4):
                w64 = pack_bits(bit_rows[c, lo:hi])
                w32 = w64.view(np.uint32)[:words_per_shard]
                words[s, c, : w32.size] = w32
                pc = np.bitwise_count(words[s, c]).astype(np.int64)
                blocks[s, c, 1:] = np.cumsum(pc[:-1])
            loc_sh[s, : hi - lo, 0] = uid_all[lo:hi]
            loc_sh[s, : hi - lo, 1] = off_all[lo:hi]
        return ShardedIndex(
            words=words,
            blocks=blocks,
            loc_table=loc_sh,
            node_start=node_start,
            C=np.asarray(sbwt.get_C_array(), dtype=np.int32),
            ends=np.asarray(index.unitigs.ends, dtype=np.int32),
            k=sbwt.get_k(),
            n_nodes=n,
            words_per_shard=words_per_shard,
            nodes_per_shard=nodes_per_shard,
        )


def _local_rank(words, blocks, c, local_i):
    """rank within one shard; local_i already clipped to [0, nodes_per_shard]."""
    w = local_i >> 5
    b = (local_i & 31).astype(jnp.uint32)
    n_words = words.shape[-1]
    flat = c * n_words + w
    # one pad word: clamp w to n_words-1 and zero the mask when local_i is at the end
    at_end = w >= n_words
    w_safe = jnp.minimum(w, n_words - 1)
    flat = c * n_words + w_safe
    word = jnp.take(words.reshape(-1), flat)
    blk = jnp.take(blocks.reshape(-1), flat)
    mask = (jnp.uint32(1) << b) - jnp.uint32(1)
    partial_pc = lax.population_count(word & mask).astype(jnp.int32)
    full_pc = lax.population_count(word).astype(jnp.int32)
    return jnp.where(at_end, blk + full_pc, blk + partial_pc)


def sharded_locate_fn(mesh: Mesh, sh: ShardedIndex):
    """Build a pjit-ed locate: (B, L) codes sharded over dp -> (uid, off).

    Index arrays are sharded over tp on their leading axis; inside
    shard_map each tp device sees its own colex slice and contributes to
    every rank via psum.
    """
    k = sh.k
    n_nodes = sh.n_nodes
    nodes_per_shard = sh.nodes_per_shard

    def locate(words, blocks, loc_table, node_start, C, codes):
        # shapes inside shard_map: words (1, 4, wps), codes (B/dp, L)
        words = words[0]
        blocks = blocks[0]
        loc_table = loc_table[0]
        start = node_start[0]

        def rank_g(c, i):
            local_i = jnp.clip(i - start, 0, nodes_per_shard)
            r = _local_rank(words, blocks, c, local_i)
            return lax.psum(r, "tp")

        def upd(c, lo, hi):
            c = c.astype(jnp.int32)
            valid = (lo >= 0) & (c >= 0) & (c <= 3)
            cs = jnp.where(valid, c, 0)
            los = jnp.where(valid, lo, 0)
            his = jnp.where(valid, hi, 0)
            nlo = C[cs] + rank_g(cs, los)
            nhi = C[cs] + rank_g(cs, his + 1) - 1
            ok = valid & (nlo <= nhi)
            neg = jnp.int32(-1)
            return jnp.where(ok, nlo, neg), jnp.where(ok, nhi, neg)

        L = codes.shape[-1]
        W = L - k + 1
        c = codes.astype(jnp.int32)
        lo = jnp.zeros(codes.shape[:-1] + (W,), jnp.int32)
        hi = jnp.full(codes.shape[:-1] + (W,), n_nodes - 1, jnp.int32)

        def body(j, carry):
            lo, hi = carry
            cj = lax.dynamic_slice_in_dim(c, j, W, axis=-1)
            return upd(cj, lo, hi)

        lo, hi = lax.fori_loop(0, k, body, (lo, hi))
        found = lo >= 0

        # sharded gather from the (uid, off) table: owner shard contributes.
        local_idx = jnp.where(found, lo, 0) - start
        in_shard = (local_idx >= 0) & (local_idx < nodes_per_shard)
        safe = jnp.clip(local_idx, 0, nodes_per_shard - 1)
        uid_c = jnp.where(in_shard, jnp.take(loc_table[:, 0], safe), 0)
        off_c = jnp.where(in_shard, jnp.take(loc_table[:, 1], safe), 0)
        uid = lax.psum(uid_c, "tp")
        off = lax.psum(off_c, "tp")
        # non-owner shards contribute 0; the owner contributes -1 for
        # dummies, so a found-but-dummy rank sums to -1 exactly.
        found = found & (uid >= 0)
        neg = jnp.int32(-1)
        return jnp.where(found, uid, neg), jnp.where(found, off, neg)

    shmapped = shard_map(
        locate,
        mesh=mesh,
        in_specs=(
            P("tp", None, None),  # words
            P("tp", None, None),  # blocks
            P("tp", None, None),  # loc_table
            P("tp"),  # node_start
            P(),  # C
            P("dp", None),  # codes
        ),
        out_specs=(P("dp", None), P("dp", None)),
        check_rep=False,
    )

    @jax.jit
    def run(words, blocks, loc_table, node_start, C, codes):
        return shmapped(words, blocks, loc_table, node_start, C, codes)

    def call(codes):
        args = [
            jax.device_put(x, NamedSharding(mesh, spec))
            for x, spec in (
                (sh.words, P("tp", None, None)),
                (sh.blocks, P("tp", None, None)),
                (sh.loc_table, P("tp", None, None)),
                (sh.node_start, P("tp")),
                (sh.C, P()),
            )
        ]
        codes = jax.device_put(jnp.asarray(codes), NamedSharding(mesh, P("dp", None)))
        return run(*args, codes)

    return call


def sharded_lcs_round_fn(mesh: Mesh):
    """One LCS label-propagation round sharded over dp (demonstration of a
    sharded build step; the scatter is a global permutation so it runs as
    a gather from the all-gathered previous column)."""

    def round_fn(cur, src_flat, dst_flat, lcs, r, k):
        diff = jnp.concatenate([jnp.ones(1, jnp.bool_), cur[1:] != cur[:-1]])
        lcs = jnp.where((lcs == k) & diff, r, lcs)
        nxt = jnp.zeros_like(cur).at[dst_flat].set(cur[src_flat])
        return nxt, lcs

    return jax.jit(round_fn, static_argnames=("k",))
