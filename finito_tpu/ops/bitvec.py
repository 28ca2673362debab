"""Device-resident plain-matrix SBWT: packed words + rank superblocks.

The TPU-native replacement for sdsl's rank_support_v5 pyramid
(ref: reference uses rank_support_v5 everywhere, SURVEY.md section 2.5):
the four out-edge bitvectors live in HBM as uint32 words with a
precomputed cumulative popcount per word boundary, so

    rank_c(i) = blocks[c, i>>5] + popcount(words[c, i>>5] & ((1<<(i&31))-1))

is two 4-byte gathers + one popcount per query -- a pure
memory-latency-bound batched gather that XLA pipelines across thousands
of lanes. The four characters are stored in one flat array indexed
c * n_words + w so a batch with mixed characters is a single gather.

All indices are int32 (supports up to 2^31-1 SBWT nodes per shard;
pangenome-scale indexes shard the colex axis across devices instead of
widening the index type).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@jax.tree_util.register_pytree_node_class
class DeviceSBWT:
    """Pytree holding the device arrays + static shape info."""

    def __init__(self, words, blocks, C, k: int, n_nodes: int, n_words: int):
        self.words = words  # (4 * n_words,) uint32
        self.blocks = blocks  # (4 * n_words,) int32
        self.C = C  # (4,) int32
        self.k = k
        self.n_nodes = n_nodes
        self.n_words = n_words

    def tree_flatten(self):
        return (self.words, self.blocks, self.C), (self.k, self.n_nodes, self.n_words)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @staticmethod
    def from_host(sbwt) -> "DeviceSBWT":
        """Upload a host PlainMatrixSBWT (64-bit words) as 32-bit words."""
        if sbwt.number_of_subsets() >= 2**31:
            raise ValueError("single-shard DeviceSBWT supports < 2^31 nodes; shard the index")
        n = sbwt.number_of_subsets()
        n_words = (n + 31) // 32 + 1  # +1 pad word so i == n_nodes is safe
        words = np.zeros((4, n_words), dtype=np.uint32)
        blocks = np.zeros((4, n_words), dtype=np.int32)
        for c in range(4):
            w64 = sbwt.words[c]  # already has one zero pad word
            w32 = w64.view(np.uint32)[: n_words]
            pad = np.zeros(n_words, dtype=np.uint32)
            pad[: w32.size] = w32
            words[c] = pad
            pc = np.bitwise_count(pad).astype(np.int64)
            blocks[c, 1:] = np.cumsum(pc[:-1])
        return DeviceSBWT(
            words=jnp.asarray(words.reshape(-1)),
            blocks=jnp.asarray(blocks.reshape(-1)),
            C=jnp.asarray(sbwt.get_C_array(), dtype=jnp.int32),
            k=int(sbwt.get_k()),
            n_nodes=int(n),
            n_words=int(n_words),
        )


def rank(sbwt: DeviceSBWT, c, i):
    """Batched rank_c(i); c int32 in [0,4), i int32 in [0, n_nodes]."""
    w = i >> 5
    b = (i & 31).astype(jnp.uint32)
    flat = c * sbwt.n_words + w
    word = jnp.take(sbwt.words, flat)
    blk = jnp.take(sbwt.blocks, flat)
    mask = (jnp.uint32(1) << b) - jnp.uint32(1)
    return blk + lax.population_count(word & mask).astype(jnp.int32)


def update_interval(sbwt: DeviceSBWT, c, lo, hi):
    """Batched SBWT right-extension (ref formula: common.hh:26-36).

    Empty intervals are (-1, -1); invalid char codes (>3, e.g. pad 255)
    produce empty intervals.
    """
    from finito_tpu.ops.rank24 import select_C

    c = c.astype(jnp.int32)
    valid = (lo >= 0) & (c >= 0) & (c <= 3)
    cs = jnp.where(valid, c, 0)
    los = jnp.where(valid, lo, 0)
    his = jnp.where(valid, hi, 0)
    Cc = select_C(sbwt.C, cs)
    nlo = Cc + rank(sbwt, cs, los)
    nhi = Cc + rank(sbwt, cs, his + 1) - 1
    ok = valid & (nlo <= nhi)
    neg = jnp.int32(-1)
    return jnp.where(ok, nlo, neg), jnp.where(ok, nhi, neg)


def kmer_ranks_fixed(sbwt: DeviceSBWT, codes, k: int):
    """Colex rank of every k-window of every read; -1 where absent.

    codes: (..., L) uint8, pad/invalid = anything > 3. Returns (..., L-k+1)
    int32. This is the divergence-free query primitive: k uniform
    extension steps over all windows at once -- no data-dependent control
    flow, everything batched onto the gather pipeline. (The reference
    amortizes window overlap with a sequential streaming search,
    common.hh:78-186; on TPU the uniform fixed-k form wins by keeping
    every lane busy. A streaming device engine is provided separately.)
    """
    L = codes.shape[-1]
    W = L - k + 1
    c = codes.astype(jnp.int32)
    lo = jnp.zeros(codes.shape[:-1] + (W,), jnp.int32)
    hi = jnp.full(codes.shape[:-1] + (W,), sbwt.n_nodes - 1, jnp.int32)

    def body(j, carry):
        lo, hi = carry
        cj = lax.dynamic_slice_in_dim(c, j, W, axis=-1)
        return update_interval(sbwt, cj, lo, hi)

    lo, hi = lax.fori_loop(0, k, body, (lo, hi))
    return lo


def search_batch_device(sbwt: DeviceSBWT, kmers) -> jnp.ndarray:
    """Batched full-k-mer search: (n, k) codes -> (n,) colex rank or -1."""
    n = kmers.shape[0]
    lo = jnp.zeros(n, jnp.int32)
    hi = jnp.full(n, sbwt.n_nodes - 1, jnp.int32)

    def body(j, carry):
        lo, hi = carry
        return update_interval(sbwt, kmers[:, j], lo, hi)

    lo, hi = lax.fori_loop(0, kmers.shape[1], body, (lo, hi))
    return lo
