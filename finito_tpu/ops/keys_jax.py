"""Device-side multiword packed k-mer keys (uint32 planes).

The construction-time key algebra of finito_tpu.sbwt.keys -- length-k
rows over {$=0, A=1..T=4}, 3 bits/char, colex == numeric order -- for
use INSIDE jit/shard_map, where the mesh-sharded SBWT construction
(parallel.shard_build) sorts, exchanges and matches keys with XLA
collectives. jax_enable_x64 is off everywhere in this package, so a
key is an (n, P) uint32 matrix, plane 0 = least significant 32 bits,
P = 2 * ceil(3k/64) (exactly two planes per host uint64 word).

Padding/overflow slots are the all-ones SENTINEL row: no valid key can
be all-ones (chars are <= 4 = 0b100, so some bit of every 3-bit group
is 0), sentinels compare greater than every valid key (they sort to the
end and stay in the last sample-sort bucket), and equality tests mask
them out explicitly where needed.

Host twins: finito_tpu/sbwt/keys.py (every op here is equality-tested
against it in tests/test_shard_build.py).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

SENT = np.uint32(0xFFFFFFFF)


def n_planes(k: int) -> int:
    return 2 * ((3 * k + 63) // 64)


def from_host(words: List[np.ndarray]) -> np.ndarray:
    """Host uint64 key words (least significant first) -> (n, P) planes."""
    planes = []
    for w in words:
        planes.append((w & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        planes.append((w >> np.uint64(32)).astype(np.uint32))
    return np.stack(planes, axis=1)


def to_host(planes: np.ndarray) -> List[np.ndarray]:
    """(n, P) planes -> host uint64 key words (least significant first)."""
    planes = np.asarray(planes)
    out = []
    for i in range(0, planes.shape[1], 2):
        lo = planes[:, i].astype(np.uint64)
        hi = planes[:, i + 1].astype(np.uint64)
        out.append(lo | (hi << np.uint64(32)))
    return out


def sentinel_rows(n: int, P: int):
    return jnp.full((n, P), SENT, dtype=jnp.uint32)


def is_sentinel(keys) -> jnp.ndarray:
    return jnp.all(keys == SENT, axis=1)


def argsort_rows(keys) -> jnp.ndarray:
    """Indices sorting rows ascending (colex of the packed strings):
    LSD radix -- one stable 32-bit sort per plane, least significant
    plane first."""
    n, P = keys.shape
    order = jnp.arange(n, dtype=jnp.int32)
    for p in range(P):
        col = jnp.take(keys[:, p], order)
        perm = jnp.argsort(col, stable=True)
        order = jnp.take(order, perm)
    return order


def eq_adjacent_rows(keys) -> jnp.ndarray:
    """mask[i] = row i == row i-1 (for sorted input); mask[0] = False."""
    eq = jnp.all(keys[1:] == keys[:-1], axis=1)
    return jnp.concatenate([jnp.zeros(1, dtype=bool), eq])


def cmp_rows(A, B) -> jnp.ndarray:
    """Rowwise three-way compare of equal-shape key matrices:
    -1 / 0 / +1 per row. Planes scanned least significant first; a more
    significant difference overrides."""
    cmp = jnp.zeros(A.shape[0], dtype=jnp.int8)
    for p in range(A.shape[1]):
        a, b = A[:, p], B[:, p]
        c = (a > b).astype(jnp.int8) - (a < b).astype(jnp.int8)
        cmp = jnp.where(c != 0, c, cmp)
    return cmp


def bucket_of(keys, splitters) -> jnp.ndarray:
    """bucket[i] = number of splitters <= keys[i] (splitters: (S-1, P),
    sorted ascending). Sentinels land in the last bucket."""
    n = keys.shape[0]
    b = jnp.zeros(n, dtype=jnp.int32)
    for s in range(splitters.shape[0]):
        ge = cmp_rows(keys, jnp.broadcast_to(splitters[s], keys.shape)) >= 0
        b = b + ge.astype(jnp.int32)
    return b


def shift_right3_rows(keys):
    """Drop the first char: value >> 3 across planes."""
    P = keys.shape[1]
    cols = []
    for i in range(P):
        w = keys[:, i] >> 3
        if i + 1 < P:
            w = w | (keys[:, i + 1] << 29)
        cols.append(w)
    return jnp.stack(cols, axis=1)


def mask_low_rows(keys, chars: int):
    """Keep only the low `chars` characters (3*chars bits)."""
    bit = 3 * chars
    P = keys.shape[1]
    cols = []
    for i in range(P):
        lo, hi = 32 * i, 32 * i + 32
        if bit >= hi:
            cols.append(keys[:, i])
        elif bit <= lo:
            cols.append(jnp.zeros_like(keys[:, i]))
        else:
            cols.append(keys[:, i] & jnp.uint32((1 << (bit - lo)) - 1))
    return jnp.stack(cols, axis=1)


def shift_left_rows(keys, chars: int):
    """value << 3*chars (planes beyond P drop; caller guarantees fit)."""
    bit = 3 * chars
    q, r = bit >> 5, bit & 31
    P = keys.shape[1]
    cols = [jnp.zeros_like(keys[:, 0]) for _ in range(P)]
    for i in range(P):
        j = i + q
        if j < P:
            cols[j] = cols[j] | (keys[:, i] << r)
        if r and j + 1 < P:
            cols[j + 1] = cols[j + 1] | (keys[:, i] >> (32 - r))
    return jnp.stack(cols, axis=1)


def top_char_rows(keys, k: int) -> jnp.ndarray:
    """The last (most significant) char: bits [3(k-1), 3k)."""
    bit = 3 * (k - 1)
    q, r = bit >> 5, bit & 31
    v = keys[:, q] >> r
    if r > 29 and q + 1 < keys.shape[1]:
        v = v | (keys[:, q + 1] << (32 - r))
    return (v & 7).astype(jnp.int32)


def match_rows(Q, R, Rvals) -> jnp.ndarray:
    """For each Q row, Rvals of an equal R row, else -1. Combined
    stable sort + within-run propagation of the R value (static shapes;
    R rows unique among non-sentinels; sentinel Q rows return -1)."""
    nQ, nR = Q.shape[0], R.shape[0]
    comb = jnp.concatenate([Q, R], axis=0)
    order = argsort_rows(comb)
    skeys = jnp.take(comb, order, axis=0)
    new_run = ~eq_adjacent_rows(skeys)
    run_id = jnp.cumsum(new_run.astype(jnp.int32)) - 1
    is_r = order >= nQ
    val = jnp.where(is_r, jnp.take(Rvals, jnp.maximum(order - nQ, 0)), -1)
    n_runs_cap = nQ + nR
    rep = jnp.full(n_runs_cap, -1, dtype=jnp.int32).at[
        jnp.where(is_r, run_id, n_runs_cap - 1)
    ].max(val, mode="drop")
    # (sentinel R rows carry Rvals too -- mask sentinel Q rows below)
    out_sorted = jnp.take(rep, run_id)
    out = jnp.zeros(nQ + nR, dtype=jnp.int32).at[order].set(out_sorted)[:nQ]
    return jnp.where(is_sentinel(Q), -1, out)
