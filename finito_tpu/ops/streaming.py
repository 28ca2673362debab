"""Two-phase streaming k-mer rank engine: optimistic chain + verify.

Data-dependent while_loops inside a lax.scan cost milliseconds per
iteration on TPU (measured ~4ms at 16k lanes), so the reference's
streaming recovery loop (common.hh:116-126) cannot be transplanted
per-step. Instead:

Phase A -- "chain" scan (no whiles, 3 gathers/step): track the interval
of seq[ks..j]. On a window close (length == k) the k-mer is FOUND
definitively (emit its singleton rank) and the window slides by the
precomputed (k-1)-contraction (one row gather). On extension failure:
  * if the chain had full (k-1)-length context, the window ending at j
    is definitively ABSENT;
  * otherwise the window is UNKNOWN;
and the chain resets (ks = j+1). Windows closing while the chain is
immature are UNKNOWN.

Phase B -- batched verification: UNKNOWN windows are compacted host-side
and re-searched with plain k-step extension and early exit (one
while_loop per *phase*, <= k iterations, lanes retire as intervals
empty). For mostly-present reads phase B is nearly empty; for
absent-heavy reads it costs ~(absent fraction) of a fixed-k pass with
early exit.

Output equals ops.bitvec.kmer_ranks_fixed exactly (tested).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from finito_tpu.ops.rank24 import update_interval24

UNKNOWN = -2


def blocked_cumsum_i32(x):
    """Inclusive cumsum of a flat int32 array via a 2-level blocked scan.

    XLA lowers a long 1-D cumsum on TPU as a serial slice-reduce chain
    (~2.4 ms at 802k elements); reshaping to (rows, 128) and scanning
    rows in parallel + a short scan over row totals runs near VPU speed.
    Pads internally; returns the same length as x."""
    n = x.size
    C = 128
    rows = -(-n // C)
    xp = jnp.zeros(rows * C, jnp.int32).at[:n].set(x.astype(jnp.int32))
    m = xp.reshape(rows, C)
    within = jnp.cumsum(m, axis=1)  # parallel across rows
    row_tot = within[:, -1]
    row_off = jnp.cumsum(row_tot) - row_tot  # short 1-D scan (rows elems)
    return (within + row_off[:, None]).reshape(-1)[:n]


def compact_mask(mask, K: int):
    """Indices of the first K set positions of a flat bool mask, padded
    with -1, plus the true count. Hand-rolled blocked-cumsum + scatter:
    XLA lowers jnp.nonzero(size=K) through a sort (~17ms at 1.6M
    elements on v5e vs ~4ms for this form)."""
    pos = blocked_cumsum_i32(mask.astype(jnp.int32)) - 1
    n = jnp.where(mask.size > 0, pos[-1] + 1, 0)
    sink = jnp.where(mask & (pos < K), pos, K)
    out = jnp.full(K, -1, jnp.int32).at[sink].set(
        jnp.arange(mask.size, dtype=jnp.int32), mode="drop"
    )
    return out, n


AUTO_CHUNK_LANES = 8192  # measured v5e scan-lane saturation point


def auto_chunk(k: int, B: int, L: int) -> int:
    """Default chain-scan chunk length (0 = scan whole reads).

    With the forward-edge chain the scan step's critical path is one
    gather and measured v5e throughput saturates near ~8k total lanes:
    at k=31, L=128, B=8192 the UNchunked scan wins every chunked split
    (replica 4.78 M q/s vs 4.21 M at chunk 62 and 4.47 M at 96; stream
    6.19 M vs 4.91 M at 48 -- round-4 sweep). Chunking still pays when
    the batch itself is too small to fill the device: pick the chunk
    that lifts B * n_chunks to ~AUTO_CHUNK_LANES, else scan whole
    reads. Shared by the stream and replica engines so a retune happens
    in exactly one place."""
    if 2 * B > AUTO_CHUNK_LANES or L < 2 * k:
        return 0
    n_ch = max(1, AUTO_CHUNK_LANES // B)
    W = L - k + 1
    return k - 1 + -(-W // n_ch)


def n_chunks(L: int, k: int, C: int) -> int:
    """Chunks of length C with k-1 overlap covering a length-L read."""
    S = C - k + 1
    return -(-(L - (k - 1)) // S)


def chunk_reads(codes, k: int, C: int):
    """(B, L) codes -> (B * n_ch, C) overlapping chunks, stride C-k+1,
    positions past L padded with 255 (invalid).

    The chain state at any MATURE position is a function of the last k
    characters only (each close contracts to the (k-1)-suffix), so a
    chunk seeded k-1 characters early reproduces the full-read chain at
    every payload position; chunk-local immaturity lands entirely in the
    discarded overlap. Trusted chunk values are self-certifying: a
    mature close IS the k-mer's interval computed from the empty string,
    and a mature failure IS an empty k-mer interval, regardless of what
    the full-read chain tracked there. Chunking therefore shortens the
    sequential scan ~L/C times at the cost of (C/(C-k+1))x gather
    elements -- a win whenever the scan is latency- not
    throughput-bound (measured: it is, see bench_micro)."""
    B, L = codes.shape
    if not (k <= C <= L):
        raise ValueError(f"need k <= chunk <= L (k={k}, chunk={C}, L={L})")
    S = C - k + 1
    idx = jnp.arange(n_chunks(L, k, C), dtype=jnp.int32)[:, None] * S + jnp.arange(
        C, dtype=jnp.int32
    )[None, :]
    ch = jnp.take(codes, jnp.minimum(idx, L - 1), axis=1)  # (B, n_ch, C)
    ch = jnp.where(idx[None, :, :] < L, ch, jnp.uint8(255).astype(codes.dtype))
    return ch.reshape(B * idx.shape[0], C)


def unchunk_grid(grid_ch, B: int, L: int, k: int, C: int):
    """(B * n_ch, C) per-position grid -> (B, L): chunk 0 contributes
    its first k-1 positions, every chunk its payload [k-1, C)."""
    S = C - k + 1
    g = grid_ch.reshape(B, -1, C)
    head = g[:, 0, : k - 1]
    payload = g[:, :, k - 1 :].reshape(B, -1)
    return jnp.concatenate([head, payload], axis=1)[:, :L]


def make_chain_scan(n8: int, k: int, n_nodes: int):
    """Phase A. run(tab, C, contract_k, edge, codes): (B, L) codes ->
    (B, L) per-position status: rank >= 0 found, -1 definitively absent,
    -2 unknown (positions < k-1 are meaningless and set to -1 by the
    caller's slice). Index arrays are call ARGUMENTS so jitted callers
    don't embed them as HLO constants (breaks remote compiles at scale).

    Hybrid automaton: an IMMATURE lane tracks the SBWT interval of
    seq[ks..j] (2 rank gathers/step) exactly like the reference's
    streaming scan; at the first window close it hands the singleton to
    the MATURE mode, which follows the precomputed forward-edge table
    (ops.rank24.build_edge_table, 1 gather/step, critical-path depth 1).
    The two modes emit bit-identical values (a mature close IS the edge
    transition: contract-to-(k-1)-suffix + extend == edge[4x+c]); on any
    failure the lane resets to immature with ks = j+1."""

    def step(tab, C, contract_k, edge, carry, c):
        def upd(c, lo, hi):
            return update_interval24(tab, n8, C, c, lo, hi)

        lo, hi, ks, x, j = carry  # interval of seq[ks..j-1]; x >= 0 <=> mature
        invalid = c > 3
        em = x >= 0
        # mature path: one gather, depth-1 sequential dependency
        xe = jnp.take(edge, jnp.where(em, x * 4 + jnp.where(invalid, 0, c), 0))
        e_found = em & ~invalid & (xe >= 0)
        # immature path (also runs for mature lanes on safe indices)
        nlo, nhi = upd(c, lo, hi)
        failed = invalid | (nlo < 0)
        had_full_context = ks == j - k + 1  # chain length entering was k-1
        close = ~em & ~failed & (j - ks + 1 == k)

        emit_i = jnp.where(
            close,
            nlo,
            jnp.where(failed & had_full_context & ~invalid, -1, UNKNOWN),
        )
        emit_i = jnp.where(invalid, -1, emit_i)
        # mature lanes always have full context: found or definitive absent
        emit = jnp.where(em, jnp.where(e_found, xe, -1), emit_i)

        # next mature node: edge transition, or immature close's singleton
        x2 = jnp.where(e_found, xe, jnp.where(close, nlo, -1))
        # immature carry: extend on success, reset on failure; parked at
        # the full interval while mature (never consulted, kept safe)
        any_fail = jnp.where(em, ~e_found, failed)
        lo2 = jnp.where(failed | em, 0, nlo)
        hi2 = jnp.where(failed | em, n_nodes - 1, nhi)
        ks2 = jnp.where(any_fail, j + 1, jnp.where(em | close, j - k + 2, ks))
        return (lo2, hi2, ks2, x2, j + 1), emit

    def run(tab, C, contract_k, edge, codes):
        B, L = codes.shape
        init = (
            jnp.zeros(B, jnp.int32),
            jnp.full(B, n_nodes - 1, jnp.int32),
            jnp.zeros(B, jnp.int32),
            jnp.full(B, -1, jnp.int32),
            jnp.int32(0),
        )
        _, emitted = lax.scan(
            lambda carry, c: step(tab, C, contract_k, edge, carry, c),
            init,
            codes.astype(jnp.int32).T,
        )
        return emitted.T  # (B, L); window ending at j -> start j-k+1

    return run


def make_window_verifier(n8: int, k: int, n_nodes: int):
    """Phase B. run(tab, C, codes_flat, starts, valid): verify a compacted
    set of windows by plain extension with early exit. starts are flat
    offsets (start = lane*L + s). Returns (K,) rank/-1."""

    def run(tab, C, codes_flat, starts, valid):
        def upd(c, lo, hi):
            return update_interval24(tab, n8, C, c, lo, hi)

        K = starts.shape[0]
        lo = jnp.zeros(K, jnp.int32)
        hi = jnp.full(K, n_nodes - 1, jnp.int32)

        def cond(st):
            j, lo, hi, active = st
            return (j < k) & jnp.any(active)

        def body(st):
            j, lo, hi, active = st
            c = jnp.take(codes_flat, starts + j).astype(jnp.int32)
            nlo, nhi = upd(c, lo, hi)
            lo2 = jnp.where(active, nlo, lo)
            hi2 = jnp.where(active, nhi, hi)
            return j + 1, lo2, hi2, active & (nlo >= 0)

        j, lo, hi, active = lax.while_loop(
            cond, body, (jnp.int32(0), lo, hi, valid)
        )
        # survived all k steps with nonempty interval -> rank
        return jnp.where(valid & (lo >= 0) & (j == k), lo, -1)

    return run


def make_chain_stream_ranks(n8: int, k: int, n_nodes: int, K: int, chunk: int | None = None):
    """Fully device-resident two-phase pipeline (single dispatch).

    Returns run(tab, C, contract_k, edge, codes) -> ((B, W) ranks,
    n_unknown). K bounds the number of UNKNOWN windows verified
    on-device; if n_unknown > K the caller MUST re-run with a larger K
    (unverified windows must never be reported). n_unknown also lets
    callers right-size K for steady-state workloads. chunk (None = auto:
    auto_chunk at trace time from the batch shape; 0 = whole reads)
    splits each read into k-1-overlapped chunks scanned as extra lanes
    (see chunk_reads); exactness is unaffected, UNKNOWN count can only
    grow (chunk-local failures), and every UNKNOWN is re-verified."""
    chain = make_chain_scan(n8, k, n_nodes)
    verify = make_window_verifier(n8, k, n_nodes)

    def run(tab, C, contract_k, edge, codes):
        B, L = codes.shape
        W = L - k + 1
        eff = auto_chunk(k, B, L) if chunk is None else chunk
        if k <= eff < L:
            status = unchunk_grid(
                chain(tab, C, contract_k, edge, chunk_reads(codes, k, eff)),
                B, L, k, eff,
            )[:, k - 1 :]
        else:
            status = chain(tab, C, contract_k, edge, codes)[:, k - 1 :]  # (B, W)
        mask = (status == UNKNOWN).reshape(-1)
        flat_idx, n_unknown = compact_mask(mask, K)
        valid = flat_idx >= 0
        lane = jnp.where(valid, flat_idx, 0) // W
        w = jnp.where(valid, flat_idx, 0) % W
        starts = (lane * L + w).astype(jnp.int32)
        verified = verify(tab, C, codes.reshape(-1), starts, valid)
        status_flat = status.reshape(-1)
        # fill index B*W is out of bounds and dropped (negative would wrap!)
        status_flat = status_flat.at[jnp.where(valid, flat_idx, B * W)].set(
            verified, mode="drop"
        )
        return status_flat.reshape(B, W), n_unknown

    return run
