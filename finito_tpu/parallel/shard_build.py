"""Mesh-sharded SBWT construction: distributed sample-sort on the device mesh.

The multi-chip BUILD path for the plain-matrix SBWT (SURVEY.md section 7
phase 2 "multi-host sample-sort", phase 7 "sharded-SBWT variant"): the
single-host constructor (sbwt/construct.py:107, itself the TPU-native
replacement for the reference's NodeBOSSInMemoryConstructor, see
/root/reference/src/tests.cpp:44-46) needs the whole k-mer set in one
address space; at genome scale that host sort is the binding constraint.
Here every set operation of the construction runs sharded over all mesh
devices with XLA collectives:

  * k-mer windows are packed shard-locally, then SAMPLE-SORTED over the
    mesh: each shard radix-sorts its windows (LSD over uint32 planes,
    ops.keys_jax), routes them to the shard owning their splitter bucket
    with one padded `all_to_all`, and dedups locally -- equal keys land
    on one shard by construction, so local dedup is global dedup.
  * source detection ((k-1)-prefix not among (k-1)-suffixes) is a
    distributed hash-join: both sides re-route by a common (k-1)-space
    splitter set, membership resolves shard-locally by combined sort,
    and answers ride the inverse `all_to_all` back to the querying slot.
  * $-padded dummies are generated shard-locally from the compacted
    sources and merged with the k-mers by a second sample-sort round,
    yielding the node set colex-sharded in contiguous ranges.
  * in-edges: suffix-group firsts are found with a halo `ppermute`
    (groups may straddle shard seams), the (group suffix -> global first
    index) map and the per-node prefix queries meet by the same
    (k-1)-space routing, and the resulting (target, char) edge bits are
    routed once more by node-range ownership and scattered into the
    shard-local bit rows.

All exchanges use static-capacity blocks (all_to_all needs equal block
shapes under jit); capacities come from exact counts where a prior pass
provides them (the window exchange) and from slack + overflow-retry
elsewhere (each phase psums an overflow count; the host doubles the
capacity and re-runs on overflow -- exactness is never traded away).

Output equals build_plain_matrix_sbwt bit-for-bit (tests/test_shard_build).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from finito_tpu.ops import keys_jax as kj
from finito_tpu.sbwt import keys as kw
from finito_tpu.sbwt.sbwt import PlainMatrixSBWT

SENT32 = jnp.uint32(0xFFFFFFFF)


def _resent(keys, mask):
    """Force rows where mask is True back to the sentinel (key algebra
    ops on sentinel rows produce valid-looking garbage otherwise)."""
    return jnp.where(mask[:, None], SENT32, keys)


def _exchange(keys, splitters, S, M, payloads=()):
    """Sample-sort exchange inside shard_map: route every non-sentinel
    row to the shard owning its splitter bucket, as one padded
    all_to_all of (S, M)-blocked rows (+ aligned int32 payloads).

    Returns (recv_keys (S*M, P), recv_payloads, overflow_count, order,
    slot, ok): `order`/`slot`/`ok` let the caller scatter per-slot
    ANSWERS (from the inverse all_to_all) back onto its local rows."""
    n, Pp = keys.shape
    order = kj.argsort_rows(keys)
    skeys = jnp.take(keys, order, axis=0)
    spay = [jnp.take(p, order) for p in payloads]
    b = kj.bucket_of(skeys, splitters)  # monotone over the sorted keys
    start = jnp.searchsorted(b, jnp.arange(S, dtype=b.dtype), side="left")
    off = jnp.arange(n, dtype=jnp.int32) - jnp.take(start, jnp.minimum(b, S - 1))
    sent = kj.is_sentinel(skeys)
    ok = (~sent) & (off < M)
    overflow = jnp.sum(((~sent) & (off >= M)).astype(jnp.int32))
    slot = jnp.where(ok, b * M + off, S * M)
    send = kj.sentinel_rows(S * M + 1, Pp).at[slot].set(skeys)[: S * M]
    recv = lax.all_to_all(send, "D", 0, 0, tiled=True)
    rpay = []
    for p in spay:
        ps = jnp.full(S * M + 1, -1, jnp.int32).at[slot].set(p)[: S * M]
        rpay.append(lax.all_to_all(ps, "D", 0, 0, tiled=True))
    return recv, rpay, overflow, order, slot, ok


def _answers_back(ans, order, slot, ok, n, S, M):
    """Inverse all_to_all of per-slot answers -> per-local-row answers
    (-1 where the row wasn't sent)."""
    back = lax.all_to_all(ans, "D", 0, 0, tiled=True)
    got = jnp.where(ok, jnp.take(back, jnp.minimum(slot, S * M - 1)), -1)
    return jnp.full(n, -1, jnp.int32).at[order].set(got)


def _sort_dedup_compact(recv, cap):
    """Sort received rows, drop duplicates and sentinels, compact to the
    front (scatter at cumsum positions preserves order); returns
    (keys (cap, P) sentinel-padded, count)."""
    Pp = recv.shape[1]
    r = jnp.take(recv, kj.argsort_rows(recv), axis=0)
    keep = (~kj.eq_adjacent_rows(r)) & (~kj.is_sentinel(r))
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    m = jnp.sum(keep.astype(jnp.int32))
    out = kj.sentinel_rows(cap + 1, Pp).at[
        jnp.where(keep, jnp.minimum(pos, cap), cap)
    ].set(r)[:cap]
    return out, m


def _flat_mesh(mesh_or_n) -> Mesh:
    if isinstance(mesh_or_n, Mesh):
        devs = mesh_or_n.devices.reshape(-1)
    else:
        devs = np.array(jax.devices()[:mesh_or_n])
    return Mesh(devs.reshape(-1), ("D",))


def _put(mesh, x, spec):
    return jax.device_put(x, NamedSharding(mesh, spec))


def _host_splitters(samples: List[np.ndarray], S: int, Pp: int) -> np.ndarray:
    """S-1 quantile splitters from a small host sample (the control
    plane: a few KB; the data plane stays on device)."""
    planes = kj.from_host(kw.sort_keys(samples))
    n = planes.shape[0]
    if n == 0:
        return np.full((S - 1, Pp), 0xFFFFFFFF, np.uint32)
    idx = ((np.arange(1, S) * n) // S).clip(0, n - 1)
    return planes[idx]


def sharded_sbwt_build(
    seqs: Sequence,
    k: int,
    mesh: Optional[Mesh] = None,
    n_devices: Optional[int] = None,
    slack: float = 1.5,
    return_keys: bool = False,
):
    """Build the plain-matrix SBWT of `seqs` with the node set sharded
    over the mesh (see module docstring). Returns PlainMatrixSBWT
    (+ the colex-sorted node keys if return_keys), bit-identical to
    build_plain_matrix_sbwt."""
    from finito_tpu.io.seqdb import encode_seq

    if k < 2:
        raise ValueError("k must be >= 2")
    mesh = _flat_mesh(mesh if mesh is not None else (n_devices or len(jax.devices())))
    S = mesh.devices.size
    Pp = kj.n_planes(k)

    # ---- host prep: encode, split contiguously by window count, pack
    codes_all = []
    for s in seqs:
        codes = s if isinstance(s, np.ndarray) else encode_seq(
            s if isinstance(s, bytes) else s.encode()
        )
        if np.any(codes == 255):
            raise ValueError("Invalid character in input sequence (only ACGT allowed)")
        if codes.size >= k:
            codes_all.append(codes)
    wins = np.array([c.size - k + 1 for c in codes_all], np.int64)
    total = int(wins.sum())
    if total == 0:
        raise ValueError("no k-mers in input")
    # greedy contiguous split (per-shard host packing mirrors per-host IO)
    bounds = np.searchsorted(np.cumsum(wins), np.arange(1, S) * (total / S))
    groups = np.split(np.arange(len(codes_all)), bounds)
    W = (3 * k + 63) // 64
    shard_keys = [
        kw.concat([kw.pack_windows(codes_all[i], k) for i in g])
        if len(g)
        else kw.empty(W)
        for g in groups
    ]
    N0 = max(1, max(ks[0].size for ks in shard_keys))
    keys0 = np.full((S, N0, Pp), 0xFFFFFFFF, np.uint32)
    for s, ks in enumerate(shard_keys):
        if ks[0].size:
            keys0[s, : ks[0].size] = kj.from_host(ks)

    # splitters: node-key space (1) and (k-1)-suffix space (2)
    stride = max(1, total // (64 * S))
    sample = kw.concat([ks for ks in shard_keys if ks[0].size])
    sample = kw.take(sample, np.arange(0, sample[0].size, stride))
    spl1 = _host_splitters(sample, S, Pp)
    spl2 = _host_splitters(kw.shift_right3(sample), S, Pp)

    dspec, rep = P("D"), P(*([None] * 2))

    # ---- phase A: local sort + exact per-bucket counts
    def _sortA(keys, spl):
        ks = keys[0]
        sk = jnp.take(ks, kj.argsort_rows(ks), axis=0)
        b = kj.bucket_of(sk, spl)
        cnt = jnp.zeros(S, jnp.int32).at[b].add(
            (~kj.is_sentinel(sk)).astype(jnp.int32)
        )
        return sk[None], cnt[None]

    skeys, counts = jax.jit(
        shard_map(_sortA, mesh=mesh, in_specs=(P("D", None, None), rep),
                  out_specs=(P("D", None, None), P("D", None)))
    )(_put(mesh, keys0, P("D", None, None)), _put(mesh, spl1, rep))
    M1 = max(1, int(np.asarray(counts).max()))  # exact: no overflow possible
    R1 = S * M1

    # ---- phase B: window exchange + dedup -> distinct k-mers, sharded
    def _phaseB(sk, spl):
        recv, _, ovf, _, _, _ = _exchange(sk[0], spl, S, M1)
        kmers, m = _sort_dedup_compact(recv, R1)
        return kmers[None], m[None], ovf[None]

    kmers, m_s, ovfB = jax.jit(
        shard_map(_phaseB, mesh=mesh, in_specs=(P("D", None, None), rep),
                  out_specs=(P("D", None, None), P("D"), P("D")))
    )(skeys, _put(mesh, spl1, rep))
    assert int(np.asarray(ovfB).sum()) == 0
    m_host = np.asarray(m_s).astype(np.int64)
    n_kmers = int(m_host.sum())

    # ---- phase C: sources ((k-1)-prefix not among (k-1)-suffixes)
    M2 = max(1, int(np.ceil(slack * R1 / S)))
    while True:
        def _phaseC(km_in, spl):
            km = km_in[0]
            sent = kj.is_sentinel(km)
            suf = _resent(kj.shift_right3_rows(km), sent)
            pre = _resent(kj.mask_low_rows(km, k - 1), sent)
            recvR, _, ovf1, _, _, _ = _exchange(suf, spl, S, M2)
            qidx = jnp.arange(km.shape[0], dtype=jnp.int32)
            recvQ, _, ovf2, order, slot, ok = _exchange(
                pre, spl, S, M2, payloads=(qidx,)
            )
            vals = jnp.where(kj.is_sentinel(recvR), -1, 1).astype(jnp.int32)
            ans = kj.match_rows(recvQ, recvR, vals)
            got = _answers_back(ans, order, slot, ok, km.shape[0], S, M2)
            is_src = (~sent) & (got < 0)
            return is_src[None], jnp.sum(is_src.astype(jnp.int32))[None], (ovf1 + ovf2)[None]

        is_source, n_src, ovfC = jax.jit(
            shard_map(_phaseC, mesh=mesh, in_specs=(P("D", None, None), rep),
                      out_specs=(P("D", None), P("D"), P("D")))
        )(kmers, _put(mesh, spl2, rep))
        if int(np.asarray(ovfC).sum()) == 0:
            break
        M2 *= 2
    cap_src = max(1, int(np.asarray(n_src).max()))

    # ---- phase D: dummies + node sample-sort
    send_max = R1 + (k - 1) * cap_src + 1
    M3 = max(1, int(np.ceil(slack * send_max / S)))
    while True:
        capN = S * M3

        def _phaseD(km_in, src_in, spl):
            km, src_mask = km_in[0], src_in[0]
            pos = jnp.cumsum(src_mask.astype(jnp.int32)) - 1
            srcbuf = kj.sentinel_rows(cap_src + 1, Pp).at[
                jnp.where(src_mask, jnp.minimum(pos, cap_src), cap_src)
            ].set(km)[:cap_src]
            ssent = kj.is_sentinel(srcbuf)
            blocks = [km]
            for j in range(1, k):
                blocks.append(
                    _resent(
                        kj.shift_left_rows(kj.mask_low_rows(srcbuf, j), k - j),
                        ssent,
                    )
                )
            sid = lax.axis_index("D")
            root = jnp.where(
                sid == 0, jnp.zeros((1, Pp), jnp.uint32), kj.sentinel_rows(1, Pp)
            )
            allk = jnp.concatenate(blocks + [root], axis=0)
            recv, _, ovf, _, _, _ = _exchange(allk, spl, S, M3)
            nodes, mn = _sort_dedup_compact(recv, capN)
            return nodes[None], mn[None], ovf[None]

        nodes, mn_s, ovfD = jax.jit(
            shard_map(_phaseD, mesh=mesh,
                      in_specs=(P("D", None, None), P("D", None), rep),
                      out_specs=(P("D", None, None), P("D"), P("D")))
        )(kmers, is_source, _put(mesh, spl1, rep))
        if int(np.asarray(ovfD).sum()) == 0:
            break
        M3 *= 2
    mn_host = np.asarray(mn_s).astype(np.int64)
    n_nodes = int(mn_host.sum())
    node_start = np.zeros(S, np.int32)
    node_start[1:] = np.cumsum(mn_host)[:-1].astype(np.int32)
    capN = S * M3

    # ---- phase E: suffix-group firsts + in-edges -> sharded bit rows
    M4 = max(1, int(np.ceil(slack * capN / S)))
    M5 = max(1, int(np.ceil(slack * capN / S)))
    while True:
        def _phaseE(nd_in, mn_in, nstart, spl):
            nd, m = nd_in[0], mn_in[0]
            cN = nd.shape[0]
            idx = jnp.arange(cN, dtype=jnp.int32)
            valid = idx < m
            nsuf = _resent(kj.shift_right3_rows(nd), ~valid)
            sid = lax.axis_index("D")
            # halo: last valid suffix of the nearest non-empty shard left
            last = jnp.take(nsuf, jnp.maximum(m - 1, 0), axis=0)
            lasts = lax.all_gather(last, "D")
            ms = lax.all_gather(m, "D")
            carry = jnp.full(Pp, SENT32)
            my_halo = carry
            for j in range(S):
                my_halo = jnp.where(sid == j, carry, my_halo)
                carry = jnp.where(ms[j] > 0, lasts[j], carry)
            prev_row = jnp.concatenate([my_halo[None], nsuf[:-1]], axis=0)
            diff = jnp.any(nsuf != prev_row, axis=1)
            gidx = jnp.take(nstart, sid) + idx
            first = valid & (diff | (gidx == 0))
            # (group suffix -> global first index) map, routed by spl2
            gkeys = _resent(nsuf, ~first)
            gvals = jnp.where(first, gidx, -1)
            recvR, rpay, ovfA, _, _, _ = _exchange(
                gkeys, spl, S, M4, payloads=(gvals,)
            )
            # per-node prefix queries
            ch = kj.top_char_rows(nd, k)
            nonroot = valid & (ch != 0)
            qk = _resent(kj.mask_low_rows(nd, k - 1), ~nonroot)
            recvQ, _, ovfB2, order, slot, ok = _exchange(
                qk, spl, S, M4, payloads=(idx,)
            )
            ans = kj.match_rows(recvQ, recvR, rpay[0])
            tf = _answers_back(ans, order, slot, ok, cN, S, M4)
            miss = jnp.sum((nonroot & (tf < 0)).astype(jnp.int32))
            # route (target_first, char) to the owning node-range shard
            eligible = nonroot & (tf >= 0)
            owner = jnp.searchsorted(nstart, jnp.maximum(tf, 0), side="right") - 1
            ownv = jnp.where(eligible, owner.astype(jnp.int32), S)
            ordE = jnp.argsort(ownv, stable=True)
            own_s = jnp.take(ownv, ordE)
            tf_s = jnp.take(tf, ordE)
            ch_s = jnp.take(ch, ordE)
            startE = jnp.searchsorted(own_s, jnp.arange(S, dtype=own_s.dtype))
            offE = idx - jnp.take(startE, jnp.minimum(own_s, S - 1))
            okE = (own_s < S) & (offE < M5)
            ovfC2 = jnp.sum(((own_s < S) & (offE >= M5)).astype(jnp.int32))
            slotE = jnp.where(okE, own_s * M5 + offE, S * M5)
            tf_send = jnp.full(S * M5 + 1, -1, jnp.int32).at[slotE].set(tf_s)[: S * M5]
            ch_send = jnp.zeros(S * M5 + 1, jnp.int32).at[slotE].set(ch_s)[: S * M5]
            tf_r = lax.all_to_all(tf_send, "D", 0, 0, tiled=True)
            ch_r = lax.all_to_all(ch_send, "D", 0, 0, tiled=True)
            okR = tf_r >= 0
            locp = tf_r - jnp.take(nstart, sid)
            bits = jnp.zeros((4, cN), jnp.uint8).at[
                jnp.where(okR, ch_r - 1, 0), jnp.where(okR, locp, cN)
            ].set(1, mode="drop")
            return bits[None], miss[None], (ovfA + ovfB2 + ovfC2)[None]

        bits_sh, miss, ovfE = jax.jit(
            shard_map(_phaseE, mesh=mesh,
                      in_specs=(P("D", None, None), P("D"), P(None), rep),
                      out_specs=(P("D", None, None), P("D"), P("D")))
        )(nodes, mn_s, _put(mesh, node_start, P(None)), _put(mesh, spl2, rep))
        if int(np.asarray(ovfE).sum()) == 0:
            break
        M4 *= 2
        M5 *= 2
    if int(np.asarray(miss).sum()) != 0:
        raise AssertionError("sharded SBWT construction: missing predecessor group")

    bits = np.asarray(bits_sh)  # (S, 4, capN)
    bit_rows = np.concatenate(
        [bits[s][:, : mn_host[s]] for s in range(S)], axis=1
    )
    sbwt = PlainMatrixSBWT.from_bit_rows(bit_rows, k=k, n_kmers=n_kmers)
    if return_keys:
        planes = np.asarray(nodes)
        segs = [planes[s, : mn_host[s]] for s in range(S)]
        node_keys = kj.to_host(np.concatenate(segs, axis=0))
        return sbwt, node_keys
    return sbwt
