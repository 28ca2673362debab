"""Mesh-sharded compacted-dBG unitig construction.

The memory-heavy phases of `finito_tpu.dbg.build_unitigs` -- the
canonical k-mer node set (dedup of all windows) and the successor
resolution (8 candidate lookups per node) -- run sharded over all mesh
devices with the same distributed sample-sort / routed-join machinery
as the SBWT mesh build (parallel.shard_build):

  * canonical windows are packed shard-locally (fwd vs RC chosen by a
    rowwise compare), sample-sorted into colex-range shards with one
    padded `all_to_all`, and deduped locally (equal keys land on one
    shard, so local dedup is global);
  * successor candidates (2 orientations x 4 chars, built by device
    key algebra: drop-first == >>3, the candidate's RC incrementally
    from the parent's RC) route to their owning shard, resolve by a
    shard-local merge-join against the local node range, and the
    answers (global node index) ride the inverse `all_to_all` back;
  * out-degrees/successors reduce at the source shard; in-degrees come
    free from the bidirected identity indeg(y) == outdeg(rc(y)) -- no
    extra exchange;
  * the host keeps only the O(n) link/chain control plane (int64 ids +
    one byte per node side) and emission runs through the SAME
    `dbg.links_to_unitigs` as the host builder, so output strings are
    bit-identical (tested).

Canonical mode only (the ggcat-equivalent default; odd k). Exchange
capacities are static under jit with slack + overflow-retry, exactness
never traded (the pattern of parallel.shard_build).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from finito_tpu.ops import keys_jax as kj
from finito_tpu.parallel.shard_build import (
    _answers_back,
    _exchange,
    _flat_mesh,
    _host_splitters,
    _pack_shards,
    _put,
    _resent,
    _sort_dedup_compact,
)
from finito_tpu.sbwt import keys as kw


def _rc_rows(keys, k: int):
    """Device reverse complement of (n, P) packed key planes: char c at
    position p (values 1..4) -> 5-c at position k-1-p. Static k-pass
    loop of plane arithmetic (mirrors dbg._rc_keys on host words)."""
    n, Pp = keys.shape
    out = jnp.zeros((n, Pp), jnp.uint32)
    for p in range(k):
        bit = 3 * p
        q, r = bit >> 5, bit & 31
        c = keys[:, q] >> jnp.uint32(r)
        if r > 29 and q + 1 < Pp:
            c = c | (keys[:, q + 1] << jnp.uint32(32 - r))
        c = (c & jnp.uint32(7)).astype(jnp.uint32)
        comp = jnp.uint32(5) - c
        tb = 3 * (k - 1 - p)
        tq, tr = tb >> 5, tb & 31
        out = out.at[:, tq].set(out[:, tq] | (comp << jnp.uint32(tr)))
        if tr > 29 and tq + 1 < Pp:
            out = out.at[:, tq + 1].set(out[:, tq + 1] | (comp >> jnp.uint32(32 - tr)))
    return out


def _set_top_char_rows(keys, k: int, c: int):
    """keys | (c << 3(k-1)) on (n, P) planes (top slot must be zero)."""
    bit = 3 * (k - 1)
    q, r = bit >> 5, bit & 31
    cv = jnp.uint32(c)
    out = keys.at[:, q].set(keys[:, q] | (cv << jnp.uint32(r)))
    if r > 29 and q + 1 < keys.shape[1]:
        out = out.at[:, q + 1].set(out[:, q + 1] | (cv >> jnp.uint32(32 - r)))
    return out


def sharded_unitig_build(
    seqs: Sequence,
    k: int,
    mesh: Optional[Mesh] = None,
    n_devices: Optional[int] = None,
    slack: float = 1.5,
) -> List[np.ndarray]:
    """build_unitigs(canonical=True) with the node set and successor
    joins sharded over the mesh; returns the same unitig code arrays
    bit-for-bit (tests/test_shard_dbg.py)."""
    from finito_tpu.dbg import _split_valid, links_to_unitigs
    from finito_tpu.sbwt.keys import cmp_keys, rc_keys, select_keys, unpack_char
    from finito_tpu.io.seqdb import encode_seq

    if not (2 <= k <= 250) or k % 2 == 0:
        raise ValueError("sharded unitig build: canonical mode needs odd k in [3, 249]")
    mesh = _flat_mesh(mesh if mesh is not None else (n_devices or len(jax.devices())))
    S = mesh.devices.size
    Pp = kj.n_planes(k)
    rep = P(*([None] * 2))

    # ---- host prep: canonical window keys, split contiguously ----------
    segs: List[np.ndarray] = []
    for s in seqs:
        codes = s if isinstance(s, np.ndarray) else encode_seq(
            s if isinstance(s, bytes) else s.encode()
        )
        segs.extend(
            g for g in _split_valid(np.asarray(codes, np.uint8)) if g.size >= k
        )
    if not segs:
        return []

    def canon_keys(seg):
        fwd = kw.pack_windows(seg, k)
        rc = kw.pack_windows((3 - seg)[::-1], k)
        rc = [w[::-1] for w in rc]
        return select_keys(cmp_keys(fwd, rc) <= 0, fwd, rc)

    keys0, sample, _total = _pack_shards(segs, k, S, canon_keys, mesh)
    spl = _host_splitters(sample, S, Pp)

    # ---- phase A/B: sample-sort + dedup -> nodes, colex-range sharded --
    def _phaseA(keys, spl_):
        ks = keys[0]
        sk = jnp.take(ks, kj.argsort_rows(ks), axis=0)
        b = kj.bucket_of(sk, spl_)
        cnt = jnp.zeros(S, jnp.int32).at[b].add(
            (~kj.is_sentinel(sk)).astype(jnp.int32)
        )
        return sk[None], cnt[None]

    skeys, counts = jax.jit(
        shard_map(_phaseA, mesh=mesh, in_specs=(P("D", None, None), rep),
                  out_specs=(P("D", None, None), P("D", None)))
    )(keys0, _put(mesh, spl, rep))
    M1 = max(1, int(np.asarray(counts).max()))
    R1 = S * M1

    def _phaseB(sk, spl_):
        recv, _, ovf, _, _, _ = _exchange(sk[0], spl_, S, M1)
        nodes, m = _sort_dedup_compact(recv, R1)
        return nodes[None], m[None], ovf[None]

    nodes_sh, m_s, ovfB = jax.jit(
        shard_map(_phaseB, mesh=mesh, in_specs=(P("D", None, None), rep),
                  out_specs=(P("D", None, None), P("D"), P("D")))
    )(skeys, _put(mesh, spl, rep))
    assert int(np.asarray(ovfB).sum()) == 0
    m_host = np.asarray(m_s).astype(np.int64)
    n = int(m_host.sum())
    if 2 * n >= (1 << 31):
        # oriented ids and exchange answers are int32 (as in
        # sharded_finimizer_select, shard_build.py) -- refuse rather
        # than silently wrap at >= 2^30 distinct canonical k-mers
        raise ValueError(f"sharded unitig build supports < 2^30 nodes, got {n}")
    base = np.concatenate([[0], np.cumsum(m_host)[:-1]])  # global id base/shard

    # recompact: nodes occupy the FRONT of each shard's capacity-R1
    # block (sort_dedup_compact); on redundant input the distinct count
    # is far below the window capacity, so reslice before the 8
    # successor exchanges scale their shapes by R1.
    R2 = max(1, int(m_host.max()))
    nodes_sh = nodes_sh[:, :R2]

    # ---- phase S: successor resolution (routed join) -------------------
    # Each shard emits 8 candidate canonical keys per local node
    # (orientation o in {fwd, rc} x extension char c in 1..4), tagged
    # with is_f (candidate stored fwd?) computed at the source. The
    # candidates route by the SAME splitters as the nodes; the owning
    # shard merge-joins them against its node range and answers the
    # GLOBAL node index (base + local row).
    M3 = max(1, int(np.ceil(slack * R2 / S)))
    base_dev = jnp.asarray(base, jnp.int32)

    while True:
        def _phaseS(nodes_in, spl_, base_in):
            nd = nodes_in[0]
            sent = kj.is_sentinel(nd)
            rcn = jnp.where(sent[:, None], jnp.uint32(0xFFFFFFFF), _rc_rows(nd, k))
            gid0 = base_in[0, 0] + jnp.arange(nd.shape[0], dtype=jnp.int32)
            anss = []
            isfs = []
            for o in (0, 1):
                X = nd if o == 0 else rcn
                X_rc = rcn if o == 0 else nd
                bse = kj.shift_right3_rows(X)
                bse_rc = kj.shift_left_rows(kj.mask_low_rows(X_rc, k - 1), 1)
                for c in range(1, 5):
                    y = _set_top_char_rows(bse, k, c)
                    y_rc = bse_rc.at[:, 0].set(bse_rc[:, 0] | jnp.uint32(5 - c))
                    is_f = kj.cmp_rows(y, y_rc) <= 0
                    yc = jnp.where(is_f[:, None], y, y_rc)
                    yc = _resent(yc, sent)
                    recvQ, _, ovf, order, slot, ok = _exchange(yc, spl_, S, M3)
                    ans = kj.match_rows(recvQ, nd, gid0)
                    back = _answers_back(ans, order, slot, ok, nd.shape[0], S, M3)
                    anss.append(back)
                    isfs.append(is_f)
                    if o == 0 and c == 1:
                        ovf_tot = ovf
                    else:
                        ovf_tot = ovf_tot + ovf
            return (
                jnp.stack(anss)[None],      # (8, N) global idx or -1
                jnp.stack(isfs)[None],      # (8, N) candidate stored fwd?
                ovf_tot[None],
            )

        ans8, isf8, ovfS = jax.jit(
            shard_map(_phaseS, mesh=mesh,
                      in_specs=(P("D", None, None), rep, P(None, "D")),
                      out_specs=(P("D", None, None), P("D", None, None), P("D")))
        )(nodes_sh, _put(mesh, spl, rep), _put(mesh, base_dev[None], P(None, "D")))
        if int(np.asarray(ovfS).sum()) == 0:
            break
        M3 *= 2

    # ---- host: assemble degrees/links over global oriented ids ---------
    ans8 = np.asarray(ans8)   # (S, 8, R2)
    isf8 = np.asarray(isf8)
    outdeg = np.zeros(2 * n, np.int8)
    succ = np.full(2 * n, -1, np.int64)
    for s in range(S):
        m = int(m_host[s])
        if m == 0:
            continue
        src_gid = base[s] + np.arange(m, dtype=np.int64)
        for oc in range(8):
            o, _c = divmod(oc, 4)
            a = ans8[s, oc, :m].astype(np.int64)
            f = isf8[s, oc, :m].astype(bool)
            hit = a >= 0
            so = 2 * a + np.where(f, 0, 1)
            src = 2 * src_gid + o
            outdeg[src[hit]] += 1
            succ[src[hit]] = so[hit]
    indeg = outdeg.reshape(-1, 2)[:, ::-1].reshape(-1)  # indeg(y)=outdeg(y^1)

    # ---- emission: identical logic + key fetches from the shards -------
    nodes_np = np.asarray(nodes_sh)  # (S, R2, P)

    def fetch_rows(gids: np.ndarray) -> List[np.ndarray]:
        sh = np.searchsorted(base, gids, side="right") - 1
        loc = gids - base[sh]
        return kj.to_host(nodes_np[sh, loc])

    # per-node top chars (fwd + rc) in global id order
    all_keys = kj.to_host(
        np.concatenate([nodes_np[s, : m_host[s]] for s in range(S)], axis=0)
    )
    top_f = kw.top_char(all_keys, k)
    top_r = kw.top_char(rc_keys(all_keys, k), k)

    def fetch_head_mat(fnode, fori):
        keys = fetch_rows(fnode)
        rck = rc_keys(keys, k)
        sel = [np.where(fori, r, f) for f, r in zip(keys, rck)]
        head_mat = np.empty((fnode.size, k), dtype=np.uint8)
        for p in range(k):
            head_mat[:, p] = unpack_char(sel, p) - 1
        return head_mat

    return links_to_unitigs(
        outdeg, succ, indeg, top_f, top_r, fetch_head_mat, k, True
    )
