"""The "replica" device engine: the reference's exact streaming query on
TPU, resolving positions through the index's own dictionaries -- no dense
per-node position table.

This is FinimizerIndex::search (FinimizerIndex.hh:119-185) +
rarest_fmin_streaming_search (common.hh:78-186) re-shaped for the TPU.
Two forms live here:

  * make_replica_locate_v2 (the production form, 3.5 M q/s measured):
    two-phase -- an optimistic chain scan with no inner loops, plus ONE
    post-scan while_loop repairing compacted failure segments with the
    exact recovery state machine (see its docstring).
  * make_replica_locate (the in-scan reference twin, kept as the
    differential arbiter; 0.86 M q/s): one exact chain scan whose k-mer
    interval evolves exactly like the reference's: extension, and on
    failure LCS-guided left-contraction (drop_first_char,
    common.hh:38-48) until the extension succeeds -- a bounded in-step
    recovery loop over packed LCS jump tables (amortized O(1)
    drops/char, same as the reference), with no restart and no repair
    phase.
  * Finimizer candidates collapse to a closed form: when the interval of
    the scanned suffix is a singleton {x}, the SHORTEST unique suffix
    ending there has length SU[x] = max(LCS[x], LCS[x+1]) + 1 and colex
    exactly x (widening [x,x] past both LCS bounds moves neither side).
    The reference discovers the same value with a shrink-from-the-left
    loop (common.hh:145-154); the closed form is one gather. Candidates
    the reference's greedy interval would not emit are always strictly
    dominated by an emitted in-window candidate (the earlier candidate
    has start >= theirs and strictly smaller length), so the per-window
    (len, colex, end)-minimum -- the reference's monotone deque
    (common.hh:155-163) -- is identical.
  * Rightmost Ustart singleton tracking (common.hh:167) is a running
    carry; per window the branch dictionary is used iff that position is
    at/after the window finimizer's end (FinimizerIndex.hh:158-164),
    else the finimizer dictionary -- NOT an optimization: the finimizer
    dictionary stores one canonical occurrence (last-larger-local-end,
    FinimizerIndex.hh:370-378) and the Ustart rule is what makes the
    arithmetic land on the right occurrence.

Memory = serialized index + derived lookup tables (rank24 of the SBWT
and the fmin/Ustart bitvectors, LCS jump/contract/SU arrays) -- the
compact counterpart of the dense/minimizer engines' position tables.
Output equals FinimizerIndex.search bit-exactly (tested vs the oracle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from finito_tpu.ops.rank24 import (
    build_contract_k_table,
    build_edge_table,
    build_lcs_jump_tables,
    build_rank24_tables,
    update_interval24,
    widen_interval,
)
from finito_tpu.ops.streaming import compact_mask

_NO_CAND = 255  # cand_len sentinel (k <= 250 < 255)


def build_su_table(LCS: np.ndarray) -> np.ndarray:
    """SU[x] = max(LCS[x], LCS[x+1]) + 1: length of the shortest unique
    suffix whose singleton interval is {x} (pad LCS[n] = 0)."""
    a = np.asarray(LCS, dtype=np.int64)
    nxt = np.concatenate([a[1:], [0]])
    su = np.maximum(a, nxt) + 1
    if np.any(su >= _NO_CAND):
        raise ValueError("SU table requires k <= 254")
    return su.astype(np.uint8)


def rank1(tab, i):
    """Batched rank over a single-bitvector rank24 table (both forms)."""
    mask = (jnp.uint32(1) << (i & 7).astype(jnp.uint32)) - jnp.uint32(1)
    if tab.ndim == 2:  # wide form past 2^24 bits
        e = jnp.take(tab, i >> 3, axis=0)
        return (e[..., 0] + lax.population_count(e[..., 1] & mask)).astype(jnp.int32)
    e = jnp.take(tab, i >> 3)
    return ((e >> jnp.uint32(8)) + lax.population_count(e & mask)).astype(jnp.int32)


def build_su_ustart_table(LCS: np.ndarray, Ustart: np.ndarray) -> np.ndarray:
    """uint16 per node: SU length (low 8 bits) | Ustart bit << 8 -- one
    gather serves both the candidate closed form and the branch carry."""
    su = build_su_table(LCS).astype(np.uint16)
    return su | (np.asarray(Ustart, np.uint16) << np.uint16(8))


def build_uend_table(ends) -> np.ndarray:
    """rank24 table over the unitig-END positions of the concatenated
    text: uid(g_start) == #{ends <= g_start} == rank(g_start + 1) --
    ONE gather, replacing jnp.searchsorted over the ends array whose
    XLA lowering is a ~log2(n_unitigs)-round binary search of gathers
    per window. +0.5 byte per text position (still the compact engine:
    the SBWT rank24 rows alone are 4x that)."""
    e = np.asarray(ends, dtype=np.int64)
    bits = np.zeros(int(e[-1]) + 2 if e.size else 2, dtype=np.uint8)
    bits[e] = 1
    return build_rank24_tables(bits[None, :])


def make_replica_locate_v2(index, K_seg: int = 4096, chunk: int | None = None):
    """Two-phase exact replica: optimistic chain + segment repair.

    The round-1 replica ran the reference's drop-recovery `while_loop`
    inside every scan step (nested three deep with the widen hops) and
    measured 0.86 M q/s. This form runs the stream engine's optimistic
    chain (3 gathers/base, no inner loops) and repairs only the
    positions within k-1 after a chain failure -- maximal UNTRUSTED
    segments, compacted to one lane each -- with the exact
    recovery state machine in a single post-scan while_loop. Candidates
    collapse to the closed form (SU[x], x) at singleton positions; the
    Ustart carry and the per-window tuple-min run post-hoc on the
    (B, L) candidate grid (VPU scans), and the dictionary resolution
    tail is shared with the in-scan form.

    Output contract: locate(codes) -> (uid, off, n_seg); results are
    valid only when n_seg <= K_seg (caller resizes). Exactness is pinned
    by differential tests vs make_replica_locate (the in-scan reference
    twin) and the host oracle.

    chunk (None = auto, 0/>=L = off) splits each read into
    k-1-overlapped chunks scanned as extra lanes (ops.streaming
    chunk_reads): the sequential phase-A scan is latency-bound at
    read-length trip count, so trading (chunk/(chunk-k+1))x gather
    elements for an L/chunk-times shorter scan wins; trusted chunk
    values are self-certifying and untrusted ones hit the same exact
    repair, so output is unchanged (differentially tested).
    """
    k = index.sbwt.get_k()
    n_nodes = index.sbwt.number_of_subsets()
    tab = jnp.asarray(build_rank24_tables(index.sbwt.bit_rows()))
    n8 = tab.shape[0] // 4
    C = jnp.asarray(index.sbwt.get_C_array(), dtype=jnp.int32)
    ck = jnp.asarray(build_contract_k_table(index.LCS, k))
    jl_np, jr_np = build_lcs_jump_tables(index.LCS)
    jl, jr = jnp.asarray(jl_np), jnp.asarray(jr_np)
    suu = jnp.asarray(build_su_ustart_table(index.LCS, index.Ustart))
    fmin_tab = jnp.asarray(build_rank24_tables(np.asarray(index.fmin, np.uint8)[None, :]))
    ustart_tab = jnp.asarray(build_rank24_tables(np.asarray(index.Ustart, np.uint8)[None, :]))
    goffs = jnp.asarray(index.global_offsets.astype(np.int64), dtype=jnp.int32)
    ends = jnp.asarray(index.unitigs.ends, dtype=jnp.int32)
    uend_tab = jnp.asarray(build_uend_table(index.unitigs.ends))

    edge = jnp.asarray(
        build_edge_table(index.sbwt.bit_rows(), index.sbwt.get_C_array(),
                         np.asarray(ck))
    )
    params = (tab, C, ck, jl, jr, suu, fmin_tab, ustart_tab, goffs, ends, uend_tab, edge)
    NEG = jnp.int32(-1)

    # ---- phase A: optimistic chain (emit, cand_x, untrusted) ------------
    # Hybrid automaton (see ops.streaming.make_chain_scan): immature
    # lanes track the SBWT interval (2 rank gathers/step); at the first
    # close the lane follows the forward-edge table (1 gather/step,
    # sequential-dependency depth 1 -- the scan is latency-bound, so
    # this halves the critical path vs the rank->contract chain).
    def chain_opt(tab, C, ck, edge, codes):
        def upd(c, lo, hi):
            return update_interval24(tab, n8, C, c, lo, hi)

        B, L = codes.shape

        def step(carry, c):
            lo, hi, ks, x, lastfail, j = carry
            invalid = c > 3
            em = x >= 0  # mature: x = node of the k-mer ending at j-1
            xe = jnp.take(edge, jnp.where(em, x * 4 + jnp.where(invalid, 0, c), 0))
            e_found = em & ~invalid & (xe >= 0)
            nlo, nhi = upd(c, lo, hi)
            failed = invalid | (nlo < 0)
            mature = ks == j - k + 1
            close = ~em & ~failed & (j - ks + 1 == k)
            # status: rank on close; full-context non-invalid failure is
            # a DEFINITIVE absent; everything else unknown-until-repair
            emit_i = jnp.where(
                close, nlo, jnp.where(failed & mature & ~invalid, NEG, jnp.int32(-2))
            )
            emit_i = jnp.where(invalid, NEG, emit_i)
            emit = jnp.where(em, jnp.where(e_found, xe, NEG), emit_i)
            # singleton suffix: the k-mer node on mature steps, the
            # interval singleton while immature
            single_i = ~failed & (nlo == nhi)
            cand = jnp.where(
                em,
                jnp.where(e_found, xe, NEG),
                jnp.where(single_i, nlo, NEG),
            )
            any_fail = jnp.where(em, ~e_found, failed)
            lastfail2 = jnp.where(any_fail, j, lastfail)
            untrusted = j - k + 1 <= lastfail2

            x2 = jnp.where(e_found, xe, jnp.where(close, nlo, jnp.int32(-1)))
            # interval carry: extend while immature; parked at the full
            # interval while mature or after a failure (reset state)
            lo2 = jnp.where(failed | em, 0, nlo)
            hi2 = jnp.where(failed | em, n_nodes - 1, nhi)
            ks2 = jnp.where(any_fail, j + 1, jnp.where(em | close, j - k + 2, ks))
            return (lo2, hi2, ks2, x2, lastfail2, j + 1), (emit, cand, untrusted)

        init = (
            jnp.zeros(B, jnp.int32),
            jnp.full(B, n_nodes - 1, jnp.int32),
            jnp.zeros(B, jnp.int32),
            jnp.full(B, -1, jnp.int32),
            jnp.full(B, -(k + 2), jnp.int32),
            jnp.int32(0),
        )
        _, outs = lax.scan(step, init, codes.astype(jnp.int32).T)
        return tuple(o.T for o in outs)  # each (B, L)

    # ---- phase B: exact repair of untrusted segments --------------------
    def repair(P, codes, emit, cand, untrusted):
        (tab, C, ck, jl, jr, suu, fmin_tab, ustart_tab, goffs, ends, uend_tab, edge) = P

        def upd(c, lo, hi):
            return update_interval24(tab, n8, C, c, lo, hi)

        B, L = codes.shape
        flat_c = codes.reshape(-1).astype(jnp.int32)
        u = untrusted
        prev = jnp.concatenate([jnp.zeros((B, 1), jnp.bool_), u[:, :-1]], axis=1)
        seg_start_mask = (u & ~prev).reshape(-1)
        seg_idx, n_seg = compact_mask(seg_start_mask, K_seg)
        sv = seg_idx >= 0
        f_start = jnp.where(sv, seg_idx, 0)
        b_of = f_start // L
        p_start = f_start - b_of * L
        # segment end: last untrusted position of the run = next trusted
        # position - 1; scan from a per-read suffix structure is overkill
        # -- the state machine just stops when it walks onto a trusted
        # position or the read end.
        j0 = jnp.maximum(p_start - (k - 1), 0)

        def cond(st):
            j, ks, lo, hi, rec, active, emit_f, cand_f = st
            return jnp.any(active)

        def body(st):
            j, ks, lo, hi, rec, active, emit_f, cand_f = st
            fj = b_of * L + jnp.minimum(j, L - 1)
            c = jnp.where(active, jnp.take(flat_c, fj), 0)
            invalid = c > 3

            # recovery iteration: ks++, widen, retry handled next round
            do_rec = active & rec
            ks_r = jnp.where(do_rec, ks + 1, ks)
            emptied = do_rec & (ks_r > j)
            wlo, whi = widen_interval(
                jl, jr, jnp.where(do_rec & ~emptied, lo, 0),
                jnp.where(do_rec & ~emptied, hi, 0),
                jnp.where(do_rec & ~emptied, j - ks_r, k + 1), n_nodes,
            )
            lo_r = jnp.where(do_rec & ~emptied, wlo, lo)
            hi_r = jnp.where(do_rec & ~emptied, whi, hi)

            # extension attempt (normal step, post-widen retry, or the
            # emptied reset which consumes c with the full interval)
            lo_t = jnp.where(emptied, 0, lo_r)
            hi_t = jnp.where(emptied, n_nodes - 1, hi_r)
            nlo, nhi = upd(c, lo_t, hi_t)
            ok = active & ~invalid & (nlo >= 0) & ~emptied
            fail_now = active & ~invalid & (nlo < 0) & ~emptied

            ks2 = jnp.where(emptied, j + 1, ks_r)
            single = ok & (nlo == nhi)
            close = ok & (j - ks2 + 1 == k)
            # record exact per-position values while inside the segment
            in_seg = active & (j >= p_start)
            rank_j = jnp.where(close, nlo, NEG)
            cand_j = jnp.where(single, nlo, NEG)
            sink = jnp.where(in_seg & (ok | invalid | emptied), fj, B * L)
            emit_f = emit_f.at[sink].set(rank_j, mode="drop")
            cand_f = cand_f.at[sink].set(cand_j, mode="drop")

            pair = jnp.take(ck, jnp.where(close, nlo, 0), axis=0)
            lo2 = jnp.where(close, pair[:, 0], jnp.where(ok, nlo, lo_t))
            hi2 = jnp.where(close, pair[:, 1], jnp.where(ok, nhi, hi_t))
            ks3 = jnp.where(close, ks2 + 1, ks2)
            # invalid char: reset like phase A
            lo3 = jnp.where(invalid, 0, lo2)
            hi3 = jnp.where(invalid, n_nodes - 1, hi2)
            ks4 = jnp.where(invalid, j + 1, ks3)

            advance = active & (ok | invalid | emptied)
            j2 = jnp.where(advance, j + 1, j)
            rec2 = fail_now
            # stop when walking onto a trusted position past the segment
            # run, or off the read end
            past = advance & (
                (j2 >= L) | ((j2 > p_start) & ~jnp.take(u.reshape(-1), jnp.minimum(b_of * L + jnp.minimum(j2, L - 1), B * L - 1)))
            )
            active2 = active & ~past
            return j2, ks4, lo3, hi3, rec2, active2, emit_f, cand_f

        emit_f = emit.reshape(-1)
        cand_f = cand.reshape(-1)
        st = (
            j0,
            j0,
            jnp.zeros(K_seg, jnp.int32),
            jnp.full(K_seg, n_nodes - 1, jnp.int32),
            jnp.zeros(K_seg, jnp.bool_),
            sv,
            emit_f,
            cand_f,
        )
        _, _, _, _, _, _, emit_f, cand_f = lax.while_loop(cond, body, st)
        return emit_f.reshape(B, L), cand_f.reshape(B, L), n_seg

    # ---- full locate ----------------------------------------------------
    def run(P, codes):
        from finito_tpu.ops.streaming import chunk_reads, unchunk_grid

        (tab, C, ck, jl, jr, suu, fmin_tab, ustart_tab, goffs, ends, uend_tab, edge) = P
        B, L = codes.shape
        W = L - k + 1
        cc_len = chunk
        if cc_len is None:
            from finito_tpu.ops.streaming import auto_chunk

            cc_len = auto_chunk(k, B, L)  # v5e lane-saturation rule
        if k <= cc_len < L:
            emit, cand, untrusted = (
                unchunk_grid(g, B, L, k, cc_len)
                for g in chain_opt(tab, C, ck, edge, chunk_reads(codes, k, cc_len))
            )
        else:
            emit, cand, untrusted = chain_opt(tab, C, ck, edge, codes)
        emit, cand, n_seg = repair(P, codes, emit, cand, untrusted)

        ranks = emit[:, k - 1 :]  # (B, W)
        found = ranks >= 0

        # candidate lengths + Ustart flags: one gather on the cand grid
        safe_x = jnp.where(cand >= 0, cand, 0)
        sw = jnp.take(suu, safe_x).astype(jnp.int32)
        cl = jnp.where(cand >= 0, sw & 0xFF, _NO_CAND)
        u_flag = (cand >= 0) & ((sw >> 8) & 1 == 1)

        # rightmost Ustart singleton carry: "last non-null" associative scan
        jpos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
        up0 = jnp.where(u_flag, jpos, NEG)
        ux0 = jnp.where(u_flag, cand, 0)

        def comb(a, b):
            aj, ax = a
            bj, bx = b
            pick_b = bj >= 0
            return jnp.where(pick_b, bj, aj), jnp.where(pick_b, bx, ax)

        up, ux = lax.associative_scan(comb, (up0, ux0), axis=1)

        cc = jnp.where(cand >= 0, cand, 0)
        fin_len = jnp.full((B, W), _NO_CAND, jnp.int32)
        fin_colex = jnp.zeros((B, W), jnp.int32)
        fin_r = jnp.zeros((B, W), jnp.int32)
        for r in range(k):
            cl_r = lax.dynamic_slice_in_dim(cl, r, W, axis=1)
            cc_r = lax.dynamic_slice_in_dim(cc, r, W, axis=1)
            okc = cl_r <= r + 1
            better = okc & ((cl_r < fin_len) | ((cl_r == fin_len) & (cc_r < fin_colex)))
            fin_len = jnp.where(better, cl_r, fin_len)
            fin_colex = jnp.where(better, cc_r, fin_colex)
            fin_r = jnp.where(better, r, fin_r)

        up_w = up[:, k - 1 :]
        ux_w = ux[:, k - 1 :]
        ws = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
        use_branch = found & (up_w >= ws + fin_r)

        safe_ux = jnp.where(use_branch, ux_w, 0)
        urank = rank1(ustart_tab, safe_ux)
        u_gstart = jnp.where(urank > 0, jnp.take(ends, jnp.maximum(urank - 1, 0)), 0)
        g_end_branch = u_gstart + (k - 1) + ((ws + k - 1) - up_w)

        safe_fx = jnp.where(found, fin_colex, 0)
        frank = rank1(fmin_tab, safe_fx)
        g_end_fin = jnp.take(goffs, jnp.clip(frank, 0, goffs.shape[0] - 1)) + (
            (k - 1) - fin_r
        )

        g_end = jnp.where(use_branch, g_end_branch, g_end_fin)
        g_start = g_end - k + 1
        # uid via one rank gather on the unitig-end bitvector (see
        # build_uend_table) instead of a log-round searchsorted
        uid = rank1(uend_tab, jnp.where(found, g_start, 0) + 1)
        u_start2 = jnp.where(uid > 0, jnp.take(ends, jnp.maximum(uid - 1, 0)), 0)
        off = g_start - u_start2
        return (
            jnp.where(found, uid, NEG),
            jnp.where(found, off, NEG),
            n_seg,
        )

    jitted = jax.jit(run)

    def locate(codes):
        return jitted(params, jnp.asarray(codes))

    return locate


def make_replica_locate(index):
    """(B, L) codes (np/jnp uint8, pad 255) -> ((B, W) uid, (B, W) off).

    Self-contained: derives its device tables from the loaded index
    (no DeviceSBWT upload; rank runs on the rank24 tables below).
    """
    k = index.sbwt.get_k()
    n_nodes = index.sbwt.number_of_subsets()
    tab = jnp.asarray(build_rank24_tables(index.sbwt.bit_rows()))
    n8 = tab.shape[0] // 4
    C = jnp.asarray(index.sbwt.get_C_array(), dtype=jnp.int32)
    ck = jnp.asarray(build_contract_k_table(index.LCS, k))
    jl_np, jr_np = build_lcs_jump_tables(index.LCS)
    jl, jr = jnp.asarray(jl_np), jnp.asarray(jr_np)
    su = jnp.asarray(build_su_table(index.LCS))
    fmin_tab = jnp.asarray(build_rank24_tables(np.asarray(index.fmin, np.uint8)[None, :]))
    ustart_tab = jnp.asarray(build_rank24_tables(np.asarray(index.Ustart, np.uint8)[None, :]))
    ustart_bits = jnp.asarray(np.asarray(index.Ustart, np.uint8))
    goffs = jnp.asarray(index.global_offsets.astype(np.int64), dtype=jnp.int32)
    ends = jnp.asarray(index.unitigs.ends, dtype=jnp.int32)

    # arrays ride as one jit argument pytree (closure constants would be
    # baked into the HLO, breaking remote compiles for big indexes)
    uend_tab = jnp.asarray(build_uend_table(index.unitigs.ends))
    params = (tab, C, ck, jl, jr, su, fmin_tab, ustart_tab, ustart_bits, goffs, ends, uend_tab)

    # -------- exact chain scan with drop-based recovery ------------------
    def chain(P, codes):
        (tab, C, ck, jl, jr, su, fmin_tab, ustart_tab, ustart_bits, goffs, ends, uend_tab) = P

        def upd(c, lo, hi):
            return update_interval24(tab, n8, C, c, lo, hi)

        B, L = codes.shape

        def step(carry, c):
            lo, hi, ks, up, ux, j = carry
            invalid = c > 3
            nlo, nhi = upd(c, lo, hi)

            # recovery: advance ks + widen until the extension succeeds or
            # the suffix empties (oracle common.hh:116-127). Pads (invalid
            # chars) reset immediately instead of looping.
            def cond(st):
                nlo, nhi, lo, hi, ks, need = st
                return jnp.any(need)

            def body(st):
                nlo, nhi, lo, hi, ks, need = st
                ks2 = jnp.where(need, ks + 1, ks)
                emptied = need & (ks2 > j)
                widen_len = jnp.where(need, j - ks2, jnp.int32(k + 1))
                wlo, whi = widen_interval(jl, jr, lo, hi, widen_len, n_nodes)
                lo2 = jnp.where(need & ~emptied, wlo, lo)
                hi2 = jnp.where(need & ~emptied, whi, hi)
                rlo, rhi = upd(c, lo2, hi2)
                nlo2 = jnp.where(need, rlo, nlo)
                nhi2 = jnp.where(need, rhi, nhi)
                # emptied lanes: interval of the empty string, c unconsumed
                nlo2 = jnp.where(emptied, 0, nlo2)
                nhi2 = jnp.where(emptied, n_nodes - 1, nhi2)
                need2 = need & ~emptied & (rlo < 0)
                return nlo2, nhi2, lo2, hi2, ks2, need2

            failed = nlo < 0
            ks = jnp.where(invalid, j + 1, ks)
            need0 = failed & ~invalid
            nlo, nhi, _, _, ks, _ = lax.while_loop(
                cond, body, (nlo, nhi, lo, hi, ks, need0)
            )
            nlo = jnp.where(invalid, 0, nlo)
            nhi = jnp.where(invalid, n_nodes - 1, nhi)

            # candidate: singleton suffix => shortest unique suffix ends here
            single = (nlo == nhi) & (ks <= j) & ~invalid
            cand_len = jnp.where(
                single, jnp.take(su, jnp.where(single, nlo, 0)).astype(jnp.int32), _NO_CAND
            )
            cand_colex = jnp.where(single, nlo, 0)

            # rightmost Ustart singleton so far (carry over the whole read)
            u_here = single & (jnp.take(ustart_bits, jnp.where(single, nlo, 0)) == 1)
            up2 = jnp.where(u_here, j, up)
            ux2 = jnp.where(u_here, nlo, ux)

            close = (j - ks + 1 == k) & ~invalid
            emit = jnp.where(close, nlo, -1)

            # window slide on close (oracle line 124-125): ks++ and contract
            pair = jnp.take(ck, jnp.where(close, nlo, 0), axis=0)
            lo2 = jnp.where(close, pair[:, 0], nlo)
            hi2 = jnp.where(close, pair[:, 1], nhi)
            ks2 = jnp.where(close, ks + 1, ks)
            return (lo2, hi2, ks2, up2, ux2, j + 1), (emit, cand_len, cand_colex, up2, ux2)

        init = (
            jnp.zeros(B, jnp.int32),
            jnp.full(B, n_nodes - 1, jnp.int32),
            jnp.zeros(B, jnp.int32),
            jnp.full(B, -1, jnp.int32),
            jnp.zeros(B, jnp.int32),
            jnp.int32(0),
        )
        _, outs = lax.scan(step, init, codes.astype(jnp.int32).T)
        return tuple(o.T for o in outs)  # each (B, L)

    # ---------------------------- full locate ----------------------------
    def run(P, codes):
        (tab, C, ck, jl, jr, su, fmin_tab, ustart_tab, ustart_bits, goffs, ends, uend_tab) = P
        B, L = codes.shape
        W = L - k + 1
        emit, cl, cc, up, ux = chain(P, codes)
        ranks = emit[:, k - 1 :]  # (B, W)
        found = ranks >= 0

        # per-window finimizer: (len, colex, end)-min over in-window
        # candidates whose start is inside the window (len <= r + 1)
        fin_len = jnp.full((B, W), _NO_CAND, jnp.int32)
        fin_colex = jnp.zeros((B, W), jnp.int32)
        fin_r = jnp.zeros((B, W), jnp.int32)
        for r in range(k):
            cl_r = lax.dynamic_slice_in_dim(cl, r, W, axis=1)
            cc_r = lax.dynamic_slice_in_dim(cc, r, W, axis=1)
            ok = cl_r <= r + 1  # excludes _NO_CAND (255 > k)
            better = ok & ((cl_r < fin_len) | ((cl_r == fin_len) & (cc_r < fin_colex)))
            fin_len = jnp.where(better, cl_r, fin_len)
            fin_colex = jnp.where(better, cc_r, fin_colex)
            fin_r = jnp.where(better, r, fin_r)

        # rightmost Ustart singleton at the window close, used iff it sits
        # at/after the finimizer end (FinimizerIndex.hh:158-164)
        up_w = up[:, k - 1 :]
        ux_w = ux[:, k - 1 :]
        ws = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
        use_branch = found & (up_w >= ws + fin_r)

        # branch dictionary (common.hh:61-67)
        safe_ux = jnp.where(use_branch, ux_w, 0)
        urank = rank1(ustart_tab, safe_ux)
        u_gstart = jnp.where(urank > 0, jnp.take(ends, jnp.maximum(urank - 1, 0)), 0)
        g_end_branch = u_gstart + (k - 1) + ((ws + k - 1) - up_w)

        # finimizer dictionary (common.hh:69-72)
        safe_fx = jnp.where(found, fin_colex, 0)
        frank = rank1(fmin_tab, safe_fx)
        g_end_fin = jnp.take(goffs, jnp.clip(frank, 0, goffs.shape[0] - 1)) + (
            (k - 1) - fin_r
        )

        g_end = jnp.where(use_branch, g_end_branch, g_end_fin)
        g_start = g_end - k + 1
        uid = rank1(uend_tab, jnp.where(found, g_start, 0) + 1)
        u_start2 = jnp.where(uid > 0, jnp.take(ends, jnp.maximum(uid - 1, 0)), 0)
        off = g_start - u_start2
        neg = jnp.int32(-1)
        return jnp.where(found, uid, neg), jnp.where(found, off, neg)

    jitted = jax.jit(run)

    def locate(codes):
        return jitted(params, jnp.asarray(codes))

    return locate
