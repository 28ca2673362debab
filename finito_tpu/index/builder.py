"""Finimizer index construction (t=1 "rarest" shortest-unique finimizers).

Semantic equivalent of the reference's FinimizerIndexBuilder
(ref: /root/reference/include/FinimizerIndex.hh:262-395). This module is
the exact *oracle*: a per-unitig streaming scan replicating the
reference's candidate ordering, monotone-deque window minimum, and the
cross-unitig "last larger local end wins" canonical-occurrence rule
(FinimizerIndex.hh:370-378), so that the construction fixtures in
/root/reference/src/tests.cpp:62-84 are reproduced bit-exactly.

A batched device-side builder (vmapped scans over length-bucketed unitig
batches) lives in finito_tpu.ops; its output is tested against this
oracle.
"""

from __future__ import annotations

from collections import deque
from typing import Set, Tuple

import numpy as np

from finito_tpu.index.packed_strings import PackedStrings, permute_unitigs
from finito_tpu.io.seqdb import SeqDB
from finito_tpu.sbwt.sbwt import PlainMatrixSBWT
from finito_tpu.utils.bits import bit_width_for_max


def drop_first_char(new_len: int, I: Tuple[int, int], LCS: np.ndarray, n_nodes: int) -> Tuple[int, int]:
    """Left-contraction: widen interval to all nodes sharing a suffix of
    length new_len, guided by the LCS array
    (ref: /root/reference/include/common.hh:38-48)."""
    if I[0] == -1:
        return I
    if new_len <= 0:
        return (0, n_nodes - 1)
    lo, hi = I
    while lo > 0 and LCS[lo] >= new_len:
        lo -= 1
    while hi < n_nodes - 1 and LCS[hi + 1] >= new_len:
        hi += 1
    return (lo, hi)


class FinimizerIndexBuilder:
    """Builds all finimizer-index components from an SBWT + LCS + unitigs."""

    def __init__(self, sbwt: PlainMatrixSBWT, LCS: np.ndarray, unitigs: SeqDB):
        from finito_tpu.index.index import FinimizerIndex

        self.sbwt = sbwt
        self.LCS = np.asarray(LCS, dtype=np.int64)

        n_nodes = sbwt.number_of_subsets()
        fmin_bv = np.zeros(n_nodes, dtype=np.uint8)
        # Local end offset of the last recorded occurrence per node, used by
        # the larger-end-wins rule; reference keeps it in an int_vector
        # initialized to 0 (FinimizerIndex.hh:281).
        fmin_found = np.zeros(n_nodes, dtype=np.int64)
        global_offsets = np.zeros(n_nodes, dtype=np.uint64)

        packed, ustart, _perm = permute_unitigs(sbwt, unitigs)

        finimizers: Set[Tuple[int, int, int]] = set()
        total_len = 0
        for i in range(packed.number_of_strings()):
            codes = packed.get(i)
            finimizers |= self.add_sequence(codes, fmin_bv, fmin_found, global_offsets, total_len)
            total_len += codes.size

        max_off = int(global_offsets.max()) if n_nodes else 0
        width = bit_width_for_max(max_off)
        packed_global_offsets = global_offsets[fmin_bv == 1].astype(np.uint64)

        self.finimizer_stats = finimizers
        index = FinimizerIndex()
        index.sbwt = sbwt
        index.LCS = self.LCS
        index.lcs_width = bit_width_for_max(sbwt.get_k() - 1)
        index.unitigs = packed
        index.fmin = fmin_bv
        index.global_offsets = packed_global_offsets
        index.offsets_width = width
        index.Ustart = ustart
        index.rebuild_rank_supports()
        self._index = index

    def add_sequence(
        self,
        codes: np.ndarray,
        fmin_bv: np.ndarray,
        fmin_found: np.ndarray,
        global_offsets: np.ndarray,
        unitig_start: int,
    ) -> Set[Tuple[int, int, int]]:
        """Streaming shortest-unique-finimizer selection over one unitig.

        Exact replication of FinimizerIndexBuilder::add_sequence
        (ref: FinimizerIndex.hh:321-389): candidate tuples ordered
        (freq, len, colex, end); per-window minimum via monotone deque;
        stats set gathers (len, freq, colex) per window.
        """
        sbwt = self.sbwt
        LCS = self.LCS
        n_nodes = sbwt.number_of_subsets()
        k = sbwt.get_k()
        str_len = int(codes.size)

        all_fmin = deque()
        w_fmin = (n_nodes, k + 1, n_nodes, str_len)
        count_all_w_fmin: Set[Tuple[int, int, int]] = set()

        kmer = 0
        start = 0
        I = (0, n_nodes - 1)
        for end in range(str_len):
            c = int(codes[end])
            I = sbwt.update_interval(c, I)
            freq = I[1] - I[0] + 1
            I_start = I[0]
            if freq == 1:
                while freq == 1:
                    curr_substr = (freq, end - start + 1, I_start, end)
                    start += 1
                    I = drop_first_char(end - start + 1, I, LCS, n_nodes)
                    freq = I[1] - I[0] + 1
                    I_start = I[0]
                if w_fmin > curr_substr:
                    all_fmin.clear()
                    w_fmin = curr_substr
                else:
                    while all_fmin and all_fmin[-1] > curr_substr:
                        all_fmin.pop()
                all_fmin.append(curr_substr)
            if end >= k - 1:
                count_all_w_fmin.add((w_fmin[1], w_fmin[0], w_fmin[2]))
                colex = w_fmin[2]
                if fmin_found[colex] == 0 or fmin_found[colex] < w_fmin[3]:
                    fmin_bv[colex] = 1
                    fmin_found[colex] = w_fmin[3]
                    global_offsets[colex] = unitig_start + w_fmin[3]
                kmer += 1
                while w_fmin[3] - w_fmin[1] + 1 < kmer:
                    all_fmin.popleft()
                    w_fmin = all_fmin[0] if all_fmin else (n_nodes, k + 1, kmer + 1, kmer + k)
        return count_all_w_fmin

    def get_index(self):
        return self._index


def finimizer_stats_string(finimizers, n_kmers: int) -> str:
    """CSV stats line: count,sum_freq,avg_freq,avg_len,n_kmers
    (ref: /root/reference/include/common.hh:188-206; tuples are
    (len, freq, colex))."""
    n = len(finimizers)
    sum_freq = sum(x[1] for x in finimizers)
    sum_len = sum(x[0] for x in finimizers)
    avg_freq = np.float32(sum_freq) / np.float32(n) if n else float("nan")
    avg_len = np.float32(sum_len) / np.float32(n) if n else float("nan")
    return f"{n},{sum_freq},{avg_freq:.6f},{avg_len:.6f},{n_kmers}"
