"""Genome-scale shard-local build + CPU-mesh verification (BASELINE
configs[3]: whole-genome scale, k=63).

Builds a ShardedMinimizerIndex DIRECTLY from a >= 1 Gbp synthetic DSPSS
(shard-local construction -- no single-host index, the path that lifts
the old 2^31-base cap), runs the (dp, tp) sharded locate on a virtual
CPU mesh, and verifies every window of every read against the ANALYTIC
oracle: in a DSPSS each k-mer occurs exactly once, at the unitig whose
genome cut-range contains its genome start, so the expected
(uid, offset) of a read sampled at genome position p is computable in
closed form -- an oracle with no index at all (mutated windows are
absent: a random 63-mer collides with a 10^9-base set with probability
~1e-29). Reads are placed both uniformly and STRADDLING every tp text
seam.

Usage (from /root/repo):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/genome_scale_verify.py --genome 1000000000 --k 63 --tp 8

The run prints one JSON line with the verified-window count and the
per-shard memory actually used. Wall time at 1 Gbp on this host is
dominated by first-touch page faults (see DEVIATIONS / memory notes).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    sys.stderr.write(f"[genome-scale] {msg}\n")
    sys.stderr.flush()


def gen_dspss_cuts(rng, genome_len: int, k: int, mean_unitig: int = 2000):
    """Like bench.gen_dspss but returns (genome, cuts) without
    materializing unitig byte strings (decode_seq of 10^9 bases would
    double peak memory); cuts[i] is unitig i's genome start, unitig i =
    genome[cuts[i] : cuts[i+1] + k - 1]."""
    from finito_tpu.sbwt import keys as kw

    t0 = time.perf_counter()
    while True:
        genome = rng.integers(0, 4, size=genome_len, dtype=np.uint8)
        if k >= 32:
            # birthday bound: P(dup) <= n^2 / (2 * 4^k); at k=63, n=1e9
            # that is ~6e-20 -- the O(n log n) sort check would only
            # measure this host's page-fault weather
            log(f"genome drawn in {time.perf_counter()-t0:.0f}s; "
                f"distinctness check skipped (P(dup) < n^2/4^k ~ 1e-19)")
            break
        log(f"genome drawn in {time.perf_counter()-t0:.0f}s; checking distinctness")
        wk = kw.sort_keys(kw.pack_windows(genome, k))
        dup = bool(np.any(kw.eq_adjacent(wk)))
        del wk
        if not dup:
            break
        log("duplicate k-mer (astronomically unlikely); redrawing")
    cuts = [0]
    while cuts[-1] < genome_len - k:
        cuts.append(
            min(
                genome_len - k + 1,
                cuts[-1] + int(rng.integers(mean_unitig // 2, mean_unitig * 2)),
            )
        )
    log(f"DSPSS ready in {time.perf_counter()-t0:.0f}s: {len(cuts)-1} unitigs")
    return genome, np.asarray(cuts, np.int64)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--genome", type=int, default=1_000_000_000)
    p.add_argument("--k", type=int, default=63)
    p.add_argument("--tp", type=int, default=8)
    p.add_argument("--slot-factor", type=int, default=4,
                   help="per-shard table load factor (4 keeps 8 shards of a "
                   "1 Gbp k=63 index ~2 GB of descriptors total)")
    p.add_argument("--reads", type=int, default=1024)
    p.add_argument("--read-len", type=int, default=191)
    p.add_argument("--mutate", type=float, default=0.3,
                   help="fraction of reads receiving one point mutation")
    args = p.parse_args()

    from finito_tpu.utils import relax_cpu_collective_timeouts

    relax_cpu_collective_timeouts()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from finito_tpu.utils import tune_host_allocator

    tune_host_allocator()
    if len(jax.devices()) < args.tp:
        raise RuntimeError(
            f"need {args.tp} devices "
            f"(XLA_FLAGS=--xla_force_host_platform_device_count={args.tp}), "
            f"found {len(jax.devices())}"
        )

    from finito_tpu.parallel.mesh import (
        ShardedMinimizerIndex,
        make_mesh,
        sharded_minimizer_locate_fn,
    )

    k, L = args.k, args.read_len
    rng = np.random.default_rng(63)
    genome, cuts = gen_dspss_cuts(rng, args.genome, k)

    # unitig concat layout: unitig i = genome[cuts[i] : cuts[i+1]+k-1]
    lens = np.diff(cuts) + (k - 1)
    ends = np.cumsum(lens)
    total_text = int(ends[-1])
    log(f"unitig text {total_text} bases ({total_text/(1<<31):.2f}x the old int32 cap)")
    concat = np.empty(total_text, np.uint8)
    w = 0
    for i in range(cuts.size - 1):
        seg = genome[cuts[i] : cuts[i + 1] + k - 1]
        concat[w : w + seg.size] = seg
        w += seg.size

    t0 = time.perf_counter()
    sh = ShardedMinimizerIndex.build(
        concat, ends, k, tp=args.tp, slot_factor=args.slot_factor
    )
    build_s = time.perf_counter() - t0
    per_shard_bytes = (
        sh.text_arr.nbytes + sh.occ_rows.nbytes + sh.desc.nbytes
    ) // args.tp
    log(
        f"shard-local build in {build_s:.0f}s: "
        f"{int(np.asarray(sh.n_occ).sum())} occurrences, h={sh.h}, "
        f"~{per_shard_bytes/1e9:.2f} GB/shard device arrays"
    )

    # reads: uniform + 2 per tp seam (straddling the shard boundary)
    starts = list(rng.integers(0, args.genome - L, size=args.reads - 2 * (args.tp - 1)))
    for s in range(1, args.tp):
        b0 = int(cuts[min(int(sh.uid_base[s]), cuts.size - 2)])
        starts.append(int(np.clip(b0 - L // 2, 0, args.genome - L)))
        starts.append(int(np.clip(b0 - k, 0, args.genome - L)))
    starts = np.asarray(starts, np.int64)
    reads = genome[starts[:, None] + np.arange(L)[None, :]].copy()
    n_mut = int(args.mutate * starts.size)
    mb = rng.choice(starts.size, size=n_mut, replace=False)
    mj = rng.integers(0, L, size=n_mut)
    reads[mb, mj] = (reads[mb, mj] + rng.integers(1, 4, size=n_mut)) % 4

    # analytic oracle: k-mer at genome pos g lives in unitig
    # i = searchsorted(cuts, g, 'right')-1 at offset g - cuts[i];
    # mutated windows (any window covering the mutated base) are absent
    W = L - k + 1
    g = starts[:, None] + np.arange(W)[None, :]
    uid_exp = np.searchsorted(cuts, g.reshape(-1), side="right").reshape(g.shape) - 1
    uid_exp = np.minimum(uid_exp, cuts.size - 2).astype(np.int64)
    off_exp = g - cuts[uid_exp]
    absent = np.zeros(g.shape, bool)
    absent[mb] = (mj[:, None] - np.arange(W)[None, :] >= 0) & (
        mj[:, None] - np.arange(W)[None, :] < k
    )
    uid_exp = np.where(absent, -1, uid_exp)
    off_exp = np.where(absent, -1, off_exp)

    mesh = make_mesh(args.tp, tp=args.tp)
    t0 = time.perf_counter()
    locate = sharded_minimizer_locate_fn(mesh, sh, K_slow=starts.size * W)
    uid, off, n_slow = locate(reads)
    uid, off = np.asarray(uid), np.asarray(off)
    log(f"sharded locate ({starts.size} reads x {W} windows) in "
        f"{time.perf_counter()-t0:.0f}s; n_slow={int(np.asarray(n_slow))}")

    ok = np.array_equal(uid, uid_exp) and np.array_equal(off, off_exp)
    if not ok:
        bad = np.argwhere((uid != uid_exp) | (off != off_exp))
        log(f"MISMATCH at {bad.shape[0]} windows; first: {bad[:5].tolist()}")
    found = int(np.sum(uid >= 0))
    shard_of = np.searchsorted(np.asarray(sh.uid_base), uid[uid >= 0], side="right")
    print(json.dumps({
        "metric": "genome_scale_sharded_verify",
        "ok": bool(ok),
        "genome": args.genome,
        "text_bases": total_text,
        "k": k,
        "tp": args.tp,
        "verified_windows": int(uid.size),
        "found_windows": found,
        "shards_answering": int(np.unique(shard_of).size),
        "per_shard_gb": round(per_shard_bytes / 1e9, 3),
        "build_s": round(build_s, 1),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
