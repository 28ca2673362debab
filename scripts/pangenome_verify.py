"""Pangenome-scale pipeline verification (BASELINE configs[4] in
structure: many related genomes -> one sharded index).

End-to-end NATIVE pipeline, no external tools:

  1. draw a base genome + N variant genomes (SNP rate --mutate), the
     shape of a real pangenome (most k-mers shared, variants add
     bubbles);
  2. `finito_tpu.dbg.build_unitigs`: canonical unitigs of the distinct
     canonical k-mer set (the step the reference delegates to ggcat);
  3. host finimizer index build over those unitigs;
  4. `ShardedMinimizerIndex.build`: shard-local (dp, tp) device index,
     text + tables sharded over tp (the layout that exceeds single-chip
     HBM at real pangenome scale);
  5. sharded locate on the virtual CPU mesh for reads drawn from ALL
     variants (bubble-crossing, seam-straddling), verified byte-exact
     against the host oracle (FinimizerIndex.search).

Multi-host: the same sharded pipeline splits across processes via
finito_tpu.parallel.distributed (2-process jax.distributed test in CI);
this script exercises the mesh/sharding layer on one process.

Usage (from /root/repo):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/pangenome_verify.py --base 2000000 --variants 20 --k 63 --tp 8

Prints one JSON line: pangenome compression (input bases vs distinct
canonical k-mers), per-shard memory, verified-window count, ok flag.
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
    sys.stderr.write(f"[pangenome] {msg}\n")
    sys.stderr.flush()


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--base", type=int, default=2_000_000, help="base genome length")
    p.add_argument("--variants", type=int, default=20, help="number of variant genomes")
    p.add_argument("--k", type=int, default=63)
    p.add_argument("--tp", type=int, default=8)
    p.add_argument("--snp", type=float, default=0.002, help="per-base SNP rate per variant")
    p.add_argument("--reads", type=int, default=512)
    p.add_argument("--read-len", type=int, default=191)
    p.add_argument("--slot-factor", type=int, default=4)
    p.add_argument("--mesh-build", action="store_true",
                   help="also build the unitigs themselves on the mesh "
                   "(parallel.shard_dbg) instead of the host builder")
    p.add_argument("--spss", choices=["unitigs", "simplitigs"],
                   default="unitigs",
                   help="simplitigs: greedy maximal walks (fewer strings, "
                   "~18%% smaller index at this shape; see README)")
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
            f"(XLA_FLAGS=--xla_force_host_platform_device_count={args.tp})"
        )

    from finito_tpu.dbg import build_unitigs
    from finito_tpu.index.builder import FinimizerIndexBuilder
    from finito_tpu.io.seqdb import SeqDB, decode_seq
    from finito_tpu.parallel.mesh import (
        ShardedMinimizerIndex,
        make_mesh,
        sharded_minimizer_locate_fn,
    )
    from finito_tpu.sbwt.construct import build_plain_matrix_sbwt
    from finito_tpu.sbwt.lcs import lcs_array

    k, L = args.k, args.read_len
    rng = np.random.default_rng(1000)

    # ---- 1. pangenome: base + SNP variants ------------------------------
    t0 = time.perf_counter()
    base = rng.integers(0, 4, size=args.base, dtype=np.uint8)
    genomes = [base]
    for _ in range(args.variants):
        v = base.copy()
        n_mut = int(args.snp * args.base)
        pos = rng.choice(args.base, size=n_mut, replace=False)
        v[pos] = (v[pos] + rng.integers(1, 4, size=n_mut)) % 4
        genomes.append(v)
    total_input = sum(g.size for g in genomes)
    log(f"{len(genomes)} genomes, {total_input} input bases "
        f"in {time.perf_counter()-t0:.0f}s")

    # ---- 2. canonical unitigs (native ggcat equivalent) -----------------
    t0 = time.perf_counter()
    if args.spss == "simplitigs":
        from finito_tpu.dbg import build_simplitigs

        unitigs = build_simplitigs(genomes, k)
    elif args.mesh_build:
        from finito_tpu.parallel.shard_dbg import sharded_unitig_build

        unitigs = sharded_unitig_build(genomes, k, n_devices=args.tp)
    else:
        unitigs = build_unitigs(genomes, k, canonical=True)
    n_kmers = sum(u.size - k + 1 for u in unitigs)
    uni_s = time.perf_counter() - t0
    log(f"{len(unitigs)} unitigs, {n_kmers} distinct canonical k-mers "
        f"({total_input / max(n_kmers,1):.1f}x pangenome redundancy) in {uni_s:.0f}s")

    # ---- 3. host finimizer index ----------------------------------------
    t0 = time.perf_counter()
    useqs = [decode_seq(u) for u in unitigs]
    sbwt, node_keys = build_plain_matrix_sbwt(useqs, k, return_keys=True)
    index = FinimizerIndexBuilder(
        sbwt, lcs_array(sbwt), SeqDB.from_sequences(useqs), node_keys=node_keys
    ).get_index()
    build_s = time.perf_counter() - t0
    log(f"finimizer index in {build_s:.0f}s: {sbwt.number_of_subsets()} nodes")

    # ---- 4. shard-local (tp) device index -------------------------------
    t0 = time.perf_counter()
    concat = np.asarray(index.unitigs.concat)
    ends = np.asarray(index.unitigs.ends, dtype=np.int64)
    sh = ShardedMinimizerIndex.build(
        concat, ends, k, tp=args.tp, slot_factor=args.slot_factor
    )
    shard_s = time.perf_counter() - t0
    per_shard_bytes = (
        sh.text_arr.nbytes + sh.occ_rows.nbytes + sh.desc.nbytes
    ) // args.tp
    log(f"shard-local build in {shard_s:.0f}s; "
        f"~{per_shard_bytes/1e6:.1f} MB/shard device arrays")

    # ---- 5. sharded locate vs host oracle -------------------------------
    # reads from every variant (bubble-crossing); plus seam straddlers
    starts = rng.integers(0, args.base - L, size=args.reads)
    gsel = rng.integers(0, len(genomes), size=args.reads)
    reads = np.stack([genomes[gi][s : s + L] for gi, s in zip(gsel, starts)])
    uid_base = np.asarray(sh.uid_base)
    for s in range(1, min(args.tp, len(ends))):
        b_uid = min(int(uid_base[s]), ends.size - 1)
        ustart = int(ends[b_uid - 1]) if b_uid > 0 else 0
        a = max(0, ustart - L // 2)
        if a + L <= concat.size:
            reads[s % args.reads] = concat[a : a + L]

    mesh = make_mesh(args.tp, tp=args.tp)
    W = L - k + 1
    t0 = time.perf_counter()
    locate = sharded_minimizer_locate_fn(mesh, sh, K_slow=args.reads * W)
    uid, off, n_slow = locate(reads)
    uid, off = np.asarray(uid), np.asarray(off)
    loc_s = time.perf_counter() - t0
    log(f"sharded locate ({args.reads} reads x {W} windows) in {loc_s:.0f}s; "
        f"n_slow={int(np.asarray(n_slow))}")

    t0 = time.perf_counter()
    n_bad = 0
    for b in range(args.reads):
        exp = index.search(decode_seq(reads[b])).local_offsets
        got = [(int(uid[b, w]), int(off[b, w])) for w in range(W)]
        if got != exp:
            n_bad += 1
            if n_bad <= 3:
                log(f"MISMATCH read {b}")
    log(f"host-oracle verification in {time.perf_counter()-t0:.0f}s")

    ok = n_bad == 0
    found = int(np.sum(uid >= 0))
    print(json.dumps({
        "metric": "pangenome_sharded_verify",
        "ok": bool(ok),
        "genomes": len(genomes),
        "input_bases": int(total_input),
        "distinct_canonical_kmers": int(n_kmers),
        "unitigs": len(unitigs),
        "k": k,
        "tp": args.tp,
        "verified_windows": int(uid.size),
        "found_windows": found,
        "per_shard_mb": round(per_shard_bytes / 1e6, 1),
        "unitig_s": round(uni_s, 1),
        "index_s": round(build_s, 1),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
