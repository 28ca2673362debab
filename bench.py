"""Headline benchmark: k-mer localization throughput (queries/sec/chip).

Builds a synthetic DSPSS index (random genome decomposed into k-1
overlapping unitigs), then measures steady-state throughput of the dense
device engine on batched reads (98%-present k-mers, 2% mutations).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "kmer_queries/sec", "vs_baseline": N}

vs_baseline: the reference publishes no numbers (BASELINE.md); the
driver-set north star is 100M queries/sec on a v5e-16, i.e. 6.25M
queries/sec/chip. vs_baseline = value / 6.25e6 (fraction of per-chip
north star; >= 1.0 means the single-chip share of the target is met).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

NORTH_STAR_PER_CHIP = 100e6 / 16


def gen_dspss(rng, genome_len: int, k: int, mean_unitig: int = 2000):
    """Random genome cut into unitigs overlapping by k-1 (k-mer set preserved,
    each k-mer occurs exactly once)."""
    from finito_tpu.sbwt import keys as kw

    while True:
        genome = rng.integers(0, 4, size=genome_len, dtype=np.uint8)
        # verify k-mer distinctness (astronomically likely for k=31);
        # native rolling pack + radix sort, one pass each
        wk = kw.sort_keys(kw.pack_windows(genome, k))
        if np.any(kw.eq_adjacent(wk)):
            continue
        del wk
        break
    cuts = [0]
    while cuts[-1] < genome_len - k:
        cuts.append(min(genome_len - k + 1, cuts[-1] + int(rng.integers(mean_unitig // 2, mean_unitig * 2))))
    unitigs = []
    from finito_tpu.io.seqdb import decode_seq

    for a, b in zip(cuts[:-1], cuts[1:]):
        unitigs.append(decode_seq(genome[a : b + k - 1]))
    return genome, unitigs


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--genome", type=int, default=400_000, help="synthetic genome length")
    p.add_argument("--k", type=int, default=31)
    p.add_argument("--batch", type=int, default=8192, help="reads per device batch")
    p.add_argument("--read-len", type=int, default=128)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--trials", type=int, default=3, help="take the fastest trial (tunnel TPU is time-shared)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of one timed trial into DIR")
    p.add_argument("--mutate", type=float, default=0.005)
    p.add_argument("--engine", default="minimizer",
                   choices=["minimizer", "stream", "dense", "replica"])
    p.add_argument("--cache-dir", default=None,
                   help="cache the generated genome + built index per (genome,k) "
                   "here; genome-scale host builds on this microVM are "
                   "fault-bound and worth reusing")
    args = p.parse_args()

    # Persistent compilation cache: remote TPU compiles here cost ~30-60s
    # per program; cache them across bench runs.
    try:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", "/tmp/finito_jax_cache")
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from finito_tpu.utils import tune_host_allocator

    tune_host_allocator()

    rng = np.random.default_rng(0)
    t_start = time.perf_counter()

    from finito_tpu.index.builder import FinimizerIndexBuilder
    from finito_tpu.index.index import FinimizerIndex
    from finito_tpu.io.seqdb import SeqDB
    from finito_tpu.query.engine import DeviceQueryEngine
    from finito_tpu.sbwt.construct import build_plain_matrix_sbwt
    from finito_tpu.sbwt.lcs import lcs_array

    import os

    cache_prefix = genome_cache = None
    if args.cache_dir:
        os.makedirs(args.cache_dir, exist_ok=True)
        tag = f"g{args.genome}_k{args.k}"
        cache_prefix = os.path.join(args.cache_dir, f"idx_{tag}")
        genome_cache = os.path.join(args.cache_dir, f"genome_{tag}.npy")

    if cache_prefix and os.path.exists(cache_prefix + ".sbwt") and os.path.exists(genome_cache):
        genome = np.load(genome_cache)
        t0 = time.perf_counter()
        index = FinimizerIndex.load(cache_prefix)
        build_s = time.perf_counter() - t0
        sys.stderr.write(f"[bench] index loaded from cache in {build_s:.1f}s\n")
        sbwt = index.sbwt
        n_unitigs = int(np.asarray(index.unitigs.ends).size)
    else:
        genome, unitigs = gen_dspss(rng, args.genome, args.k)
        t0 = time.perf_counter()
        sbwt, node_keys = build_plain_matrix_sbwt(unitigs, args.k, return_keys=True)
        lcs = lcs_array(sbwt)
        index = FinimizerIndexBuilder(
            sbwt, lcs, SeqDB.from_sequences(unitigs), node_keys=node_keys
        ).get_index()
        build_s = time.perf_counter() - t0
        n_unitigs = len(unitigs)
        if cache_prefix:
            index.serialize(cache_prefix)
            np.save(genome_cache, genome)
    sys.stderr.write(
        f"[bench] index ready in {build_s:.1f}s: {sbwt.number_of_subsets()} nodes, "
        f"{sbwt.number_of_kmers()} kmers, {n_unitigs} unitigs\n"
    )

    t0 = time.perf_counter()
    engine = DeviceQueryEngine(index, mode=args.engine)
    sys.stderr.write(f"[bench] engine init (incl. position table) {time.perf_counter()-t0:.1f}s\n")

    # Query batch: reads sampled from the genome with point mutations.
    B, L = args.batch, args.read_len
    starts = rng.integers(0, args.genome - L, size=B)
    reads = genome[starts[:, None] + np.arange(L)[None, :]].copy()
    n_mut = int(args.mutate * reads.size)
    mi = rng.integers(0, B, size=n_mut)
    mj = rng.integers(0, L, size=n_mut)
    reads[mi, mj] = (reads[mi, mj] + rng.integers(1, 4, size=n_mut)) % 4

    # Device-resident steady-state measurement: the serving hot path keeps
    # query batches on device (transfers pipeline with compute in
    # production; this host's TPU tunnel would otherwise dominate).
    import jax
    import jax.numpy as jnp

    frac0 = 0.5 if args.engine == "stream" else 0.10
    pipe = engine.make_device_pipeline(B, L, unknown_frac=frac0)
    reads_dev = jax.device_put(jnp.asarray(reads))
    out = pipe(reads_dev)
    jax.block_until_ready(out)
    n_unknown = int(np.asarray(out[2]))
    # Right-size the repair/slow-path capacity to the workload (steady
    # state keeps one compiled program; its cost is proportional to K).
    if args.engine in ("stream", "minimizer", "replica") and not (pipe.K // 2 <= n_unknown <= pipe.K):
        frac = max(0.005, 1.3 * n_unknown / (B * (L - args.k + 1)))
        sys.stderr.write(f"[bench] resizing slow path: {n_unknown} -> frac {frac:.4f}\n")
        pipe = engine.make_device_pipeline(B, L, unknown_frac=frac)
        out = pipe(reads_dev)
        jax.block_until_ready(out)
        n_unknown = int(np.asarray(out[2]))
    if n_unknown > pipe.K:
        raise AssertionError("pipeline slow-path overflow after resize")
    if len(out) > 3 and getattr(pipe, "K_heads", None):
        n_heads = int(np.asarray(out[3]))
        if n_heads > pipe.K_heads:
            raise AssertionError(
                f"run-head capacity overflow: {n_heads} > {pipe.K_heads}"
            )
    uid = np.asarray(out[0])
    n_win = uid.shape[1]
    found_frac = float(np.mean(uid >= 0))
    # cross-check a few reads against the exact host oracle
    from finito_tpu.io.seqdb import decode_seq

    off_h = np.asarray(out[1])
    for b in range(0, B, max(1, B // 7)):
        res = index.search(decode_seq(reads[b])).local_offsets
        got = [(int(uid[b, w]), int(off_h[b, w])) for w in range(n_win)]
        assert got == res, f"mismatch vs oracle at read {b}"
    # Timing forces completion of EVERY rep through an on-device checksum
    # chain materialized to host at the end -- block_until_ready alone has
    # been observed to return early on tunneled devices.
    csum = jax.jit(
        lambda u, o, s: s + jnp.sum(u, dtype=jnp.int32) + jnp.sum(o, dtype=jnp.int32)
    )
    if args.profile:
        with jax.profiler.trace(args.profile):
            s = jnp.int32(0)
            for _ in range(args.reps):
                out = pipe(reads_dev)
                s = csum(out[0], out[1], s)
            int(np.asarray(s))
        sys.stderr.write(f"[bench] jax profiler trace written to {args.profile}\n")
    dt = float("inf")
    for _ in range(args.trials):
        t0 = time.perf_counter()
        s = jnp.int32(0)
        for _ in range(args.reps):
            out = pipe(reads_dev)
            s = csum(out[0], out[1], s)
        int(np.asarray(s))
        dt = min(dt, time.perf_counter() - t0)
    qps = args.reps * B * n_win / dt

    sys.stderr.write(
        f"[bench] {B} reads x {n_win} windows x {args.reps} reps in {dt:.3f}s; "
        f"found fraction {found_frac:.3f}; total wall {time.perf_counter()-t_start:.1f}s\n"
    )
    print(
        json.dumps(
            {
                "metric": "kmer_localization_throughput_1chip",
                "value": round(qps, 1),
                "unit": "kmer_queries/sec",
                "vs_baseline": round(qps / NORTH_STAR_PER_CHIP, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
