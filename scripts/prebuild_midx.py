"""Pre-build the minimizer-index caches for the cached bench rungs.

The driver bench's minimizer engine derives a MinimizerIndex from the
FinimizerIndex at engine init (engine.py: mindex_cache); at genome
scale that derivation dominated BENCH_r03's rung wall time (201 s at
16 Mbp). Build them once here so driver runs start warm. Host-only.

    FINITO_JAX_PLATFORM=cpu python scripts/prebuild_midx.py 16000000 100000000
"""

import os
import sys
import time

os.environ.setdefault("FINITO_JAX_PLATFORM", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main() -> int:
    sizes = [int(x) for x in sys.argv[1:]] or [16_000_000, 100_000_000]
    k = int(os.environ.get("PREBUILD_K", "31"))
    from finito_tpu.index.minimizer import MinimizerIndex

    for g in sizes:
        rng = np.random.default_rng(0)
        _, index, _, _ = bench.load_or_build_index(g, k, bench.DEFAULT_CACHE, rng)
        mcache = os.path.join(bench.DEFAULT_CACHE, f"midx_g{g}_k{k}.ftmidx")
        if os.path.exists(mcache):
            print(f"[prebuild-midx] {mcache} already present", flush=True)
            continue
        t0 = time.time()
        mindex = MinimizerIndex.from_finimizer_index(index)
        t1 = time.time()
        mindex.serialize(mcache)
        print(f"[prebuild-midx] genome {g}: derived in {t1-t0:.0f}s, "
              f"serialized in {time.time()-t1:.0f}s -> {mcache}", flush=True)
        del mindex, index
    return 0


if __name__ == "__main__":
    sys.exit(main())
