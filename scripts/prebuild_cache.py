"""Pre-build the bench index caches (host-only; no TPU use).

The driver bench's ladder auto-includes cached rungs (bench.py --ladder
auto); genome-scale host builds on this microVM are fault-bound and
slow, so they are built once here in the background while the TPU is
used for measurements. Usage:

    FINITO_JAX_PLATFORM=cpu python scripts/prebuild_cache.py 16000000 100000000
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
    for g in sizes:
        rng = np.random.default_rng(0)
        t0 = time.time()
        _, index, build_s, _ = bench.load_or_build_index(g, k, bench.DEFAULT_CACHE, rng)
        print(f"[prebuild] genome {g} k={k}: ready in {time.time()-t0:.0f}s "
              f"(build_or_load {build_s:.0f}s, "
              f"{index.sbwt.number_of_subsets()} nodes)", flush=True)
        del index
    return 0


if __name__ == "__main__":
    sys.exit(main())
