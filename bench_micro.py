"""Speed-of-light microbenchmarks for the primitives that bound every
engine (SURVEY.md section 7): batched HBM gather rates (scalar and row),
SBWT rank / interval extension, and the minimizer fast-path compound.

Prints one JSON line per metric. Timing forces completion of every rep
through an on-device checksum chain (block_until_ready can return early
on tunneled devices); fastest of 3 trials (time-shared machine).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/finito_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    results = []

    def timed(f, args_list, reps=10):
        csum = jax.jit(lambda x, s: s + jnp.sum(x.astype(jnp.int32)))
        _ = int(np.asarray(jnp.sum(f(*args_list[0]).astype(jnp.int32))))
        best = 1e9
        for _t in range(3):
            t0 = time.perf_counter()
            s = jnp.int32(0)
            for i in range(reps):
                s = csum(f(*args_list[i % len(args_list)]), s)
            int(np.asarray(s))
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    n = 1 << 22
    B = 1 << 21
    tab = jnp.asarray(rng.integers(0, 2**31, size=n, dtype=np.int32))
    tab4 = jnp.asarray(rng.integers(0, 2**31, size=(n, 4), dtype=np.int32))
    idxs = [jnp.asarray(rng.integers(0, n, size=B, dtype=np.int32)) for _ in range(5)]

    g1 = jax.jit(lambda t, i: jnp.take(t, i))
    dt = timed(lambda i: g1(tab, i), [(i,) for i in idxs])
    results.append(("hbm_gather_scalar", B / dt / 1e6, "Mlookups/sec"))

    g4 = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0), axis=1))
    dt = timed(lambda i: g4(tab4, i), [(i,) for i in idxs])
    results.append(("hbm_gather_row4", B / dt / 1e6, "Mlookups/sec"))

    # SBWT rank / extension on a synthetic 4M-node index
    from finito_tpu.ops.rank24 import build_rank24_tables, update_interval24

    bits = (rng.random((4, 1 << 22)) < 0.25).astype(np.uint8)
    rtab = jnp.asarray(build_rank24_tables(bits))
    n8 = rtab.shape[0] // 4
    C = jnp.asarray(np.cumsum([1, *bits.sum(axis=1)[:3]]), dtype=jnp.int32)
    nn = bits.shape[1]
    los = [jnp.asarray(rng.integers(0, nn - 1, size=B, dtype=np.int32)) for _ in range(5)]
    cs = jnp.asarray(rng.integers(0, 4, size=B, dtype=np.int32))

    upd = jax.jit(lambda lo: update_interval24(rtab, n8, C, cs, lo, lo)[0])
    dt = timed(lambda lo: upd(lo), [(lo,) for lo in los])
    results.append(("sbwt_interval_extension", B / dt / 1e6, "Mext/sec"))

    # chain-scan step latency: the floor under the stream/replica
    # engines' phase A. A lax.scan step doing the 3-gather interval
    # chain costs max(dispatch latency, gather throughput); measuring
    # us/step at several lane counts gives the latency floor and the
    # throughput knee -- the two numbers that pick the optimal
    # chunk_reads length (lanes scale ~1/chunk, steps ~chunk).
    from finito_tpu.ops.streaming import make_chain_scan
    from finito_tpu.sbwt import keys as kkw  # noqa: F401  (parity import)

    ck_tab = jnp.asarray(
        np.stack([np.zeros(nn, np.int32), np.full(nn, nn - 1, np.int32)], axis=1)
    )
    # synthetic dense edge table (every transition present): measures the
    # same gather pattern as a real mature chain
    edge_tab = jnp.asarray(
        rng.integers(0, nn, size=4 * nn, dtype=np.int32)
    )
    S = 64
    chain = make_chain_scan(n8, 31, nn)
    cf = jax.jit(lambda codes: chain(rtab, C, ck_tab, edge_tab, codes))
    for lanes_pow in (13, 15, 17):
        lanes = 1 << lanes_pow
        codes_l = [
            jnp.asarray(rng.integers(0, 4, size=(lanes, S), dtype=np.uint8))
            for _ in range(3)
        ]
        dt = timed(lambda c: cf(c), [(c,) for c in codes_l], reps=5)
        results.append(
            (f"chain_scan_us_per_step_{lanes>>10}k_lanes", dt / S * 1e6, "us/step")
        )

    for name, v, unit in results:
        print(json.dumps({"metric": name, "value": round(v, 1), "unit": unit}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
