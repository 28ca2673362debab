"""Wide rank tables (>= 2^24 positions): correctness of both forms and
engine equivalence when the wide form is forced at small scale."""

import numpy as np
import pytest

from finito_tpu.ops import rank24 as r24


def test_wide_table_rank_matches_cumsum():
    # a real > 2^24-bit vector: rank checked against the naive cumsum
    rng = np.random.default_rng(0)
    n = (1 << 24) + 12345
    bits = (rng.random(n) < 0.3).astype(np.uint8)
    tab = r24.build_rank24_tables(bits[None, :])
    assert tab.ndim == 2  # wide form selected
    cum = np.concatenate([[0], np.cumsum(bits, dtype=np.int64)])
    import jax.numpy as jnp

    idx = np.concatenate(
        [rng.integers(0, n + 1, size=64), [0, n, n - 1, 1 << 24, (1 << 24) - 1]]
    ).astype(np.int32)
    got = np.asarray(r24.rank24(jnp.asarray(tab), tab.shape[0], jnp.int32(0) * idx, jnp.asarray(idx)))
    assert np.array_equal(got, cum[idx])


def test_forms_agree_small():
    rng = np.random.default_rng(1)
    n = 5000
    bits = (rng.random((4, n)) < 0.4).astype(np.uint8)
    flat = r24.build_rank24_tables(bits)
    assert flat.ndim == 1
    # force the wide layout for the same bits
    saved = r24.RANK24_MAX_NODES
    try:
        r24.RANK24_MAX_NODES = 1
        wide = r24.build_rank24_tables(bits)
    finally:
        r24.RANK24_MAX_NODES = saved
    assert wide.ndim == 2
    import jax.numpy as jnp

    n8 = flat.shape[0] // 4
    idx = rng.integers(0, n + 1, size=256).astype(np.int32)
    cs = rng.integers(0, 4, size=256).astype(np.int32)
    a = np.asarray(r24.rank24(jnp.asarray(flat), n8, jnp.asarray(cs), jnp.asarray(idx)))
    b = np.asarray(r24.rank24(jnp.asarray(wide), n8, jnp.asarray(cs), jnp.asarray(idx)))
    cums = np.concatenate([np.zeros((4, 1), np.int64), np.cumsum(bits, axis=1)], axis=1)
    assert np.array_equal(a, cums[cs, idx])
    assert np.array_equal(a, b)


def test_stream_and_replica_engines_on_wide_tables():
    """Force the wide rank form at toy scale: the stream and replica
    engines must still equal the host oracle."""
    from finito_tpu.query.engine import DeviceQueryEngine
    from tests.test_device_engine import build_index, gen_dspss

    rng = np.random.default_rng(2)
    k = 6
    unitigs = gen_dspss(rng, 10, 10, 50, k)
    index = build_index(unitigs, k)
    saved = r24.RANK24_MAX_NODES
    try:
        r24.RANK24_MAX_NODES = 1
        eng_s = DeviceQueryEngine(index, mode="stream")
        eng_r = DeviceQueryEngine(index, mode="replica")
    finally:
        r24.RANK24_MAX_NODES = saved
    for _ in range(8):
        if rng.random() < 0.5:
            read = unitigs[int(rng.integers(len(unitigs)))].encode()
        else:
            read = "".join(rng.choice(list("ACGT"), int(rng.integers(k, 40)))).encode()
        want = index.search(read).local_offsets
        assert eng_s.search_fwd_rc(read)[0].local_offsets == want, ("stream", read)
        assert eng_r.search_fwd_rc(read)[0].local_offsets == want, ("replica", read)
