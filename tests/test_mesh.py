"""(dp, tp) sharded locate paths vs single-chip engines on the virtual
8-device CPU mesh (tests/conftest.py)."""

import numpy as np
import pytest

import jax

from finito_tpu.index.minimizer import MinimizerIndex
from finito_tpu.parallel.mesh import (
    ShardedIndex,
    ShardedMinimizerIndex,
    make_mesh,
    sharded_locate_fn,
    sharded_minimizer_locate_fn,
)
from finito_tpu.query.engine import DeviceQueryEngine

from tests.test_device_engine import build_index, gen_dspss

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device mesh"
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(123)
    k = 6
    unitigs = gen_dspss(rng, 10, 10, 50, k)
    index = build_index(unitigs, k)
    engine = DeviceQueryEngine(index, mode="dense")
    B, L = 16, 40
    reads = np.full((B, L), 255, dtype=np.uint8)
    from finito_tpu.io.seqdb import encode_seq

    for b in range(B):
        if b % 3 == 0:
            u = unitigs[int(rng.integers(len(unitigs)))]
            codes = encode_seq(u.encode())[:L]
        else:
            codes = rng.integers(0, 4, size=int(rng.integers(k, L))).astype(np.uint8)
        reads[b, : codes.size] = codes
    uid1, off1 = engine.locate_batch(reads)
    return index, engine, reads, uid1, off1


@pytest.mark.parametrize("tp", [1, 2, 4])
def test_sharded_sbwt_locate(setup, tp):
    index, engine, reads, uid1, off1 = setup
    mesh = make_mesh(8, tp=tp)
    sh = ShardedIndex.from_index(index, np.asarray(engine.pos_table), tp=tp)
    locate = sharded_locate_fn(mesh, sh)
    uid, off = locate(reads)
    W = uid1.shape[1]
    np.testing.assert_array_equal(np.asarray(uid)[:, :W], uid1)
    np.testing.assert_array_equal(np.asarray(off)[:, :W], off1)


@pytest.mark.parametrize("tp", [1, 2, 4])
def test_sharded_minimizer_locate(setup, tp):
    index, engine, reads, uid1, off1 = setup
    mesh = make_mesh(8, tp=tp)
    mindex = MinimizerIndex.from_finimizer_index(index)
    shm = ShardedMinimizerIndex.from_minimizer_index(mindex, tp=tp)
    locate = sharded_minimizer_locate_fn(mesh, shm, K_slow=512)
    uid, off, n_slow = locate(reads)
    assert int(np.asarray(n_slow)) <= 512
    W = uid1.shape[1]
    np.testing.assert_array_equal(np.asarray(uid)[:, :W], uid1)
    np.testing.assert_array_equal(np.asarray(off)[:, :W], off1)
