"""The fused Pallas minimizer front end (ops/pallas_min.py) must equal
the XLA forms bit-for-bit. Tests run the kernel in interpreter mode
(Mosaic needs a real TPU; the engine only enables the kernel there)."""

from __future__ import annotations

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


@pytest.mark.parametrize("k,m", [(31, 16), (21, 12), (63, 28)])
def test_pallas_front_matches_xla(k, m):
    import jax

    from finito_tpu.ops.pallas_min import minimizer_windows_pallas
    from finito_tpu.query.minimizer_engine import (
        minimizer_scan,
        pack_query_windows,
    )

    rng = np.random.default_rng(3)
    B, L = 64, 128
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    # non-ACGT pads must flow through bad exactly like the XLA form
    codes[rng.integers(0, B, 25), rng.integers(0, L, 25)] = 255
    c = jnp.asarray(codes).astype(jnp.uint32)
    bv, bo, bad = minimizer_scan(c, k, m)
    qw = pack_query_windows(c, k)
    pv, po, pbad, pqw = minimizer_windows_pallas(
        jnp.asarray(codes), k, m, block_b=32, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(bv), np.asarray(pv))
    np.testing.assert_array_equal(np.asarray(bo), np.asarray(po))
    np.testing.assert_array_equal(np.asarray(bad), np.asarray(pbad))
    assert len(qw) == len(pqw)
    for a, b in zip(qw, pqw):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
