"""Device-side LCS construction: k fori_loop rounds of vector ops.

Same dataflow as the host lcs_array (finito_tpu/sbwt/lcs.py) and the
reference's OpenMP k-round algorithm
(ref: /root/reference/include/lcs_basic_parallel_algorithm.hpp:52-120):
round r marks LCS[i] = r where the r-th-from-last label column first
differs from the row above, then propagates the column one de-Bruijn
step (a permutation scatter src -> dst derived from the out-edge bit
matrix + C array). On TPU each round is one fused elementwise pass plus
one scatter over the n-node axis; the node-sharded multi-chip form
lives in finito_tpu.parallel.mesh.sharded_lcs_fn.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def lcs_scatter_indices(sbwt):
    """(src, dst) int32 permutation arrays for label propagation, from a
    host PlainMatrixSBWT (flat across the four characters)."""
    bit_rows = sbwt.bit_rows()
    C = np.asarray(sbwt.get_C_array(), dtype=np.int64)
    src, dst = [], []
    for c in range(4):
        s = np.flatnonzero(bit_rows[c])
        src.append(s)
        dst.append(np.arange(int(C[c]), int(C[c]) + s.size))
    return (
        np.concatenate(src).astype(np.int32),
        np.concatenate(dst).astype(np.int32),
    )


def lcs_array_device(sbwt) -> np.ndarray:
    """LCS array computed on the default device; equals lcs_array."""
    k = sbwt.get_k()
    n = sbwt.number_of_subsets()
    C = np.asarray(sbwt.get_C_array(), dtype=np.int64)
    src, dst = lcs_scatter_indices(sbwt)

    cur0 = np.zeros(n, dtype=np.int32)
    for c in range(4):
        hi = int(C[c + 1]) if c < 3 else n
        cur0[int(C[c]) : hi] = c + 1

    src_d = jnp.asarray(src)
    dst_d = jnp.asarray(dst)

    @jax.jit
    def run(cur0):
        lcs0 = jnp.full(n, k, dtype=jnp.int32)

        def body(r, st):
            cur, lcs = st
            diff = jnp.concatenate(
                [jnp.ones(1, jnp.bool_), cur[1:] != cur[:-1]]
            )
            lcs = jnp.where((lcs == k) & diff, r, lcs)
            nxt = jnp.zeros_like(cur).at[dst_d].set(jnp.take(cur, src_d))
            return nxt, lcs

        _, lcs = lax.fori_loop(0, k, body, (jnp.asarray(cur0), lcs0))
        return lcs

    return np.asarray(run(cur0)).astype(np.int64)
