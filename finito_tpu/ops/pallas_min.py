"""Pallas TPU kernels for the gather-free phases, and the measured
record of why the gather-BOUND phases stay at the XLA level.

Why there is no Pallas chain-step kernel (measured, not assumed)
----------------------------------------------------------------
The streaming chain scan (ops.streaming.make_chain_opt, replacing the
per-base loop of ref common.hh:78-186) spends its time in per-step
table gathers: a v5e profile of the stream engine (jax.profiler trace,
2026-08-20, B=8192, L=128, k=31, 400k nodes) shows each scan step as 3
sequential ~58 us fusions -- exactly 8192 gathered elements / 58 us =
141 M gathers/s, the measured hardware gather floor (bench_micro).
The scan is therefore gather-THROUGHPUT-bound, not dispatch-bound; a
fused kernel only wins if it can gather from VMEM-resident tables
faster than the XLA gather unit.

Mosaic (jax 0.9, jax/_src/pallas/mosaic/lowering.py
_gather_lowering_rule) lowers lax.gather inside a TPU kernel ONLY for
2-D operands with operand.shape == indices.shape == output.shape, i.e.
take_along_axis within a tile (tpu.dynamic_gather along one dimension
of a same-shape register tile). Probed on hardware (2026-08-20):

  * take_along_axis(tab(4096,128),  idx(8,128),  axis=0) -> rejected
  * take_along_axis(tab(65536,128), idx(64,128), axis=0) -> rejected
  * jnp.take(tab(4096,128), idx1d(8), axis=0) row gather -> rejected
    ("Shape mismatch in input, indices and output")
  * take_along_axis(g(8,128), col(8,128), axis=1) lane shuffle -> WORKS

An arbitrary N-entry table lookup inside a kernel is therefore only
expressible as a same-shape gather over a TABLE-sized index tile --
O(N) VPU work per step instead of O(batch) -- or as per-element scalar
loads / DMAs (serial, ~us each). Both lose to the XLA gather unit by
orders of magnitude, so the chain scan, segment repair, and every
table-addressed phase stay at the XLA level where the gather unit runs
them at its floor. What remains for Pallas is the other side of the
profile: long chains of VPU ops over (B, W) grids that XLA splits into
several HBM-materialized fusions.

What IS here
------------
minimizer_windows_pallas: the minimizer engine's gather-free front end
(minimizer_scan + pack_query_windows, see query/minimizer_engine.py)
fused into ONE kernel: codes are read from HBM once per block, the
~m + (k-m+1) + k rolling/compare passes run on VMEM-resident tiles,
and only the (B, W) result grids return to HBM. Measured on the v5e
(B=8192, L=128, k=31, m=16): XLA form 22 us/batch, this kernel 24
us/batch -- PARITY, because XLA already fuses the whole phase to the
VPU floor. The kernel is therefore NOT wired into the engine; it stays
as the working, hardware-validated Pallas form of the one fusable
phase, regression-tested against the XLA twins
(tests/test_pallas_min.py, interpreter mode on CPU), and as evidence
that this framework's profile has no Pallas headroom: every hot phase
is either at the gather floor (XLA's gather unit) or at the VPU floor
(XLA's fuser).

Mosaic miscompile note: the direct LSB-first q_words form (16
independent `(c[:, i:i+W] & 3) << 2i` OR terms) compiles to wrong
results on hardware while interpret mode is exact (probed 2026-08-20;
plain slices alone are exact). The kernel uses the dependent MSB-first
pack + in-register 2-bit-field reversal instead, which compiles
correctly and is verified element-exact on the TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MIX32 = 0x9E3779B1  # must equal query.minimizer_engine.MIX32 (tested)


def _front_kernel(k: int, m: int, n_words: int, c_ref, bv_ref, bo_ref,
                  bad_ref, *qw_refs):
    """One (Bblk, L) tile: minimizer select + window packing, all VPU."""
    c = c_ref[...].astype(jnp.uint32)
    Bblk, L = c.shape
    W = L - k + 1
    nm = L - m + 1
    mv = jnp.zeros((Bblk, nm), jnp.uint32)
    bad_m = jnp.zeros((Bblk, nm), jnp.bool_)
    for i in range(m):
        ci = c[:, i : i + nm]
        mv = (mv << jnp.uint32(2)) | (ci & jnp.uint32(3))
        bad_m = bad_m | (ci > 3)
    hv = (mv * jnp.uint32(MIX32)) ^ (mv >> jnp.uint32(16))
    best_v = mv[:, :W]
    best_h = hv[:, :W]
    best_o = jnp.zeros((Bblk, W), jnp.int32)
    bad = bad_m[:, :W]
    for r in range(1, k - m + 1):
        cand_v = mv[:, r : r + W]
        cand_h = hv[:, r : r + W]
        upd = cand_h < best_h  # strict: leftmost lowest wins
        best_v = jnp.where(upd, cand_v, best_v)
        best_h = jnp.where(upd, cand_h, best_h)
        best_o = jnp.where(upd, r, best_o)
        bad = bad | bad_m[:, r : r + W]
    bv_ref[...] = best_v
    bo_ref[...] = best_o
    bad_ref[...] = bad.astype(jnp.int32)
    # q_words: LSB-first 2-bit pack of chars [16w, 16w+nc). The direct
    # independent (ci << 2i) OR-reduction MIScompiles under Mosaic
    # (probed 2026-08-20: plain slices are exact, the 16-term shift-OR
    # tree drops terms at some offsets), so build the MSB-first
    # sequential pack -- the identical dependent (acc << 2 | ci) chain
    # the minimizer loop above compiles correctly -- and reverse the
    # 2-bit fields in-register (4 mask/shift rounds).
    for w in range(n_words):
        nc = min(16 * (w + 1), k) - 16 * w
        qv = jnp.zeros((Bblk, W), jnp.uint32)
        for i in range(16 * w, 16 * w + nc):
            qv = (qv << jnp.uint32(2)) | (c[:, i : i + W] & jnp.uint32(3))
        x = (qv >> jnp.uint32(16)) | (qv << jnp.uint32(16))
        x = ((x & jnp.uint32(0xFF00FF00)) >> jnp.uint32(8)) | (
            (x & jnp.uint32(0x00FF00FF)) << jnp.uint32(8))
        x = ((x & jnp.uint32(0xF0F0F0F0)) >> jnp.uint32(4)) | (
            (x & jnp.uint32(0x0F0F0F0F)) << jnp.uint32(4))
        x = ((x & jnp.uint32(0xCCCCCCCC)) >> jnp.uint32(2)) | (
            (x & jnp.uint32(0x33333333)) << jnp.uint32(2))
        qw_refs[w][...] = x >> jnp.uint32(2 * (16 - nc))


def minimizer_windows_pallas(codes, k: int, m: int, *, block_b: int = 1024,
                             interpret: bool = False):
    """(B, L) int codes -> (best_v, best_o, bad, [q_words...]), each
    (B, W): the fused twin of minimizer_scan + pack_query_windows
    (bad as bool like the XLA form). B must divide by block_b or be
    smaller; W = L - k + 1. Grid over row blocks; each block reads its
    codes tile once and runs every pass in VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L = codes.shape
    W = L - k + 1
    n_words = (2 * k + 31) // 32
    bb = min(block_b, B)
    if B % bb:
        raise ValueError(f"B={B} not divisible by block {bb}")
    grid = (B // bb,)
    kern = functools.partial(_front_kernel, k, m, n_words)
    out_shapes = (
        [jax.ShapeDtypeStruct((B, W), jnp.uint32),
         jax.ShapeDtypeStruct((B, W), jnp.int32),
         jax.ShapeDtypeStruct((B, W), jnp.int32)]
        + [jax.ShapeDtypeStruct((B, W), jnp.uint32)] * n_words
    )
    spec_in = pl.BlockSpec((bb, L), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((bb, W), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=out_shapes,
        in_specs=[spec_in],
        out_specs=[spec_out] * len(out_shapes),
        interpret=interpret,
    )(codes.astype(jnp.int32))
    best_v, best_o, bad = outs[0], outs[1], outs[2] != 0
    return best_v, best_o, bad, list(outs[3:])
