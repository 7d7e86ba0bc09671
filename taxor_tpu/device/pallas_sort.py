"""Pallas TPU kernel: row-wise bitonic sort of u32 (hi, lo) pairs.

The per-read dedup of extracted k-mers needs each read's emitted values
grouped so duplicates sit adjacent (the reference returns a hash SET,
src/hashing/syncmer.cpp:157-165).  XLA's ``lax.sort`` on TPU lowers to a
generic variadic sort that costs ~20 ms on the bench shape ([8192, 384]
2-key u32) — by far the largest phase of the fused search step.  This
kernel runs the classic bitonic network directly on the VPU: rows of one
read tile stay in VMEM/vregs for all log2(W)*(log2(W)+1)/2 stages, each
stage is two lane-rotates + a lexicographic compare-exchange over the
whole tile, so the data never round-trips HBM between stages.

Sort order: ascending lexicographic by (hi, lo).  The all-ones sentinel
used for non-emitted slots sorts to the tail, exactly like lax.sort.

Width must be a power of two (the wrapper pads with sentinels); reads
are tiled over the grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bitonic_body(h, l):
    """Run the full bitonic network on [RT, W] u32 pairs (W power of 2).

    Compare-exchange partners sit at lane XOR-distance d; lane i with bit
    d clear pairs rightward (i+d), bit set pairs leftward (i-d) — one
    roll per direction supplies both, and the circular wrap values are
    never selected (i^d stays inside [0, W) for the selecting lanes).
    """
    W = h.shape[1]
    n = W.bit_length() - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    for kk in range(1, n + 1):
        size = 1 << kk
        # ascending block <=> bit `size` of the lane index is clear; the
        # final merge (size == W) is a single ascending block
        asc = (lane & size) == 0 if size < W else (lane >= 0)
        for dd in range(kk - 1, -1, -1):
            d = 1 << dd
            bit = (lane & d) != 0
            # pltpu.roll requires non-negative shifts; W-d == -d circular
            ph = jnp.where(bit, pltpu.roll(h, d, axis=1),
                           pltpu.roll(h, W - d, axis=1))
            plo = jnp.where(bit, pltpu.roll(l, d, axis=1),
                            pltpu.roll(l, W - d, axis=1))
            s = (ph < h) | ((ph == h) & (plo < l))  # partner smaller
            keep_small = bit ^ asc
            take_partner = s == keep_small
            h = jnp.where(take_partner, ph, h)
            l = jnp.where(take_partner, plo, l)
    return h, l


def _sort_kernel(hi_ref, lo_ref, ohi_ref, olo_ref):
    h, l = _bitonic_body(hi_ref[:], lo_ref[:])
    ohi_ref[:] = h
    olo_ref[:] = l


def _dedup_kernel(hcap: int, hi_ref, lo_ref, emit_ref,
                  ohi_ref, olo_ref, ouq_ref, onu_ref, one_ref):
    """Whole per-read-tile dedup in VMEM: sentinel-mask non-emitted
    positions, full-width bitonic sort, adjacent-compare unique mask,
    per-read unique/emitted counts, slice to the hash capacity.  One
    HBM read of the extraction outputs, tiny writes — replaces the
    block-compact + lax.sort + reduction pipeline whose strided
    [R, nb, B] relayouts dominated the dedup phase."""
    sent = jnp.uint32(0xFFFFFFFF)
    e = emit_ref[:]
    h = jnp.where(e, hi_ref[:], sent)
    l = jnp.where(e, lo_ref[:], sent)
    n_emit = jnp.sum(e, axis=1, dtype=jnp.int32)
    h, l = _bitonic_body(h, l)
    W = h.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    prev_h = pltpu.roll(h, 1, axis=1)
    prev_l = pltpu.roll(l, 1, axis=1)
    is_sent = (h == sent) & (l == sent)
    uniq = ((h != prev_h) | (l != prev_l) | (lane == 0)) & ~is_sent
    onu_ref[:] = jnp.sum(uniq, axis=1, dtype=jnp.int32)[:, None]
    one_ref[:] = n_emit[:, None]
    ohi_ref[:] = h[:, :hcap]
    olo_ref[:] = l[:, :hcap]
    ouq_ref[:] = uniq[:, :hcap]


def _next_pow2(x: int) -> int:
    return 1 << (x - 1).bit_length()


@functools.partial(jax.jit, static_argnames=("hcap", "interpret"))
def dedup_fused(khi, klo, emit, hcap: int, interpret: bool = False):
    """Fused per-read dedup: (khi, klo, emit) [R, L] -> sorted unique
    prefix semantics of hash.device_syncmer.dedup_kmers, one kernel.

    Returns (khi [R, hcap], klo [R, hcap], valid bool [R, hcap],
    n_unique int32 [R], n_emit int32 [R]).  Sorting the FULL row width
    beats compact-then-sort on TPU: the block compaction's [R, nb, B]
    relayouts and strided selects cost more HBM traffic than the extra
    bitonic stages cost VPU time.
    """
    R, L = khi.shape
    W = max(128, _next_pow2(L))
    if W != L:
        pad = ((0, 0), (0, W - L))
        khi = jnp.pad(khi, pad)
        klo = jnp.pad(klo, pad)
        emit = jnp.pad(emit, pad, constant_values=False)
    RT = max(8, min(128, (1_250_000 // (W * 4)) // 8 * 8, R))
    rpad = (-R) % RT
    if rpad:
        zpad = ((0, rpad), (0, 0))
        khi = jnp.pad(khi, zpad)
        klo = jnp.pad(klo, zpad)
        emit = jnp.pad(emit, zpad, constant_values=False)
    Rp = R + rpad
    hc = min(hcap, W)
    row = lambda r: (r, 0)  # noqa: E731
    outs = pl.pallas_call(
        functools.partial(_dedup_kernel, hc),
        grid=(Rp // RT,),
        in_specs=[
            pl.BlockSpec((RT, W), row, memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_specs=[
            pl.BlockSpec((RT, hc), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, hc), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, hc), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 1), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rp, hc), jnp.uint32),
            jax.ShapeDtypeStruct((Rp, hc), jnp.uint32),
            jax.ShapeDtypeStruct((Rp, hc), jnp.bool_),
            jax.ShapeDtypeStruct((Rp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Rp, 1), jnp.int32),
        ],
        interpret=interpret,
    )(khi, klo, emit)
    ohi, olo, ouq, onu, one = outs
    ohi, olo, ouq = ohi[:R], olo[:R], ouq[:R]
    if hc < hcap:  # hash capacity exceeds the padded row width
        pad = ((0, 0), (0, hcap - hc))
        sent = jnp.uint32(0xFFFFFFFF)
        ohi = jnp.pad(ohi, pad, constant_values=sent)
        olo = jnp.pad(olo, pad, constant_values=sent)
        ouq = jnp.pad(ouq, pad, constant_values=False)
    return ohi, olo, ouq, onu[:R, 0], one[:R, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def sort_pairs(hi, lo, interpret: bool = False):
    """Ascending lexicographic row sort of u32 pairs, [R, W] -> [R, W].

    Drop-in for ``jax.lax.sort((hi, lo), dimension=1, num_keys=2)``.
    Pads W to a power of two (>= 128 lanes) with the all-ones sentinel
    and R to the read tile; both pads are sliced away on return.
    """
    R, W = hi.shape
    Wp = max(128, _next_pow2(W))
    if Wp != W:
        pad = ((0, 0), (0, Wp - W))
        sent = jnp.uint32(0xFFFFFFFF)
        hi = jnp.pad(hi, pad, constant_values=sent)
        lo = jnp.pad(lo, pad, constant_values=sent)
    # read tile bounded by VMEM: ~8 live [RT, Wp] u32 arrays (2 in, 2
    # out double-buffered, ~4 temps) must stay under the scoped budget
    RT = max(8, min(256, (1_250_000 // (Wp * 4)) // 8 * 8, R))
    rpad = (-R) % RT
    if rpad:
        hi = jnp.pad(hi, ((0, rpad), (0, 0)))
        lo = jnp.pad(lo, ((0, rpad), (0, 0)))
    Rp = R + rpad
    out = pl.pallas_call(
        _sort_kernel,
        grid=(Rp // RT,),
        in_specs=[
            pl.BlockSpec((RT, Wp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, Wp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RT, Wp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, Wp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rp, Wp), jnp.uint32),
            jax.ShapeDtypeStruct((Rp, Wp), jnp.uint32),
        ],
        interpret=interpret,
    )(hi, lo)
    return out[0][:R, :W], out[1][:R, :W]
