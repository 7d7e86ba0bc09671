"""Pallas TPU kernel for the IXF probe/count hot loop.

Replaces the XLA gather formulation (probe.count_xla) on TPU: per read and
bin tile, the fingerprint block sits in VMEM and a fori loop XORs the 3
probe rows of each hash against its fingerprint, accumulating per-bin hit
counts.  The interleaved layout (bins contiguous per slot) makes each
probe one contiguous VMEM row read — this is why the filter stores
fingerprints bin-major per slot (SURVEY.md §2.2).

Mosaic requires 32-bit rows for unaligned dynamic sublane reads, so the
uint8 fingerprint matrix is bit-packed 4 bins per int32 word (byte j of
word w = bin 4w+j, little-endian): same VMEM footprint, 32-bit loads.
Hits are extracted per byte with mask-compare; counts come back
[R, 4, B/4] and are de-interleaved on the host.

Masking is folded into the inputs: invalid hash slots get positions ->
sentinel row (all zeros, index `slots`) and fingerprint 1 -> never hits.

Grid = (bin_tiles, reads); reads iterate minor so a fingerprint block is
fetched once per bin tile and reused across the whole read batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budgets for the packed fingerprint block (bytes).  Mosaic's scoped
# VMEM limit is 16 MiB; a block whose index map varies across the grid is
# DOUBLE-buffered, so multi-tile blocks get half the single-tile budget.
_FP_VMEM_SINGLE = 14 * 1024 * 1024
_FP_VMEM_TILE = 7 * 1024 * 1024
_FP_VMEM_BUDGET = _FP_VMEM_TILE  # compat alias (external callers)
_LANE = 128

_B0 = 0x000000FF
_B1 = 0x0000FF00
_B2 = 0x00FF0000
_B3 = -16777216  # 0xFF000000 as int32


# reads processed per grid cell: amortizes grid-step overhead
_READ_TILE = 16
# inner unroll over hashes: independent dependency chains hide VMEM load
# latency
_HASH_UNROLL = 8


_LOW7 = 0x7F7F7F7F
# 0x80808080 as int32
_SIGN = -2139062144
# flush the packed byte counters before any lane can reach 256 hits:
# the U hashes of one body accumulate on SEPARATE sublanes of the
# [U, BT4] packed tile, so each byte gains at most 1 per body
_FLUSH_BODIES = 255


def _kernel(pos_ref, fpr_ref, cnt_ref, fp_ref, out_ref):
    """One (bin_tile, read_tile) grid cell.

    pos_ref: int32 [RT, 1, H*3]  (SMEM) probe rows per read/hash, flat
                                 (SMEM pads the last dim to 128 lanes, so
                                 a trailing dim of 3 would waste 43x)
    fpr_ref: int32 [RT, 1, H]    (SMEM) fingerprint replicated to 4 bytes
    cnt_ref: int32 [RT, 1, 1]    (SMEM) per-read body count ceil(valid/U)
    fp_ref:  int32 [S+1, BT4]    (VMEM) packed fingerprint block
    out_ref: int32 [RT, 4, BT4]  (VMEM) per-byte-lane counts per read

    Inner loop: the U hashes of one body each do 3 dynamic row loads +
    3 XORs at [BT4] width, then stack into a [U, BT4] tile (U = 8
    sublanes x 128 lanes = exactly one 32-bit vreg when BT4 = 128) so
    the 5-op exact SWAR per-byte zero test + accumulate run at FULL VPU
    occupancy instead of 1/8th.  The SWAR test ((x & 0x7F7F..) +
    0x7F7F.. | x) has no cross-byte carries (each masked byte <= 0x7F,
    sum <= 0xFE), so — unlike the classic (x-1)&~x trick — it is per-byte
    EXACT, which host/device output parity requires.  Hits accumulate as
    packed bytes per sublane (each byte gains <= 1 per body) and flush
    to int32 accumulators via a cross-sublane sum every 255 bodies.
    Per-read dynamic trip counts skip the padded hash tail entirely.
    """
    RT = pos_ref.shape[0]
    BT4 = out_ref.shape[2]
    U = _HASH_UNROLL

    def read_body(r, _):
        nb = cnt_ref[r, 0, 0]

        def hash_body(hu, packed):
            rows = []
            for u in range(U):
                h = hu * U + u
                p0 = pos_ref[r, 0, 3 * h]
                p1 = pos_ref[r, 0, 3 * h + 1]
                p2 = pos_ref[r, 0, 3 * h + 2]
                f4 = fpr_ref[r, 0, h]
                rows.append(
                    (fp_ref[p0, :] ^ fp_ref[p1, :] ^ fp_ref[p2, :] ^ f4)[
                        None, :
                    ]
                )
            x = jnp.concatenate(rows, axis=0)  # [U, BT4]
            nz = ((x & _LOW7) + _LOW7) | x  # byte sign bit: byte != 0
            hits = jax.lax.shift_right_logical(
                (~nz) & _SIGN, 7
            )  # 0x01 per zero byte
            return packed + hits

        def chunk_body(ci, accs):
            a0, a1, a2, a3 = accs
            lo = ci * _FLUSH_BODIES
            hi = jnp.minimum(nb, lo + _FLUSH_BODIES)
            packed = jax.lax.fori_loop(
                lo, hi, hash_body, jnp.zeros((U, BT4), jnp.int32)
            )
            a0 = a0 + jnp.sum(packed & _B0, axis=0)
            a1 = a1 + jnp.sum(
                jax.lax.shift_right_logical(packed, 8) & _B0, axis=0)
            a2 = a2 + jnp.sum(
                jax.lax.shift_right_logical(packed, 16) & _B0, axis=0)
            a3 = a3 + jnp.sum(
                jax.lax.shift_right_logical(packed, 24), axis=0)
            return (a0, a1, a2, a3)

        zero = jnp.zeros((BT4,), jnp.int32)
        nc = (nb + _FLUSH_BODIES - 1) // _FLUSH_BODIES
        a0, a1, a2, a3 = jax.lax.fori_loop(
            0, nc, chunk_body, (zero, zero, zero, zero)
        )
        out_ref[r, 0, :] = a0
        out_ref[r, 1, :] = a1
        out_ref[r, 2, :] = a2
        out_ref[r, 3, :] = a3
        return 0

    jax.lax.fori_loop(0, RT, read_body, 0)


# ---------------------------------------------------------------------- #
# packed-position kernels: 2 SMEM words per hash instead of 4
# ---------------------------------------------------------------------- #
# The probe is bound by the SCALAR core: per hash it issues ~4 SMEM
# reads (3 positions + fingerprint), address arithmetic and 3 vector-
# load issues (~15.6 cycles/hash measured).  When every slot index fits
# 16 bits (S+1 <= 65536 — true for all narrow and most production
# geometries), the 4 scalars pack into TWO SMEM words
# [p0|p1<<16, p2|fbyte<<16]; the unpack is 5 scalar ALU ops, cheaper
# than the 2 saved SMEM reads.  Measured: 23.4 -> 18.0 ms on the bench
# shape (12.7 ns/hash, 1.30x).  Wide tables gain the same way.

USE_P16 = True
_P16_MAX_S1 = 65536


def _pack_pos16(pos, f4i):
    """[R, H, 3] int32 positions + replicated-byte fingerprints ->
    [R, H, 2] packed words (p0|p1<<16, p2|fbyte<<16)."""
    p = pos.astype(jnp.int32)
    w0 = p[..., 0] | (p[..., 1] << 16)
    w1 = p[..., 2] | ((f4i & 0xFF) << 16)
    return jnp.stack([w0, w1], axis=-1)


def _fetch_p16(pos_ref, r, h):
    w0 = pos_ref[r, 0, 2 * h]
    w1 = pos_ref[r, 0, 2 * h + 1]
    p0 = w0 & 0xFFFF
    p1 = jax.lax.shift_right_logical(w0, 16)
    p2 = w1 & 0xFFFF
    f4 = jax.lax.shift_right_logical(w1, 16) * 0x01010101
    return p0, p1, p2, f4


def _kernel_p16(pos_ref, cnt_ref, fp_ref, out_ref):
    """_kernel with 2-word packed positions (see module comment)."""
    RT = pos_ref.shape[0]
    BT4 = out_ref.shape[2]
    U = _HASH_UNROLL

    def read_body(r, _):
        nb = cnt_ref[r, 0, 0]

        def hash_body(hu, packed):
            rows = []
            for u in range(U):
                p0, p1, p2, f4 = _fetch_p16(pos_ref, r, hu * U + u)
                rows.append(
                    (fp_ref[p0, :] ^ fp_ref[p1, :] ^ fp_ref[p2, :] ^ f4)[
                        None, :
                    ]
                )
            x = jnp.concatenate(rows, axis=0)
            nz = ((x & _LOW7) + _LOW7) | x
            hits = jax.lax.shift_right_logical((~nz) & _SIGN, 7)
            return packed + hits

        def chunk_body(ci, accs):
            a0, a1, a2, a3 = accs
            lo = ci * _FLUSH_BODIES
            hi = jnp.minimum(nb, lo + _FLUSH_BODIES)
            packed = jax.lax.fori_loop(
                lo, hi, hash_body, jnp.zeros((U, BT4), jnp.int32)
            )
            a0 = a0 + jnp.sum(packed & _B0, axis=0)
            a1 = a1 + jnp.sum(
                jax.lax.shift_right_logical(packed, 8) & _B0, axis=0)
            a2 = a2 + jnp.sum(
                jax.lax.shift_right_logical(packed, 16) & _B0, axis=0)
            a3 = a3 + jnp.sum(
                jax.lax.shift_right_logical(packed, 24), axis=0)
            return (a0, a1, a2, a3)

        zero = jnp.zeros((BT4,), jnp.int32)
        nc = (nb + _FLUSH_BODIES - 1) // _FLUSH_BODIES
        a0, a1, a2, a3 = jax.lax.fori_loop(
            0, nc, chunk_body, (zero, zero, zero, zero)
        )
        out_ref[r, 0, :] = a0
        out_ref[r, 1, :] = a1
        out_ref[r, 2, :] = a2
        out_ref[r, 3, :] = a3
        return 0

    jax.lax.fori_loop(0, RT, read_body, 0)


@functools.partial(jax.jit, static_argnames=("bin_tile4", "interpret"))
def _probe_call_p16(fp_packed, posp, bodies, bin_tile4, interpret):
    """_probe_call with packed positions: posp int32 [R, 1, H*2]."""
    R, _, H2 = posp.shape
    S1, B4 = fp_packed.shape
    RT = _READ_TILE
    grid = (B4 // bin_tile4, R // RT)
    out = pl.pallas_call(
        _kernel_p16,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RT, 1, H2), lambda j, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RT, 1, 1), lambda j, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((S1, bin_tile4), lambda j, r: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RT, 4, bin_tile4), lambda j, r: (r, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 4, B4), jnp.int32),
        interpret=interpret,
    )(posp, bodies, fp_packed)
    return jnp.moveaxis(out, 1, 2).reshape(R, 4 * B4)


def _kernel_wide_p16(pos_ref, cnt_ref, fp_ref, out_ref):
    """_kernel_wide with 2-word packed positions."""
    BTW = fp_ref.shape[2]
    U = _WIDE_UNROLL

    def read_body(r, _):
        nb = cnt_ref[r, 0, 0]

        def hash_body(hu, packed):
            acc = packed
            for u in range(U):
                p0, p1, p2, f4 = _fetch_p16(pos_ref, r, hu * U + u)
                x = fp_ref[p0] ^ fp_ref[p1] ^ fp_ref[p2] ^ f4  # [8, BTW]
                nz = ((x & _LOW7) + _LOW7) | x
                hits = jax.lax.shift_right_logical((~nz) & _SIGN, 7)
                acc = acc + hits
            return acc

        def chunk_body(ci, accs):
            a0, a1, a2, a3 = accs
            lo = ci * _FLUSH_BODIES
            hi = jnp.minimum(nb, lo + _FLUSH_BODIES)
            packed = jax.lax.fori_loop(
                lo, hi, hash_body, jnp.zeros((8, BTW), jnp.int32)
            )
            a0 = a0 + (packed & _B0)
            a1 = a1 + (jax.lax.shift_right_logical(packed, 8) & _B0)
            a2 = a2 + (jax.lax.shift_right_logical(packed, 16) & _B0)
            a3 = a3 + jax.lax.shift_right_logical(packed, 24)
            return (a0, a1, a2, a3)

        zero = jnp.zeros((8, BTW), jnp.int32)
        nc = (nb + _FLUSH_BODIES - 1) // _FLUSH_BODIES
        a0, a1, a2, a3 = jax.lax.fori_loop(
            0, nc, chunk_body, (zero, zero, zero, zero)
        )
        out_ref[r, 0] = a0
        out_ref[r, 1] = a1
        out_ref[r, 2] = a2
        out_ref[r, 3] = a3
        return 0

    jax.lax.fori_loop(0, pos_ref.shape[0], read_body, 0)


@functools.partial(jax.jit, static_argnames=("bin_tile4", "interpret"))
def _probe_call_wide_p16(fp_packed, posp, bodies, bin_tile4, interpret):
    """_probe_call_wide with packed positions (posp [R, 1, H*2])."""
    R, _, H2 = posp.shape
    S1, B4 = fp_packed.shape
    RT = _READ_TILE
    BTW = bin_tile4 // 8
    fp3 = fp_packed.reshape(S1, 8, B4 // 8)
    grid = (B4 // bin_tile4, R // RT)
    out = pl.pallas_call(
        _kernel_wide_p16,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RT, 1, H2), lambda j, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RT, 1, 1), lambda j, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((S1, 8, BTW), lambda j, r: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RT, 4, 8, BTW),
                               lambda j, r: (r, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 4, 8, B4 // 8), jnp.int32),
        interpret=interpret,
    )(posp, bodies, fp3)
    return jnp.moveaxis(out, 1, 3).reshape(R, 4 * B4)


# ---------------------------------------------------------------------- #
# p10x2 kernel: block-relative 10-bit offsets, two reads interleaved
# ---------------------------------------------------------------------- #
# Round-4 measurements (bench_probe_r4.py, real v5e, production shape):
# the p16 kernel's 12.9 ns/hash floor is NOT pure issue cost — it holds
# load-to-use stalls that two structural changes remove TOGETHER:
#
#   1. p10: all three probe positions are BLOCK-relative (p_i lives in
#      block i of length bl, xorfilter.hpp:67-68), so for bl <= 1023
#      they pack 10+10+10 bits into ONE SMEM word; fingerprint bytes of
#      4 consecutive hashes share a second word (1.25 SMEM reads/hash
#      vs p16's 2).  Alone: 12.9 -> 12.2 (ALU eats the saved reads).
#   2. x2: each loop body processes 4 hashes of TWO reads on separate
#      sublane halves of one [8, 128] vreg — two fully independent
#      metadata chains fill each other's stalls.  Alone (with p16
#      words): 12.9 -> 12.3.
#
# Together: 12.9 -> 7.2 ns/hash (1.8x) — the independent chains can
# only be scheduled into the stall slots once the SMEM pressure drops.
#
# Sentinel without a reserved row index: the table repacks as 3 blocks
# of _P10_BLPAD=1024 rows (real rows 0..bl-1, zero padding above), so
# offset 1023 points at a guaranteed-zero row in every block; invalid
# hashes get offsets (1023,1023,1023) + the poison fingerprint byte 1
# and can sit ANYWHERE in the hash list at zero per-hash masking cost.

USE_P10X2 = True
_P10_BLPAD = 1024
_P10_MAX_BL = 1023
_P10_HB = 4   # hashes per read per body
_P10_NR = 2   # reads interleaved per body


def p10_eligible(block_length: int) -> bool:
    """bl <= 1023 covers bins up to ~2500 elements (speed.capacity:
    3*bl ~= 1.23n); larger bins fall back to the p16 kernels."""
    return 0 < block_length <= _P10_MAX_BL


def prepare_fingerprints_p10(fingerprints: np.ndarray,
                             block_length: int,
                             lane: int = 4 * _LANE) -> np.ndarray:
    """uint8 [3*bl, B] -> packed int32 [3*_P10_BLPAD, Bpad/4] with each
    probe block padded to _P10_BLPAD rows (padding rows zero — the
    offset-1023 sentinel zone).  Same 4-bins-per-word byte packing as
    prepare_fingerprints."""
    from .probe import pad_fingerprints

    bl = block_length
    assert p10_eligible(bl)
    fp = pad_fingerprints(fingerprints, lane=lane)
    out = np.zeros((3 * _P10_BLPAD, fp.shape[1]), dtype=np.uint8)
    for b in range(3):
        out[b * _P10_BLPAD : b * _P10_BLPAD + bl] = \
            fp[b * bl : (b + 1) * bl]
    return np.ascontiguousarray(out).view(np.int32)


def _pack_pos10(pos, f4i, valid, bl):
    """Absolute positions int32 [R, H, 3] + replicated-byte fingerprints
    [R, H] + validity -> packed int32 [R, H/4 + H]:
    [f-words (4 hashes/word, low byte first) | offset words].  bl may be
    a traced scalar.  Invalid hashes become (1023,1023,1023) offsets +
    poison byte 1."""
    bl = bl.astype(jnp.int32) if hasattr(bl, "astype") else jnp.int32(bl)
    R, H, _ = pos.shape
    o0 = pos[..., 0]
    o1 = pos[..., 1] - bl
    o2 = pos[..., 2] - 2 * bl
    w = o0 | (o1 << 10) | (o2 << 20)
    w = jnp.where(valid, w, jnp.int32(1023 | (1023 << 10) | (1023 << 20)))
    fb = jnp.where(valid, f4i & 0xFF, jnp.int32(1))
    fb4 = fb.reshape(R, H // 4, 4)
    fw = (fb4[..., 0] | (fb4[..., 1] << 8) | (fb4[..., 2] << 16)
          | (fb4[..., 3] << 24))
    return jnp.concatenate([fw, w], axis=1)


def _body_counts_pairmax(mask, hb: int = _P10_HB, nr: int = _P10_NR):
    """ceil(valid_prefix/hb) bodies per read, maximized over each group
    of nr interleaved reads (the pair shares one trip count; the shorter
    read's extra slots are offset-1023 sentinel probes)."""
    b = _body_counts(mask, hb)[:, 0, 0]  # [R]
    R = b.shape[0]
    g = b.reshape(R // nr, nr).max(axis=1)
    return jnp.repeat(g, nr)[:, None, None].astype(jnp.int32)


def _kernel_p10x2(pos_ref, cnt_ref, fp_ref, out_ref):
    """One (bin_tile, read_pair_tile) grid cell.

    pos_ref: int32 [RT, 1, H/4 + H] (SMEM) _pack_pos10 layout
    cnt_ref: int32 [RT, 1, 1]      (SMEM) pair-max bodies
    fp_ref:  int32 [3*1024, BT4]   (VMEM) block-padded packed table
    out_ref: int32 [RT, 4, BT4]
    """
    RT = pos_ref.shape[0]
    BT4 = out_ref.shape[2]
    H2 = pos_ref.shape[2]
    Hf = H2 // 5  # f-words region length (H/4)
    NR, HB = _P10_NR, _P10_HB

    def fetch(r, h, fw, u):
        w = pos_ref[r, 0, Hf + h]
        p0 = w & 1023
        p1 = _P10_BLPAD + (jax.lax.shift_right_logical(w, 10) & 1023)
        p2 = 2 * _P10_BLPAD + jax.lax.shift_right_logical(w, 20)
        f4 = (jax.lax.shift_right_logical(fw, 8 * (u & 3))
              & 0xFF) * 0x01010101
        return p0, p1, p2, f4

    def read_body(rp, _):
        rs = [NR * rp + i for i in range(NR)]
        nb = cnt_ref[rs[0], 0, 0]

        def hash_body(hu, packed):
            rows = []
            for r in rs:
                fw = [jnp.int32(0)]
                for u in range(HB):
                    h = hu * HB + u
                    if u % 4 == 0:
                        fw[0] = pos_ref[r, 0, h >> 2]
                    p0, p1, p2, f4 = fetch(r, h, fw[0], u)
                    rows.append(
                        (fp_ref[p0, :] ^ fp_ref[p1, :] ^ fp_ref[p2, :]
                         ^ f4)[None, :])
            x = jnp.concatenate(rows, axis=0)  # [NR*HB, BT4]
            nz = ((x & _LOW7) + _LOW7) | x
            hits = jax.lax.shift_right_logical((~nz) & _SIGN, 7)
            return packed + hits

        def chunk_body(ci, accs):
            lo = ci * _FLUSH_BODIES
            hi = jnp.minimum(nb, lo + _FLUSH_BODIES)
            packed = jax.lax.fori_loop(
                lo, hi, hash_body,
                jnp.zeros((NR * HB, BT4), jnp.int32))
            out = []
            for i in range(NR):
                a0, a1, a2, a3 = accs[i]
                p = packed[i * HB : (i + 1) * HB]
                a0 = a0 + jnp.sum(p & _B0, axis=0)
                a1 = a1 + jnp.sum(
                    jax.lax.shift_right_logical(p, 8) & _B0, axis=0)
                a2 = a2 + jnp.sum(
                    jax.lax.shift_right_logical(p, 16) & _B0, axis=0)
                a3 = a3 + jnp.sum(
                    jax.lax.shift_right_logical(p, 24), axis=0)
                out.append((a0, a1, a2, a3))
            return tuple(out)

        zero = jnp.zeros((BT4,), jnp.int32)
        nc = (nb + _FLUSH_BODIES - 1) // _FLUSH_BODIES
        accs = jax.lax.fori_loop(
            0, nc, chunk_body,
            tuple((zero, zero, zero, zero) for _ in range(NR)))
        for i, r in enumerate(rs):
            a0, a1, a2, a3 = accs[i]
            out_ref[r, 0, :] = a0
            out_ref[r, 1, :] = a1
            out_ref[r, 2, :] = a2
            out_ref[r, 3, :] = a3
        return 0

    jax.lax.fori_loop(0, RT // NR, read_body, 0)


@functools.partial(jax.jit, static_argnames=("bin_tile4", "interpret"))
def _probe_call_p10x2(fp_p10, posp, bodies, bin_tile4, interpret):
    """posp int32 [R, 1, H/4 + H] (_pack_pos10), bodies pair-maxed."""
    R, _, H2 = posp.shape
    S1, B4 = fp_p10.shape
    RT = _READ_TILE
    grid = (B4 // bin_tile4, R // RT)
    out = pl.pallas_call(
        _kernel_p10x2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RT, 1, H2), lambda j, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RT, 1, 1), lambda j, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((S1, bin_tile4), lambda j, r: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RT, 4, bin_tile4), lambda j, r: (r, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 4, B4), jnp.int32),
        interpret=interpret,
    )(posp, bodies, fp_p10)
    return jnp.moveaxis(out, 1, 2).reshape(R, 4 * B4)


def _probe_call_chunked_p10(fp_p10, pos, f4i, valid, bl, bin_tile4,
                            interpret):
    """p10x2 probe for arbitrary hash widths; same contract as
    _probe_call_chunked but takes RAW absolute positions + the (possibly
    traced) block length, and fp_p10 from prepare_fingerprints_p10."""
    R, H, _ = pos.shape
    if H <= _H_CHUNK:
        posp = _pack_pos10(pos, f4i, valid, bl).reshape(R, 1, -1)
        return _probe_call_p10x2(fp_p10, posp,
                                 _body_counts_pairmax(valid),
                                 bin_tile4, interpret)
    assert H % _H_CHUNK == 0
    nc = H // _H_CHUNK
    parts = []
    for c in range(nc):
        sl = slice(c * _H_CHUNK, (c + 1) * _H_CHUNK)
        posp = _pack_pos10(pos[:, sl], f4i[:, sl], valid[:, sl],
                           bl).reshape(R, 1, -1)
        parts.append(_probe_call_p10x2(
            fp_p10, posp, _body_counts_pairmax(valid[:, sl]),
            bin_tile4, interpret))
    return sum(parts[1:], parts[0])


# ---------------------------------------------------------------------- #
# replicated-row kernel: bins <= 512 (B4 <= 128, one vreg per row)
# ---------------------------------------------------------------------- #
# The sublane kernel above pays a dynamic sublane load + rotate for every
# probe row — measured ~15.6 cycles/hash at 128-word rows, the narrow-
# index floor called out in PHASES_r02.  This kernel tests the escape:
# replicate each row across all 8 sublanes ([S1, 8, B4] — the
# (8, B4<=128) minor dims tile exactly one vreg), so fp_ref[p] is ONE
# aligned whole-vreg load with no rotate; a constant-mask select places
# hash u's row on sublane u and the packed-byte SWAR pipeline applies
# unchanged.  ~7 vector ops/hash vs ~11.
#
# MEASURED (bench shape, [2419, 128] table, 173 hashes/read, real v5e):
# 24.55 ms vs 23.37 ms for the sublane kernel — NO speedup despite
# halving the vector ops, because the narrow probe is bound by the
# SCALAR core, not the VPU: per hash it must issue 4 SMEM reads
# (3 positions + fingerprint), 3 address computations and 3 vector-load
# issues — ~10-15 scalar-unit cycles that do not shrink with row
# alignment.  The wide kernel (rows >= 8 vregs) lands at the same
# ~15 cycles/hash while moving 16x the bytes — same scalar floor, which
# is why it reaches 703 GB/s and the narrow kernel only 92.  Kept
# behind USE_REPL_PROBE=False as the measured evidence for the floor
# analysis (PHASES_r03.md); both VERDICT-suggested escapes are bounded
# by the same scalar-issue cost.

USE_REPL_PROBE = False
_REPL_MAX_B4 = _LANE  # replicated rows must fit one vreg


def _kernel_repl(pos_ref, fpr_ref, cnt_ref, fp_ref, out_ref):
    """One read-tile grid cell over a replicated-row table.

    pos_ref: int32 [RT, 1, H*3] (SMEM)
    fpr_ref: int32 [RT, 1, H]   (SMEM) fingerprint replicated to 4 bytes
    cnt_ref: int32 [RT, 1, 1]   (SMEM) bodies = ceil(valid / U)
    fp_ref:  int32 [S+1, 8, BT4] (VMEM) rows replicated across sublanes
    out_ref: int32 [RT, 4, BT4]
    """
    RT = pos_ref.shape[0]
    BT4 = out_ref.shape[2]
    U = _HASH_UNROLL
    sub = jax.lax.broadcasted_iota(jnp.int32, (U, BT4), 0)

    def read_body(r, _):
        nb = cnt_ref[r, 0, 0]

        def hash_body(hu, packed):
            X = None
            for u in range(U):
                h = hu * U + u
                p0 = pos_ref[r, 0, 3 * h]
                p1 = pos_ref[r, 0, 3 * h + 1]
                p2 = pos_ref[r, 0, 3 * h + 2]
                f4 = fpr_ref[r, 0, h]
                x = (fp_ref[p0] ^ fp_ref[p1] ^ fp_ref[p2]) ^ f4
                X = x if u == 0 else jnp.where(sub == u, x, X)
            nz = ((X & _LOW7) + _LOW7) | X
            hits = jax.lax.shift_right_logical((~nz) & _SIGN, 7)
            return packed + hits

        def chunk_body(ci, accs):
            a0, a1, a2, a3 = accs
            lo = ci * _FLUSH_BODIES
            hi = jnp.minimum(nb, lo + _FLUSH_BODIES)
            packed = jax.lax.fori_loop(
                lo, hi, hash_body, jnp.zeros((U, BT4), jnp.int32)
            )
            a0 = a0 + jnp.sum(packed & _B0, axis=0)
            a1 = a1 + jnp.sum(
                jax.lax.shift_right_logical(packed, 8) & _B0, axis=0)
            a2 = a2 + jnp.sum(
                jax.lax.shift_right_logical(packed, 16) & _B0, axis=0)
            a3 = a3 + jnp.sum(
                jax.lax.shift_right_logical(packed, 24), axis=0)
            return (a0, a1, a2, a3)

        zero = jnp.zeros((BT4,), jnp.int32)
        nc = (nb + _FLUSH_BODIES - 1) // _FLUSH_BODIES
        a0, a1, a2, a3 = jax.lax.fori_loop(
            0, nc, chunk_body, (zero, zero, zero, zero)
        )
        out_ref[r, 0, :] = a0
        out_ref[r, 1, :] = a1
        out_ref[r, 2, :] = a2
        out_ref[r, 3, :] = a3
        return 0

    jax.lax.fori_loop(0, RT, read_body, 0)


def _repl_eligible(S1: int, B4: int) -> bool:
    return (B4 <= _REPL_MAX_B4
            and S1 * 8 * _LANE * 4 <= _FP_VMEM_SINGLE)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _probe_call_repl(fp_packed, pos, fpr4, bodies, interpret):
    """Replicated-row probe: fp_packed [S1, B4] with B4 <= 128.  Same
    contract as _probe_call with bin_tile4 == B4 (single column tile).
    The 8x replication materializes per call (an HBM write of 8x the
    table, ~10 MB / ~15 us on the bench shape — noise vs the probe)."""
    R, _, H3 = pos.shape
    H = H3 // 3
    S1, B4 = fp_packed.shape
    RT = _READ_TILE
    fp3 = jnp.broadcast_to(fp_packed[:, None, :], (S1, 8, B4))
    if B4 < _LANE:  # pad to full lanes so the minor dims tile one vreg
        fp3 = jnp.pad(fp3, ((0, 0), (0, 0), (0, _LANE - B4)))
    BT4 = fp3.shape[2]
    grid = (R // RT,)
    out = pl.pallas_call(
        _kernel_repl,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RT, 1, H3), lambda r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RT, 1, H), lambda r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RT, 1, 1), lambda r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((S1, 8, BT4), lambda r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RT, 4, BT4), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 4, BT4), jnp.int32),
        interpret=interpret,
    )(pos, fpr4, bodies, fp3)
    # de-interleave: bin 4w+j lives at out[:, j, w]; drop lane padding
    return jnp.moveaxis(out[:, :, :B4], 1, 2).reshape(R, 4 * B4)


# ---------------------------------------------------------------------- #
# wide-row kernel: bins >= 4096
# ---------------------------------------------------------------------- #
# A dynamic row read of a 2-D [S, BT4] VMEM block lands on sublane p%8 of
# vreg p//8, costing a sublane rotate per load.  When a row spans >= 8
# vregs (B4 >= 1024 words, i.e. >= 4096 bins) the table reshapes to
# [S, 8, B4/8]: the last two dims tile exactly onto (sublane, lane), so
# fp_ref[p] IS a run of whole aligned vregs — one load per vreg, no
# rotates.  Per hash: 3 row loads + 3 XORs + SWAR at FULL [8, lanes]
# width.  This is the GTDB-scale fast path; narrow indexes keep the
# sublane kernel whose stacked-SWAR amortization wins there.

_WIDE_MIN_B4 = 1024  # packed words per row required for the wide layout
_WIDE_UNROLL = 4


def _kernel_wide(pos_ref, fpr_ref, cnt_ref, fp_ref, out_ref):
    """One (bin_tile, read_tile) grid cell, wide layout.

    pos_ref: int32 [RT, 1, H*3] (SMEM)
    fpr_ref: int32 [RT, 1, H]   (SMEM) fingerprint replicated to 4 bytes
    cnt_ref: int32 [RT, 1, 1]   (SMEM) bodies = ceil(valid / _WIDE_UNROLL)
    fp_ref:  int32 [S+1, 8, BTW] (VMEM) packed fingerprints, row-major
                                 word j*BTW_total+w at (slot, j, w)
    out_ref: int32 [RT, 4, 8, BTW] per-byte-lane counts
    """
    BTW = fp_ref.shape[2]
    U = _WIDE_UNROLL

    def read_body(r, _):
        nb = cnt_ref[r, 0, 0]

        def hash_body(hu, packed):
            acc = packed
            for u in range(U):
                h = hu * U + u
                p0 = pos_ref[r, 0, 3 * h]
                p1 = pos_ref[r, 0, 3 * h + 1]
                p2 = pos_ref[r, 0, 3 * h + 2]
                f4 = fpr_ref[r, 0, h]
                x = fp_ref[p0] ^ fp_ref[p1] ^ fp_ref[p2] ^ f4  # [8, BTW]
                nz = ((x & _LOW7) + _LOW7) | x
                hits = jax.lax.shift_right_logical((~nz) & _SIGN, 7)
                acc = acc + hits
            return acc

        def chunk_body(ci, accs):
            a0, a1, a2, a3 = accs
            lo = ci * _FLUSH_BODIES
            hi = jnp.minimum(nb, lo + _FLUSH_BODIES)
            packed = jax.lax.fori_loop(
                lo, hi, hash_body, jnp.zeros((8, BTW), jnp.int32)
            )
            a0 = a0 + (packed & _B0)
            a1 = a1 + (jax.lax.shift_right_logical(packed, 8) & _B0)
            a2 = a2 + (jax.lax.shift_right_logical(packed, 16) & _B0)
            a3 = a3 + jax.lax.shift_right_logical(packed, 24)
            return (a0, a1, a2, a3)

        zero = jnp.zeros((8, BTW), jnp.int32)
        nc = (nb + _FLUSH_BODIES - 1) // _FLUSH_BODIES
        a0, a1, a2, a3 = jax.lax.fori_loop(
            0, nc, chunk_body, (zero, zero, zero, zero)
        )
        out_ref[r, 0] = a0
        out_ref[r, 1] = a1
        out_ref[r, 2] = a2
        out_ref[r, 3] = a3
        return 0

    jax.lax.fori_loop(0, pos_ref.shape[0], read_body, 0)


@functools.partial(jax.jit, static_argnames=("bin_tile4", "interpret"))
def _probe_call_wide(fp_packed, pos, fpr4, bodies, bin_tile4, interpret):
    """Wide-row probe: fp_packed [S1, B4] with B4 % _WIDE_MIN_B4 == 0 and
    bin_tile4 % _WIDE_MIN_B4 == 0.  Same contract as _probe_call."""
    R, _, H3 = pos.shape
    H = H3 // 3
    S1, B4 = fp_packed.shape
    RT = _READ_TILE
    BTW = bin_tile4 // 8
    fp3 = fp_packed.reshape(S1, 8, B4 // 8)
    grid = (B4 // bin_tile4, R // RT)
    out = pl.pallas_call(
        _kernel_wide,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RT, 1, H3), lambda j, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RT, 1, H), lambda j, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RT, 1, 1), lambda j, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((S1, 8, BTW), lambda j, r: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RT, 4, 8, BTW),
                               lambda j, r: (r, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 4, 8, B4 // 8), jnp.int32),
        interpret=interpret,
    )(pos, fpr4, bodies, fp3)
    # bin 4*(j*(B4/8)+w)+c lives at out[:, c, j, w]
    return jnp.moveaxis(out, 1, 3).reshape(R, 4 * B4)


def _wide_eligible(B4: int, bin_tile4: int) -> bool:
    return (B4 % _WIDE_MIN_B4 == 0 and bin_tile4 % _WIDE_MIN_B4 == 0)


@functools.partial(jax.jit, static_argnames=("bin_tile4", "interpret"))
def _probe_call(fp_packed, pos, fpr4, bodies, bin_tile4, interpret):
    R, _, H3 = pos.shape
    H = H3 // 3
    S1, B4 = fp_packed.shape
    RT = _READ_TILE
    grid = (B4 // bin_tile4, R // RT)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RT, 1, H3), lambda j, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RT, 1, H), lambda j, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RT, 1, 1), lambda j, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((S1, bin_tile4), lambda j, r: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RT, 4, bin_tile4), lambda j, r: (r, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 4, B4), jnp.int32),
        interpret=interpret,
    )(pos, fpr4, bodies, fp_packed)
    # de-interleave: bin 4w+j lives at out[:, j, w]
    return jnp.moveaxis(out, 1, 2).reshape(R, 4 * B4)


# max hash slots per kernel row: bounds the SMEM block of one read tile
# (RT * 3 * _H_CHUNK int32 positions); longer hash lists fold into extra
# rows (see _probe_call_chunked)
_H_CHUNK = 512


def _probe_call_chunked(fp_packed, pos, f4i, valid, bin_tile4, interpret):
    """Probe for arbitrary hash widths: the hash axis folds into extra
    kernel rows of <= _H_CHUNK slots whose counts sum back per read.
    Because dedup leaves hashes sorted with the invalid tail last,
    trailing sub-rows get a zero trip count — near-free.  pos is
    [R, H, 3] (NOT flattened), f4i [R, H] int32, valid [R, H] bool.
    Dispatches to the wide-row kernel when the geometry allows."""
    R, H, _ = pos.shape
    S1, B4 = fp_packed.shape
    if USE_REPL_PROBE and _repl_eligible(S1, B4):
        call = lambda fp, p, f, b, bt, itp: _probe_call_repl(  # noqa: E731
            fp, p, f, b, itp)
        unroll = _HASH_UNROLL
        if H <= _H_CHUNK:
            return call(fp_packed, pos.reshape(R, 1, H * 3),
                        f4i[:, None, :], _body_counts(valid, unroll),
                        bin_tile4, interpret)
        assert H % _H_CHUNK == 0
        nc = H // _H_CHUNK
        pos2 = pos.reshape(R * nc, 1, _H_CHUNK * 3)
        f4i2 = f4i.reshape(R * nc, 1, _H_CHUNK)
        bodies = _body_counts(valid.reshape(R * nc, _H_CHUNK), unroll)
        counts = call(fp_packed, pos2, f4i2, bodies, bin_tile4, interpret)
        return counts.reshape(R, nc, -1).sum(axis=1)
    wide = _wide_eligible(B4, bin_tile4)
    if not wide and B4 % _WIDE_MIN_B4 == 0:
        # the chosen tile is too small for the wide layout (double
        # buffering would blow scoped VMEM) — split the columns into
        # separate single-tile wide calls instead, each of which is NOT
        # double-buffered and may use the full budget
        gs = (_FP_VMEM_SINGLE // (4 * S1 * _WIDE_MIN_B4)) * _WIDE_MIN_B4
        gs = min(gs, B4)
        if gs >= _WIDE_MIN_B4:
            while B4 % gs:
                gs -= _WIDE_MIN_B4
            parts = [
                _probe_call_chunked(
                    jax.lax.slice_in_dim(fp_packed, g * gs, (g + 1) * gs,
                                         axis=1),
                    pos, f4i, valid, gs, interpret)
                for g in range(B4 // gs)
            ]
            return jnp.concatenate(parts, axis=1)
    unroll = _WIDE_UNROLL if wide else _HASH_UNROLL
    if USE_P16 and S1 <= _P16_MAX_S1:
        posp = _pack_pos16(pos, f4i)
        callp = _probe_call_wide_p16 if wide else _probe_call_p16
        if H <= _H_CHUNK:
            return callp(fp_packed, posp.reshape(R, 1, H * 2),
                         _body_counts(valid, unroll), bin_tile4,
                         interpret)
        assert H % _H_CHUNK == 0
        nc = H // _H_CHUNK
        posp2 = posp.reshape(R * nc, 1, _H_CHUNK * 2)
        bodies = _body_counts(valid.reshape(R * nc, _H_CHUNK), unroll)
        counts = callp(fp_packed, posp2, bodies, bin_tile4, interpret)
        return counts.reshape(R, nc, -1).sum(axis=1)
    call = _probe_call_wide if wide else _probe_call
    if H <= _H_CHUNK:
        return call(fp_packed, pos.reshape(R, 1, H * 3),
                    f4i[:, None, :], _body_counts(valid, unroll),
                    bin_tile4, interpret)
    assert H % _H_CHUNK == 0
    nc = H // _H_CHUNK
    pos2 = pos.reshape(R * nc, 1, _H_CHUNK * 3)
    f4i2 = f4i.reshape(R * nc, 1, _H_CHUNK)
    bodies = _body_counts(valid.reshape(R * nc, _H_CHUNK), unroll)
    counts = call(fp_packed, pos2, f4i2, bodies, bin_tile4, interpret)
    return counts.reshape(R, nc, -1).sum(axis=1)


def _body_counts(mask, unroll: int = _HASH_UNROLL) -> "jnp.ndarray":
    """ceil(valid_prefix_len / unroll) loop bodies per read.  Uses the
    LAST true position (not the sum) so interior-false masks stay
    correct — those slots are sentinel-probed and contribute nothing."""
    H = mask.shape[1]
    any_valid = mask.any(axis=1)
    last = H - jnp.argmax(mask[:, ::-1], axis=1)
    valid_len = jnp.where(any_valid, last, 0)
    bodies = (valid_len + unroll - 1) // unroll
    return bodies.astype(jnp.int32)[:, None, None]


def pack_batch(hashes: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Combine hash halves + validity mask into ONE uint32 array so a
    batch costs a single host->device transfer (each synchronous upload
    pays a full tunnel round-trip on remote-attached TPUs)."""
    R, H = hashes.shape
    out = np.empty((R, 3 * H), dtype=np.uint32)
    lo_hi = np.ascontiguousarray(hashes).view(np.uint32).reshape(R, H, 2)
    out[:, :H] = lo_hi[:, :, 1]  # little-endian host: word 1 = high half
    out[:, H : 2 * H] = lo_hi[:, :, 0]
    out[:, 2 * H :] = mask
    return out


def pack_hash_lists(hash_lists, Hpad: int, read_tile: int = _READ_TILE
                    ) -> np.ndarray:
    """Build the packed [Rpad, 3*Hpad] uint32 batch directly from ragged
    per-read hash arrays — one pass, no [R, H] uint64 intermediate (the
    2-core host was spending more time concatenating than the TPU spends
    probing)."""
    R = len(hash_lists)
    Rp = R + ((-R) % read_tile)
    out = np.zeros((Rp, 3 * Hpad), dtype=np.uint32)
    for r, h in enumerate(hash_lists):
        n = h.shape[0]
        lo_hi = h.view(np.uint32).reshape(n, 2)  # little-endian: [lo, hi]
        out[r, :n] = lo_hi[:, 1]
        out[r, Hpad : Hpad + n] = lo_hi[:, 0]
        out[r, 2 * Hpad : 2 * Hpad + n] = 1
    return out


@functools.partial(jax.jit,
                   static_argnames=("bin_tile4", "interpret", "use_p10",
                                    "prefix_runs"))
def fused_probe_step(
    fp_packed,  # int32 [S+1, B4] (or [3*1024, B4] p10 table)
    batch,  # uint32 [R, 3H]: [h_hi | h_lo | mask] (pack_batch)
    active,  # bool [R]    active-read mask (frontier descent)
    onehot,  # float32 [4*B4, n_runs]
    seed_hi,  # uint32 scalar
    seed_lo,  # uint32 scalar
    block_length,  # uint32 scalar
    bin_tile4: int,
    interpret: bool = False,
    use_p10: bool = False,
    prefix_runs: int = 0,
):
    """Whole per-IXF search step on device: murmur mix + probe positions
    (32-bit pair math), Pallas probe/count, run segmentation matmul.
    Geometry scalars are traced, so one compilation covers every IXF that
    shares (R, H, S+1, B4) shapes.  use_p10 (static): fp_packed is the
    block-padded prepare_fingerprints_p10 table and the p10x2 kernel
    runs.  prefix_runs (static, flat indexes): when every run is ONE
    technical bin at its own index (runs_of_ixf gives starts == arange),
    the segmentation matmul is the identity on the first n columns —
    slice instead (the [R,4096]x[4096,4096] HIGHEST-precision matmul
    cost 7 ms/pass on the flat_4096 bench config; the slice is free).
    Returns int32 [R, n_runs] run sums."""
    from ..utils.u64jnp import probe_positions_and_fprint4

    R = batch.shape[0]
    H = batch.shape[1] // 3
    h_hi = batch[:, :H]
    h_lo = batch[:, H : 2 * H]
    mask = batch[:, 2 * H :] != 0
    S1 = fp_packed.shape[0]
    pos, f4 = probe_positions_and_fprint4(h_hi, h_lo, seed_hi, seed_lo,
                                          block_length)
    mask = mask & active[:, None]
    # the no-hit fingerprint must poison ALL 4 byte lanes of the packed
    # word (a bare 1 would leave lanes 1-3 matching the zero sentinel row)
    f4 = jnp.where(mask, f4, jnp.uint32(0x01010101))
    f4i = jax.lax.bitcast_convert_type(f4, jnp.int32)
    if use_p10:
        counts = _probe_call_chunked_p10(fp_packed, pos, f4i, mask,
                                         block_length, bin_tile4,
                                         interpret)
    else:
        sentinel = jnp.int32(S1 - 1)
        pos = jnp.where(mask[..., None], pos, sentinel)
        counts = _probe_call_chunked(fp_packed, pos, f4i, mask, bin_tile4,
                                     interpret)
    if prefix_runs:
        return counts[:, :prefix_runs]
    return jnp.dot(
        counts.astype(jnp.float32), onehot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def finalize_topk(sums, thresholds, run_users, k: int):
    """Device-side emission compaction for single-level (flat) indexes.

    The tunneled-TPU return path is latency/bandwidth bound (~40 ms +
    ~15 MB/s), so downloading the dense [R, n_runs] count matrix dominates
    the whole search step.  Instead: apply the per-read threshold on
    device, take the top-k candidate bins, and ship one packed
    [R, 2k] int32 array (counts | user bins).  The host applies the exact
    float64 ``count >= 0.8*max`` rule (taxor_search.cpp:285) to the
    candidates and falls back to the host oracle for the (rare) reads
    where k candidates all survive — i.e. truncation was possible.

    sums:       int32 [R, n_runs] run sums (runs = user bins when flat)
    thresholds: int32 [R]
    run_users:  int32 [n_runs], -1 for merged runs (excluded)
    Returns packed int32 [R, 2k]: [:, :k] counts desc (-1 = below
    threshold / padding), [:, k:] their user bins.
    """
    n_runs = sums.shape[1]
    valid = (sums >= thresholds[:, None]) & (run_users >= 0)[None, :]
    vs = jnp.where(valid, sums, jnp.int32(-1))
    kk = min(k, n_runs)
    vals, idx = jax.lax.top_k(vs, kk)
    users = run_users[idx]
    users = jnp.where(vals >= 0, users, jnp.int32(-1))
    if kk < k:
        pad = ((0, 0), (0, k - kk))
        vals = jnp.pad(vals, pad, constant_values=-1)
        users = jnp.pad(users, pad, constant_values=-1)
    return jnp.concatenate([vals, users], axis=1)


def prepare_fingerprints(fingerprints: np.ndarray,
                         lane: int = 4 * _LANE,
                         sentinel: bool = True) -> np.ndarray:
    """uint8 [S, B] -> packed int32 [S(+1), Bpad/4].  Bins pad to `lane`
    (default 4*LANE so each packed tile has full 128 lanes; group
    assembly packs members at lane=4 and pads only the concatenation).
    sentinel appends the zero no-hit row."""
    from .probe import pad_fingerprints

    fp = pad_fingerprints(fingerprints, lane=lane)
    if sentinel:
        fp = np.vstack([fp, np.zeros((1, fp.shape[1]), dtype=np.uint8)])
    return np.ascontiguousarray(fp).view(np.int32)


def choose_bin_tile4(slots_plus_1: int, b4: int) -> int | None:
    """Largest lane-multiple packed tile fitting VMEM.  A single-tile
    block (bt == b4, constant index map) is not double-buffered and may
    use the full scoped budget; multi-tile blocks get half.  When the
    row is wide enough for the rotate-free kernel (_kernel_wide), prefer
    a _WIDE_MIN_B4-multiple tile so it stays eligible."""
    row_bytes = max(1, 4 * slots_plus_1)
    if b4 * row_bytes <= _FP_VMEM_SINGLE:
        return b4
    max_bt = _FP_VMEM_TILE // row_bytes
    if b4 % _WIDE_MIN_B4 == 0:
        bt = min(b4, (max_bt // _WIDE_MIN_B4) * _WIDE_MIN_B4)
        if bt >= _WIDE_MIN_B4:
            while b4 % bt:
                bt -= _WIDE_MIN_B4
            return bt
    bt = min(b4, (max_bt // _LANE) * _LANE)
    if bt < _LANE:
        return None
    while b4 % bt:
        bt -= _LANE
    return bt


def probe_counts_pallas(
    fp_packed: jax.Array,  # int32 [S+1, Bpad/4] (prepare_fingerprints)
    positions: np.ndarray,  # int[R, H, 3]
    fprints: np.ndarray,  # uint8 [R, H]
    mask: np.ndarray,  # bool [R, H]
    interpret: bool = False,
) -> jax.Array:
    """int32 [R, Bpad] per-bin counts (padded bins behave like the
    reference's unused zero bins)."""
    S1, B4 = fp_packed.shape
    bt4 = choose_bin_tile4(S1, B4)
    if bt4 is None:
        raise ValueError("fingerprint block exceeds VMEM budget")
    sentinel = S1 - 1
    R, H = mask.shape
    rpad = (-R) % _READ_TILE
    hpad = (-H) % (_H_CHUNK if H > _H_CHUNK else _HASH_UNROLL)
    if rpad or hpad:
        positions = np.pad(positions, ((0, rpad), (0, hpad), (0, 0)))
        fprints = np.pad(fprints, ((0, rpad), (0, hpad)))
        mask = np.pad(mask, ((0, rpad), (0, hpad)))
    pos = np.where(mask[:, :, None], positions, sentinel).astype(np.int32)
    f = np.where(mask, fprints.astype(np.uint32), 1)
    f4 = (f * np.uint32(0x01010101)).astype(np.uint32).view(np.int32)
    out = _probe_call_chunked(fp_packed, jnp.asarray(pos),
                              jnp.asarray(f4), jnp.asarray(mask),
                              bt4, interpret)
    return out[:R] if rpad else out
