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

# VMEM budget for the packed fingerprint block (bytes)
_FP_VMEM_BUDGET = 10 * 1024 * 1024
_LANE = 128

_B0 = 0x000000FF
_B1 = 0x0000FF00
_B2 = 0x00FF0000
_B3 = -16777216  # 0xFF000000 as int32


# reads processed per grid cell: amortizes grid-step overhead
_READ_TILE = 16
# inner unroll over hashes: independent dependency chains hide VMEM load
# latency
_HASH_UNROLL = 4


def _kernel(pos_ref, fpr_ref, fp_ref, out_ref):
    """One (bin_tile, read_tile) grid cell.

    pos_ref: int32 [RT, 1, H*3]  (SMEM) probe rows per read/hash, flat
                                 (SMEM pads the last dim to 128 lanes, so
                                 a trailing dim of 3 would waste 43x)
    fpr_ref: int32 [RT, 1, H]    (SMEM) fingerprint replicated to 4 bytes
    fp_ref:  int32 [S+1, BT4]    (VMEM) packed fingerprint block
    out_ref: int32 [RT, 4, BT4]  (VMEM) per-byte-lane counts per read
    """
    RT = pos_ref.shape[0]
    H = fpr_ref.shape[2]
    BT4 = out_ref.shape[2]
    U = _HASH_UNROLL

    def read_body(r, _):
        def hash_body(hu, accs):
            a0, a1, a2, a3 = accs
            for u in range(U):
                h = hu * U + u
                p0 = pos_ref[r, 0, 3 * h]
                p1 = pos_ref[r, 0, 3 * h + 1]
                p2 = pos_ref[r, 0, 3 * h + 2]
                f4 = fpr_ref[r, 0, h]
                x = fp_ref[p0, :] ^ fp_ref[p1, :] ^ fp_ref[p2, :] ^ f4
                a0 = a0 + jnp.where((x & _B0) == 0, 1, 0)
                a1 = a1 + jnp.where((x & _B1) == 0, 1, 0)
                a2 = a2 + jnp.where((x & _B2) == 0, 1, 0)
                a3 = a3 + jnp.where((x & _B3) == 0, 1, 0)
            return (a0, a1, a2, a3)

        zero = jnp.zeros((BT4,), jnp.int32)
        a0, a1, a2, a3 = jax.lax.fori_loop(
            0, H // U, hash_body, (zero, zero, zero, zero)
        )
        out_ref[r, 0, :] = a0
        out_ref[r, 1, :] = a1
        out_ref[r, 2, :] = a2
        out_ref[r, 3, :] = a3
        return 0

    jax.lax.fori_loop(0, RT, read_body, 0)


@functools.partial(jax.jit, static_argnames=("bin_tile4", "interpret"))
def _probe_call(fp_packed, pos, fpr4, bin_tile4, interpret):
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
            pl.BlockSpec((S1, bin_tile4), lambda j, r: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RT, 4, bin_tile4), lambda j, r: (r, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 4, B4), jnp.int32),
        interpret=interpret,
    )(pos, fpr4, fp_packed)
    # de-interleave: bin 4w+j lives at out[:, j, w]
    return jnp.moveaxis(out, 1, 2).reshape(R, 4 * B4)


def pack_batch(hashes: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Combine hash halves + validity mask into ONE uint32 array so a
    batch costs a single host->device transfer (each synchronous upload
    pays a full tunnel round-trip on remote-attached TPUs)."""
    return np.concatenate(
        [
            (hashes >> np.uint64(32)).astype(np.uint32),
            (hashes & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            mask.astype(np.uint32),
        ],
        axis=1,
    )


@functools.partial(jax.jit, static_argnames=("bin_tile4", "interpret"))
def fused_probe_step(
    fp_packed,  # int32 [S+1, B4]
    batch,  # uint32 [R, 3H]: [h_hi | h_lo | mask] (pack_batch)
    active,  # bool [R]    active-read mask (frontier descent)
    onehot,  # float32 [4*B4, n_runs]
    seed_hi,  # uint32 scalar
    seed_lo,  # uint32 scalar
    block_length,  # uint32 scalar
    bin_tile4: int,
    interpret: bool = False,
):
    """Whole per-IXF search step on device: murmur mix + probe positions
    (32-bit pair math), Pallas probe/count, run segmentation matmul.
    Geometry scalars are traced, so one compilation covers every IXF that
    shares (R, H, S+1, B4) shapes.  Returns int32 [R, n_runs] run sums."""
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
    sentinel = jnp.int32(S1 - 1)
    pos = jnp.where(mask[..., None], pos, sentinel)
    # the no-hit fingerprint must poison ALL 4 byte lanes of the packed
    # word (a bare 1 would leave lanes 1-3 matching the zero sentinel row)
    f4 = jnp.where(mask, f4, jnp.uint32(0x01010101))
    pos_flat = pos.reshape(R, 1, H * 3)
    f4i = jax.lax.bitcast_convert_type(f4, jnp.int32)[:, None, :]
    counts = _probe_call(fp_packed, pos_flat, f4i, bin_tile4, interpret)
    return jnp.dot(
        counts.astype(jnp.float32), onehot,
        preferred_element_type=jnp.float32,
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


def prepare_fingerprints(fingerprints: np.ndarray) -> np.ndarray:
    """uint8 [S, B] -> packed int32 [S+1, Bpad/4] with a zero sentinel
    row appended.  Bins pad to a 4*LANE multiple so each packed tile has
    full 128 lanes."""
    from .probe import pad_fingerprints

    fp = pad_fingerprints(fingerprints, lane=4 * _LANE)
    fp = np.vstack([fp, np.zeros((1, fp.shape[1]), dtype=np.uint8)])
    return np.ascontiguousarray(fp).view(np.int32)


def choose_bin_tile4(slots_plus_1: int, b4: int) -> int | None:
    """Largest lane-multiple packed tile fitting the VMEM budget."""
    max_bt = _FP_VMEM_BUDGET // max(1, 4 * slots_plus_1)
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
    hpad = (-H) % _HASH_UNROLL
    if rpad or hpad:
        positions = np.pad(positions, ((0, rpad), (0, hpad), (0, 0)))
        fprints = np.pad(fprints, ((0, rpad), (0, hpad)))
        mask = np.pad(mask, ((0, rpad), (0, hpad)))
    pos = np.where(mask[:, :, None], positions, sentinel).astype(np.int32)
    pos_flat = pos.reshape(pos.shape[0], 1, -1)
    f = np.where(mask, fprints.astype(np.uint32), 1)
    f4 = (f * np.uint32(0x01010101)).astype(np.uint32).view(np.int32)
    out = _probe_call(fp_packed, jnp.asarray(pos_flat),
                      jnp.asarray(f4[:, None, :]), bt4, interpret)
    return out[:R] if rpad else out
