"""Device-side IXF probe/count — the throughput-critical primitive.

The classification hot loop (reference hot loop 2, SURVEY.md §3.2) is:
for every query hash, read 3 fingerprint rows of an HBM-resident
``[slots, bins]`` uint8 array, XOR them against the hash's fingerprint and
count zero lanes per bin.  Slot positions and fingerprints are precomputed
from the uint64 hash values (host numpy or 32-bit device math) so the
device path is 32-bit clean — TPUs have no native 64-bit integers.

Two implementations share one contract:
  - ``count_xla``: pure-XLA gather formulation, runs everywhere (CPU tests,
    TPU).  Hash axis is chunked with ``lax.scan`` so the gathered
    [chunk, 3, bins] tile stays small enough to fuse in VMEM.
  - a Pallas kernel (pallas_probe.py) for the roofline path on TPU.

Shapes are static: reads are padded to [R, H] hash slots with a validity
mask, bins padded to a lane multiple (128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128


def pad_bins(n_bins: int, lane: int = LANE) -> int:
    return max(lane, ((n_bins + lane - 1) // lane) * lane)


def pad_fingerprints(fp: np.ndarray, lane: int = LANE) -> np.ndarray:
    """Pad the bins axis to a lane multiple (padded columns stay 0 and are
    sliced off the counts)."""
    slots, bins = fp.shape
    padded = pad_bins(bins, lane)
    if padded == bins:
        return fp
    out = np.zeros((slots, padded), dtype=fp.dtype)
    out[:, :bins] = fp
    return out


@functools.partial(jax.jit, static_argnames=("hash_chunk",))
def count_xla(
    fingerprints: jax.Array,  # uint8 [slots, bins_padded]
    positions: jax.Array,  # int32 [R, H, 3]
    fprints: jax.Array,  # uint8 [R, H]
    mask: jax.Array,  # bool [R, H]
    hash_chunk: int = 128,
) -> jax.Array:
    """int32 [R, bins_padded] per-bin hit counts for a batch of reads."""
    R, H, _ = positions.shape
    pad = (-H) % hash_chunk
    if pad:
        positions = jnp.pad(positions, ((0, 0), (0, pad), (0, 0)))
        fprints = jnp.pad(fprints, ((0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    n_chunks = positions.shape[1] // hash_chunk
    positions = positions.reshape(R, n_chunks, hash_chunk, 3)
    fprints = fprints.reshape(R, n_chunks, hash_chunk)
    mask = mask.reshape(R, n_chunks, hash_chunk)

    bins = fingerprints.shape[1]

    def chunk_body(acc, args):
        pos, fpr, msk = args  # [R, C, 3], [R, C], [R, C]
        rows = fingerprints[pos]  # [R, C, 3, bins]
        x = rows[:, :, 0] ^ rows[:, :, 1] ^ rows[:, :, 2] ^ fpr[..., None]
        hit = (x == 0) & msk[..., None]
        return acc + hit.sum(axis=1, dtype=jnp.int32), None

    # derive the carry from the inputs so its varying-axes type matches
    # inside shard_map (a literal zeros carry is "unvarying" and scan
    # rejects the mismatch)
    init = (
        jnp.zeros((R, bins), dtype=jnp.int32)
        + (mask[:, 0, 0].astype(jnp.int32) * 0)[:, None]
        + (fingerprints[0, :].astype(jnp.int32) * 0)[None, :]
    )
    acc, _ = jax.lax.scan(
        chunk_body,
        init,
        (
            jnp.moveaxis(positions, 1, 0),
            jnp.moveaxis(fprints, 1, 0),
            jnp.moveaxis(mask, 1, 0),
        ),
    )
    return acc
