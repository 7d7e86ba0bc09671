"""Fully-fused on-device search step: packed reads in, top-k bins out.

One jitted graph per (R, L, hcap) shape bucket:

    2-bit packed reads --> syncmer extraction (hash/device_syncmer)
      --> sort-dedup --> probe positions (u64 limb math)
      --> Pallas probe/count kernel --> run-segmentation matmul
      --> top-k raw sums + per-read unique-hash count

The host uploads ~L/4 bytes per read and downloads 2k+1 int32 per read;
thresholds and the exact float64 0.8*max rule stay on the host (decode),
so no device float math can perturb output parity.  Top-k is taken on RAW
sums — the thresholded candidate set is always a subset, so host-side
filtering plus the truncation fallback reproduces the reference emission
set exactly (see search/pipeline._pairs_from_e2e).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..hash.device_syncmer import dedup_sorted, syncmer_emit
from ..utils.u64jnp import probe_positions_and_fprint4
from .pallas_probe import _HASH_UNROLL, _body_counts, _probe_call


@functools.partial(
    jax.jit,
    static_argnames=("k", "s", "t", "hcap", "topk", "bin_tile4",
                     "interpret"),
)
def fused_e2e_step(
    fp_packed,  # int32 [S+1, B4] (prepare_fingerprints)
    raw_reads,  # uint8 [R, L] ASCII (pack_reads)
    lengths,  # int32 [R]
    onehot,  # float32 [4*B4, n_runs]
    run_users,  # int32 [n_runs], -1 for merged runs
    seed_hi,  # uint32 scalar
    seed_lo,  # uint32 scalar
    block_length,  # uint32 scalar
    *,
    k: int,
    s: int,
    t: int,
    hcap: int,
    topk: int,
    bin_tile4: int,
    interpret: bool = False,
):
    """Returns packed int32 [R, 2*topk + 1]:
    [:, :topk] descending raw run sums, [:, topk:2*topk] their user bins
    (-1 for merged/padding), [:, -1] the per-read unique hash count."""
    assert hcap % _HASH_UNROLL == 0
    R = raw_reads.shape[0]
    h_hi, h_lo, emit = syncmer_emit(raw_reads, lengths, k, s, t)
    hi, lo, valid, n_unique = dedup_sorted(h_hi, h_lo, emit, hcap)
    pos, f4 = probe_positions_and_fprint4(hi, lo, seed_hi, seed_lo,
                                          block_length)
    S1 = fp_packed.shape[0]
    pos = jnp.where(valid[..., None], pos, jnp.int32(S1 - 1))
    f4 = jnp.where(valid, f4, jnp.uint32(0x01010101))
    f4i = jax.lax.bitcast_convert_type(f4, jnp.int32)[:, None, :]
    counts = _probe_call(fp_packed, pos.reshape(R, 1, hcap * 3), f4i,
                         _body_counts(valid), bin_tile4, interpret)
    sums = jnp.dot(
        counts.astype(jnp.float32), onehot,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    vs = jnp.where((run_users >= 0)[None, :], sums, jnp.int32(-1))
    kk = min(topk, vs.shape[1])
    vals, idx = jax.lax.top_k(vs, kk)
    users = run_users[idx]
    users = jnp.where(vals >= 0, users, jnp.int32(-1))
    if kk < topk:
        pad = ((0, 0), (0, topk - kk))
        vals = jnp.pad(vals, pad, constant_values=-1)
        users = jnp.pad(users, pad, constant_values=-1)
    return jnp.concatenate([vals, users, n_unique[:, None]], axis=1)
