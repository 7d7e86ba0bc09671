"""Multi-chip sharding of the classification step.

The reference is single-process shared-memory (SURVEY.md §2.3); its only
parallelism is thread fan-out over reads.  TPU-native mapping:

  - ``reads`` mesh axis (data parallel): read batches shard across chips;
    the analog of ``do_parallel`` chunking (src/hixf/search/do_parallel.hpp).
  - ``bins`` mesh axis (index parallel): each IXF's fingerprint matrix
    [slots, bins] shards column-wise, so a 113 GB GTDB-scale index spreads
    across HBM of many chips.  Every chip probes its bin slice with the
    full (replicated) hash batch, then per-bin counts are combined with
    one ``all_gather`` over ICI — the distributed analog of the
    interleaved count (SURVEY.md §2.3 mapping).

Both axes compose in one 2-D mesh.  Probe positions index the UNsharded
slots axis, so sharding bins requires no communication during the gather
itself; the only collective is the tiny [R, bins] count exchange.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .probe import count_xla


def make_mesh(n_reads_shards: int, n_bin_shards: int,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_reads_shards * n_bin_shards
    if len(devices) < n:
        raise ValueError(
            f"need {n} devices, have {len(devices)}"
        )
    arr = np.array(devices[:n]).reshape(n_reads_shards, n_bin_shards)
    return Mesh(arr, ("reads", "bins"))


def shard_ixf(mesh: Mesh, fingerprints: np.ndarray) -> jax.Array:
    """Place a [slots, bins] fingerprint matrix column-sharded over the
    'bins' axis (replicated over 'reads')."""
    return jax.device_put(
        fingerprints, NamedSharding(mesh, P(None, "bins"))
    )


def sharded_count_fn(mesh: Mesh):
    """Build the jitted sharded count step.

    Inputs: fp [S, B] (bins-sharded), positions [R, H, 3], fprints [R, H],
    mask [R, H] (reads-sharded).  Output: counts [R, B] sharded over
    (reads, bins) — downstream jitted ops reshard as needed (XLA inserts
    the all_gather over ICI only where the consumer requires it).
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, "bins"), P("reads", None, None),
                  P("reads", None), P("reads", None)),
        out_specs=P("reads", "bins"),
    )
    def step(fp_local, pos_local, fpr_local, mask_local):
        return count_xla(fp_local, pos_local, fpr_local, mask_local)

    return jax.jit(step)


def sharded_search_step_fn(mesh: Mesh):
    """Full classification step over the mesh: probe (bins-sharded) ->
    all_gather counts -> user-bin run sums (one-hot matmul) -> threshold
    compare.  Returns (run_sums [R, n_runs], emitted [R, n_runs])."""

    count = sharded_count_fn(mesh)

    @jax.jit
    def step(fp, pos, fpr, mask, run_onehot, thresholds):
        counts = count(fp, pos, fpr, mask)  # [R, B] int32
        sums = jnp.dot(
            counts.astype(jnp.float32),
            run_onehot,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        emitted = sums >= thresholds[:, None]
        return sums, emitted

    return step
