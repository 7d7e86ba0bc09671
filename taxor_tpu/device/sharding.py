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


def host_view(x) -> np.ndarray:
    """Materialize a (possibly multi-process, globally sharded) device
    array on THIS host.  Single-process: plain np.asarray.  Multi-process
    (jax.distributed): an allgather over processes so every host sees the
    full result — the device->host boundary of the distributed search."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


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


def _extract_hashes(packed_local, len_local, k, s, t, hcap, interpret,
                    scheme_kind, window, scale_thresh):
    """Per-chip extraction for the sharded fused steps: syncmer (fused
    Pallas kernel) or minimizer/plain-k-mer (leftmost-argmin, vector
    semantics), with the exact-integer FracMinHash filter — mirrors the
    single-device dispatch in e2e.fused_e2e_step so mesh runs cover the
    reference's default plain-k-mer scheme (taxor_search.cpp:242-259)
    and scaling > 1."""
    import jax.numpy as jnp

    from ..hash.device_syncmer import minimizer_kmers
    from .e2e import _scaling_keep, _syncmer_hashes

    if scheme_kind == "syncmer":
        hi, lo, valid, n_unique, n_emit = _syncmer_hashes(
            packed_local, len_local, k, s, t, hcap, interpret)
    else:
        hi, lo, valid, n_emit = minimizer_kmers(
            packed_local, len_local, k, window)
        n_unique = n_emit
    if scale_thresh:
        valid = valid & _scaling_keep(hi, lo, scale_thresh)
        n_unique = valid.sum(axis=1, dtype=jnp.int32)
    return hi, lo, valid, n_unique, n_emit


def sharded_e2e_fn(mesh: Mesh, k: int, s: int, t: int, hcap: int,
                   topk: int, interpret: bool = False,
                   scheme_kind: str = "syncmer", window: int = 0,
                   scale_thresh: int = 0):
    """The FULL fused search step (device/e2e.py) over the 2-D mesh —
    the production multi-chip configuration for flat indexes too large
    for one chip's HBM (e.g. GTDB-scale, BASELINE.md):

      1. extraction/dedup/wyhash shard over ALL devices (reads split
         across both mesh axes — every chip extracts a distinct slice),
      2. one tiled ``all_gather`` over the 'bins' axis re-collects each
         reads-row group's hashes (ICI; hashes are ~50x smaller than the
         per-bin count matrix would be),
      3. every chip probes its OWN bin shard of the interleaved
         fingerprint matrix with the Pallas kernel,
      4. run sums contract over the sharded bins axis via ``psum``,
      5. top-k runs replicated within each reads row.

    Returns a jitted fn(fp_packed, packed_reads, lengths, onehot,
    run_users, seed_hi, seed_lo, block_length) -> packed int32
    [R, 2*topk+2] with the same layout as fused_e2e_step.  Caller pads:
    R to reads*bins*_READ_TILE multiples, bins of fp_packed/onehot to
    the bins axis, and guarantees hcap % _HASH_UNROLL == 0.
    """
    import functools

    from ..utils.u64jnp import probe_positions_and_fprint4
    from .pallas_probe import _probe_call_chunked, choose_bin_tile4

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(None, "bins"),          # fp_packed [S+1, B4]
            P(("reads", "bins"), None),  # packed reads [R, L/4]
            P(("reads", "bins")),     # lengths [R]
            P("bins", None),          # onehot [4*B4, n_runs]
            P(),                      # run_users [n_runs] replicated
            P(), P(), P(),            # seed_hi, seed_lo, block_length
        ),
        out_specs=P("reads", None),
        check_vma=False,
    )
    def step(fp_local, packed_local, len_local, onehot_local, run_users,
             seed_hi, seed_lo, block_length):
        hi, lo, valid, n_unique, n_emit = _extract_hashes(
            packed_local, len_local, k, s, t, hcap, interpret,
            scheme_kind, window, scale_thresh)
        # re-collect the reads row of this bins group (tiled: concat)
        gather = lambda x: jax.lax.all_gather(  # noqa: E731
            x, "bins", axis=0, tiled=True)
        hi, lo, valid = gather(hi), gather(lo), gather(valid)
        n_unique, n_emit = gather(n_unique), gather(n_emit)
        R = hi.shape[0]
        pos, f4 = probe_positions_and_fprint4(hi, lo, seed_hi, seed_lo,
                                              block_length)
        S1 = fp_local.shape[0]
        pos = jnp.where(valid[..., None], pos, jnp.int32(S1 - 1))
        f4 = jnp.where(valid, f4, jnp.uint32(0x01010101))
        f4i = jax.lax.bitcast_convert_type(f4, jnp.int32)
        bt4 = choose_bin_tile4(S1, fp_local.shape[1])
        counts = _probe_call_chunked(fp_local, pos, f4i, valid, bt4,
                                     interpret)
        part = jnp.dot(
            counts.astype(jnp.float32), onehot_local,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        sums = jax.lax.psum(part, "bins").astype(jnp.int32)
        vs = jnp.where((run_users >= 0)[None, :], sums, jnp.int32(-1))
        kk = min(topk, vs.shape[1])
        vals, idx = jax.lax.top_k(vs, kk)
        users = run_users[idx]
        users = jnp.where(vals >= 0, users, jnp.int32(-1))
        if kk < topk:
            padc = ((0, 0), (0, topk - kk))
            vals = jnp.pad(vals, padc, constant_values=-1)
            users = jnp.pad(users, padc, constant_values=-1)
        return jnp.concatenate(
            [vals, users, n_unique[:, None], n_emit[:, None]], axis=1)

    return jax.jit(step)


def sharded_hixf_e2e_fn(mesh: Mesh, groups_meta, k: int, s: int,
                        t: int, hcap: int, topk: int,
                        interpret: bool = False,
                        scheme_kind: str = "syncmer", window: int = 0,
                        scale_thresh: int = 0,
                        descend_all: bool = False,
                        engines=None):
    """HIERARCHICAL fused search over the (reads x bins) mesh with
    LEVEL-GROUPED probing — the multi-chip configuration for multi-level
    indexes too large for one chip's HBM (GTDB-scale, SURVEY.md §7
    "shard within levels").

    Sharding every level's bins evenly over the 'bins' axis is the
    slot-count-balanced layout: each chip holds 1/nb of every level's
    fingerprint volume.  IXFs sharing (depth, seed, block_length) probe
    as one kernel call per chip (see e2e.make_hixf_e2e_grouped_fn); the
    per-group partial run sums contract over 'bins' with one psum,
    descent masks derive from the (replicated) merged-run sums —
    bit-identical to the single-device grouped unroll.

    groups_meta: ordered list (ancestors before descendants) of member
    lists [(bfs_pos, run_off, n_runs, children [(local_run, child_pos)],
    leaf_sel np.int32 of group-run indices)].

    Returns a jitted fn(fps, onehots, packed_reads, lengths, thr_table,
    leaf_users, seeds_hi, seeds_lo, bls) -> packed int32 [R, 2*topk+2]
    (fused_e2e_step layout).  fps/onehots are per-GROUP tuples of
    bins-sharded arrays; seeds/bls are [n_groups] replicated vectors.

    descend_all: the length-dependent-threshold mode (fracminhash) —
    probe every level unconditionally and return
    [R, 3*topk+2] = [chain-min | leaf sums | users | n_unique | n_emit];
    see e2e.make_hixf_e2e_grouped_fn for the emission equivalence.

    engines: optional per-group list; 'xla' routes that group's probe
    through the count_xla row gather on each chip's bins shard (VMEM-
    exceeding at-scale roots — the mixed-engine traversal, sharded),
    everything else through the Pallas kernel.  Default all-Pallas.
    """
    from ..utils.u64jnp import probe_positions_and_fprint4
    from .pallas_probe import _probe_call_chunked, choose_bin_tile4
    from .probe import count_xla

    n_groups = len(groups_meta)
    leaf_sels = [
        [jnp.asarray(m[4]) for m in members] for members in groups_meta
    ]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            tuple(P(None, "bins") for _ in range(n_groups)),  # fps
            tuple(P("bins", None) for _ in range(n_groups)),  # onehots
            P(("reads", "bins"), None),  # packed reads [R, L/4]
            P(("reads", "bins")),        # lengths [R]
            P(),                         # thr_table (replicated)
            P(),                         # leaf_users (replicated)
            P(), P(), P(),               # seeds_hi/seeds_lo/bls [n_groups]
        ),
        out_specs=P("reads", None),
        check_vma=False,
    )
    def step(fps, onehots, packed_local, len_local, thr_table,
             leaf_users, seeds_hi, seeds_lo, bls):
        hi, lo, valid, n_unique, n_emit = _extract_hashes(
            packed_local, len_local, k, s, t, hcap, interpret,
            scheme_kind, window, scale_thresh)
        gather = lambda x: jax.lax.all_gather(  # noqa: E731
            x, "bins", axis=0, tiled=True)
        hi, lo, valid = gather(hi), gather(lo), gather(valid)
        n_unique, n_emit = gather(n_unique), gather(n_emit)
        R = hi.shape[0]
        thr = thr_table[jnp.clip(n_unique, 0, thr_table.shape[0] - 1)]
        ones = jnp.ones((R,), dtype=bool)
        active = {0: ones}
        chain = {0: jnp.full((R,), jnp.int32(2**30))}
        leaf_vals = []
        leaf_sums = []
        for gi, members in enumerate(groups_meta):
            fp_local = fps[gi]
            if descend_all:
                acts = [ones] * len(members)
                act_any = ones
            else:
                acts = [active[m[0]] for m in members]
                act_any = acts[0]
                for a in acts[1:]:
                    act_any = act_any | a
            pos, f4 = probe_positions_and_fprint4(
                hi, lo, seeds_hi[gi], seeds_lo[gi], bls[gi])
            S1 = fp_local.shape[0]
            pos = jnp.where(valid[..., None], pos, jnp.int32(S1 - 1))
            f4 = jnp.where(valid, f4, jnp.uint32(0x01010101))
            f4i = jax.lax.bitcast_convert_type(f4, jnp.int32)
            if engines is not None and engines[gi] == "xla":
                # VMEM-exceeding table: probe this chip's bins shard
                # with the XLA row gather (mirrors e2e.py's engine
                # branch; positions/fingerprints identical, so the
                # psum'd run sums stay bit-identical to single-device).
                # Tables arrive as native uint8 (device-side bitcasts
                # materialize widened copies on TPU)
                fp8 = (fp_local if fp_local.dtype == jnp.uint8 else
                       jax.lax.bitcast_convert_type(
                           fp_local, jnp.uint8).reshape(S1, -1))
                fpr8 = (f4i & 0xFF).astype(jnp.uint8)
                bins_ = fp8.shape[1]
                hc = max(8, min(128, (128 << 20)
                                // max(1, R * 3 * bins_)))
                counts = count_xla(fp8, pos, fpr8,
                                   valid & act_any[:, None],
                                   hash_chunk=hc)
            else:
                bt4 = choose_bin_tile4(S1, fp_local.shape[1])
                counts = _probe_call_chunked(
                    fp_local, pos, f4i, valid & act_any[:, None], bt4,
                    interpret)
            part = jnp.dot(
                counts.astype(jnp.float32), onehots[gi],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            sums = jax.lax.psum(part, "bins").astype(jnp.int32)
            for (bfs_pos, run_off, _n_runs, children, _ls), act, sel in \
                    zip(members, acts, leaf_sels[gi]):
                if descend_all:
                    ch = chain[bfs_pos]
                    for local_run, child_pos in children:
                        chain[child_pos] = jnp.minimum(
                            ch, sums[:, run_off + local_run])
                    if sel.shape[0]:
                        ls = sums[:, sel]
                        leaf_sums.append(ls)
                        leaf_vals.append(jnp.minimum(ch[:, None], ls))
                    continue
                for local_run, child_pos in children:
                    active[child_pos] = act & (
                        sums[:, run_off + local_run] >= thr)
                if sel.shape[0]:
                    leaf_vals.append(
                        jnp.where(act[:, None], sums[:, sel],
                                  jnp.int32(-1)))
        allv = jnp.concatenate(leaf_vals, axis=1)
        kk = min(topk, allv.shape[1])
        vals, idx = jax.lax.top_k(allv, kk)
        users = leaf_users[idx]
        users = jnp.where(vals >= 0, users, jnp.int32(-1))
        padc = ((0, 0), (0, topk - kk))
        if descend_all:
            alls = jnp.concatenate(leaf_sums, axis=1)
            sums_k = jnp.take_along_axis(alls, idx, axis=1)
            if kk < topk:
                vals = jnp.pad(vals, padc, constant_values=-1)
                sums_k = jnp.pad(sums_k, padc, constant_values=-1)
                users = jnp.pad(users, padc, constant_values=-1)
            return jnp.concatenate(
                [vals, sums_k, users, n_unique[:, None],
                 n_emit[:, None]], axis=1)
        if kk < topk:
            vals = jnp.pad(vals, padc, constant_values=-1)
            users = jnp.pad(users, padc, constant_values=-1)
        return jnp.concatenate(
            [vals, users, n_unique[:, None], n_emit[:, None]], axis=1)

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
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)
        emitted = sums >= thresholds[:, None]
        return sums, emitted

    return step
