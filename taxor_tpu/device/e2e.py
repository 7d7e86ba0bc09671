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

from ..hash.device_syncmer import (dedup_kmers, emission_min_gap,
                                   minimizer_kmers, syncmer_kmers)
from ..utils.u64jnp import probe_positions_and_fprint4, wyhash64
from .pallas_extract import syncmer_hashes_fused
from .pallas_probe import _HASH_UNROLL, _probe_call_chunked

# Extraction engine for the syncmer scheme: the single-kernel Pallas
# extractor (pallas_extract) replaces the XLA scan + dedup pipeline
# (3-5x cheaper on the bench shapes); reads with emission-ambiguous
# tied window minima return the n_emit sentinel and fall back to the
# host oracle (~0.5% of random 2 kb reads).  Flip to False to A/B the
# scan-exact XLA path.
USE_FUSED_EXTRACT = True

# On-device tie rescue (VERDICT r3 item 6): reads whose window minima
# tie at the emission offset are history-dependent and the fused kernel
# flags them with the n_emit sentinel.  Instead of detouring every such
# read to the HOST oracle forever (~0.5-2% of reads, homopolymer-
# driven), gather up to R/_TIE_RESCUE_DIV flagged reads into a small
# static sub-batch and rerun the EXACT stateful tracker (the XLA scan
# path) on device.  Flagged reads beyond the bucket — or whose exact
# emission count overflows hcap — still fall back to the host.  The
# bucket costs ~R/DIV / R of the scan path per pass (~0.5 ms at
# R=8192, DIV=64) and covers a 1.6% tie rate outright.
TIE_RESCUE = True
_TIE_RESCUE_DIV = 64


def _syncmer_hashes(packed_reads, lengths, k, s, t, hcap, interpret):
    """(hi, lo, valid, n_unique, n_emit) wyhashed sorted-unique syncmer
    k-mers — fused Pallas kernel (+ exact-tracker tie rescue) or the
    XLA scan path."""
    if not USE_FUSED_EXTRACT:
        k_hi, k_lo, emit = syncmer_kmers(packed_reads, lengths, k, s, t)
        khi_c, klo_c, valid, n_unique, n_emit = dedup_kmers(
            k_hi, k_lo, emit, hcap, emission_min_gap(k, s, t),
            sort_impl="fused_interpret" if interpret else "auto")
        hi, lo = wyhash64(khi_c, klo_c)
        return hi, lo, valid, n_unique, n_emit
    hi, lo, valid, n_unique, n_emit = syncmer_hashes_fused(
        packed_reads, lengths, k, s, t, hcap, interpret=interpret)
    R = packed_reads.shape[0]
    if TIE_RESCUE and R >= 16:
        from .pallas_extract import _TIE_SENTINEL

        TB = max(16, R // _TIE_RESCUE_DIV)
        flagged = n_emit == jnp.int32(_TIE_SENTINEL)
        # fill_value R is out of bounds: gathers clamp (junk rows that
        # are never used), scatters with mode="drop" discard them — so
        # duplicate-index write races cannot occur
        idx = jnp.nonzero(flagged, size=TB, fill_value=R)[0]
        sk_hi, sk_lo, semit = syncmer_kmers(
            packed_reads[idx], lengths[idx], k, s, t)
        shi_c, slo_c, sval, snu, sne = dedup_kmers(
            sk_hi, sk_lo, semit, hcap, emission_min_gap(k, s, t),
            sort_impl="fused_interpret" if interpret else "auto")
        shi, slo = wyhash64(shi_c, slo_c)
        hi = hi.at[idx].set(shi, mode="drop")
        lo = lo.at[idx].set(slo, mode="drop")
        valid = valid.at[idx].set(sval, mode="drop")
        n_unique = n_unique.at[idx].set(snu, mode="drop")
        n_emit = n_emit.at[idx].set(sne, mode="drop")
    return hi, lo, valid, n_unique, n_emit




def _scaling_keep(hi, lo, scale_thresh: int):
    """keep mask for FracMinHash scaling: wyhash64(h) <= T as a uint32
    pair compare (T = schemes.scaling_threshold_u64, the exact integer
    form of the reference's double comparison)."""
    vhi, vlo = wyhash64(hi, lo)
    thi = jnp.uint32(scale_thresh >> 32)
    tlo = jnp.uint32(scale_thresh & 0xFFFFFFFF)
    return (vhi < thi) | ((vhi == thi) & (vlo <= tlo))


def _emit_members(g, acts, sums, descend_all, active, chain, thr,
                  leaf_vals, leaf_sums):
    """Per-member descent bookkeeping shared by the stacked-scan and
    per-group probe paths: child activation (or chain-min propagation in
    descend-all mode) and leaf-run emission from the group's run sums."""
    for (bfs_pos, run_off, _n_runs, children, leaf_sel), act in zip(
            g["members"], acts):
        if descend_all:
            ch = chain[bfs_pos]
            for local_run, child_pos in children:
                chain[child_pos] = jnp.minimum(
                    ch, sums[:, run_off + local_run])
            if leaf_sel.shape[0]:
                ls = sums[:, leaf_sel]
                leaf_sums.append(ls)
                leaf_vals.append(jnp.minimum(ch[:, None], ls))
            continue
        for local_run, child_pos in children:
            active[child_pos] = act & (
                sums[:, run_off + local_run] >= thr)
        if leaf_sel.shape[0]:
            leaf_vals.append(
                jnp.where(act[:, None], sums[:, leaf_sel],
                          jnp.int32(-1)))


def make_hixf_e2e_grouped_fn(groups, leaf_users, k: int, s: int, t: int,
                             topk: int, interpret: bool = False,
                             scheme_kind: str = "syncmer",
                             window: int = 0,
                             scale_thresh: int = 0,
                             descend_all: bool = False):
    """Fused hierarchical search with LEVEL-GROUPED probing.

    IXFs sharing (seed, block_length) — which the builder's uniform level
    geometry guarantees per tree depth (hixf/build.py) — concatenate
    their fingerprint tables column-wise and probe as ONE kernel call:
    probe positions are a function of (hash, seed, block_length) only,
    so one [R, H] position set covers the whole group.  A 64-sibling
    level costs one launch + one position computation instead of 64.
    A read is probe-active for the group when active in ANY member; the
    per-member active masks still gate descent and leaf emission, so the
    result is bit-identical to per-IXF probing.

    groups: ordered list (ancestors strictly before descendants) of
      dicts with keys seed_hi/seed_lo/bl (NUMPY u32 scalars),
      bt4/p10/engine (static), members: list of
      (bfs_pos, run_off, n_runs, children [(local_run, child_bfs_pos)],
       leaf_sel NUMPY int32 array of GLOBAL run indices within the
       group's sums).
    leaf_users: NUMPY int32, user bin per concatenated leaf column in
      group/member order.  All of these small metadata arrays MUST be
      host numpy, not device arrays: a closure-captured device array is
      lowered into the HLO as an MLIR constant through a blocking
      device->host sync (~2 s per array over the tunnel; ~199 of them
      made the 193-IXF at-scale graph take 200-300 s to lower in round
      4), while numpy constants embed with no device traffic.

    The per-group fingerprint tables and one-hots are ARGUMENTS of the
    returned fn (tuples `fps` / `onehots`), NOT closure captures: a
    captured 1 GB at-scale table would be lowered into the HLO as a
    CONSTANT (observed: 2 GB of captured constants hung the compile).

    descend_all: length-dependent threshold models (fracminhash,
      taxor_search.cpp:263 + fracminhash_model.cpp:23-33) cannot use the
      count-indexed descent table.  But the reference's descent and
      emission thresholds are the SAME per-read value tau, so
      ``emit(leaf) <=> min(leaf_sum, ancestor merged sums) >= tau``.
      With descend_all the kernel probes every level unconditionally,
      carries that chain-min per leaf, and returns packed
      [R, 3*topk + 2]: [minv_k desc | their leaf sums | user bins |
      n_unique | n_emit].  The host applies the exact float64 tau to
      minv and reports the leaf sums — bit-identical emissions with no
      device float math (thr_table is ignored in this mode).
    """
    from .pallas_probe import _probe_call_chunked

    @functools.partial(jax.jit, static_argnames=("hcap",))
    def run(packed_reads, lengths, thr_table, fps, onehots, hcap: int):
        R = packed_reads.shape[0]
        if scheme_kind == "syncmer":
            hi, lo, valid, n_unique, n_emit = _syncmer_hashes(
                packed_reads, lengths, k, s, t, hcap, interpret)
        else:  # minimizer / plain k-mer: values probe directly, no
            # wyhash, duplicates kept (vector semantics)
            hi, lo, valid, n_emit = minimizer_kmers(
                packed_reads, lengths, k, window)
            n_unique = n_emit
        if scale_thresh:  # FracMinHash downsampling (exact integer form)
            valid = valid & _scaling_keep(hi, lo, scale_thresh)
            n_unique = valid.sum(axis=1, dtype=jnp.int32)
        thr = thr_table[jnp.clip(n_unique, 0, thr_table.shape[0] - 1)]
        ones = jnp.ones((R,), dtype=bool)
        active = {0: ones}
        chain = {0: jnp.full((R,), jnp.int32(2**30))}  # ancestor min
        leaf_vals = []
        leaf_sums = []
        poscache: dict = {}  # (seed, bl) -> raw (pos, f4i): subgroups of
        # one level share the position set (trace-time reuse)
        for gi, g in enumerate(groups):
            g_fp = fps[gi]
            if descend_all:
                acts = [ones] * len(g["members"])
                act_any = ones
            else:
                acts = [active[m[0]] for m in g["members"]]
                act_any = acts[0]
                for a in acts[1:]:
                    act_any = act_any | a
            cached = poscache.get(g.get("poskey"))
            if cached is None:
                pos_raw, f4 = probe_positions_and_fprint4(
                    hi, lo, g["seed_hi"], g["seed_lo"], g["bl"])
                f4 = jnp.where(valid, f4, jnp.uint32(0x01010101))
                f4i = jax.lax.bitcast_convert_type(f4, jnp.int32)
                cached = (pos_raw, f4i)
                if g.get("poskey") is not None:
                    poscache[g["poskey"]] = cached
            pos_raw, f4i = cached
            if g.get("stacked"):
                # same-geometry subgroups (a split level) probe as ONE
                # lax.scan over the stacked [G, S1, B4] tables: one
                # compiled kernel per level geometry, not per subgroup.
                # Each scan step keeps its own subgroup's member-OR
                # activity mask, so results are bit-identical to the
                # unstacked per-group calls.
                G = g["stacked"]
                runs_max = g["runs_max"]
                if descend_all:
                    act_mat = jnp.ones((G, R), dtype=bool)
                else:
                    subacts = []
                    for mposs in g["sub_members"]:
                        a = active[mposs[0]]
                        for p in mposs[1:]:
                            a = a | active[p]
                        subacts.append(a)
                    act_mat = jnp.stack(subacts, axis=0)  # [G, R]
                S1 = g_fp.shape[1]
                if g.get("p10"):
                    from .pallas_probe import _probe_call_chunked_p10

                    def body(carry, xs, bl=g["bl"], bt4=g["bt4"]):
                        fp_g, oh_g, act_g = xs
                        counts = _probe_call_chunked_p10(
                            fp_g, pos_raw, f4i,
                            valid & act_g[:, None], bl, bt4, interpret)
                        s = jnp.dot(
                            counts.astype(jnp.float32), oh_g,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        ).astype(jnp.int32)
                        return carry, s
                else:
                    pos = jnp.where(valid[..., None], pos_raw,
                                    jnp.int32(S1 - 1))

                    def body(carry, xs, bt4=g["bt4"]):
                        fp_g, oh_g, act_g = xs
                        counts = _probe_call_chunked(
                            fp_g, pos, f4i, valid & act_g[:, None],
                            bt4, interpret)
                        s = jnp.dot(
                            counts.astype(jnp.float32), oh_g,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        ).astype(jnp.int32)
                        return carry, s
                _, sums_stack = jax.lax.scan(
                    body, 0, (g_fp, onehots[gi], act_mat))
                # [G, R, runs_max] -> [R, G*runs_max]: member run
                # offsets were re-based to g*runs_max at stacking time
                sums = sums_stack.transpose(1, 0, 2).reshape(
                    R, G * runs_max)
                _emit_members(g, acts, sums, descend_all, active, chain,
                              thr, leaf_vals, leaf_sums)
                continue
            S1 = g_fp.shape[0]
            if g.get("engine", "pallas") == "xla":
                # VMEM-exceeding tables (at-scale roots whose merged
                # bins hold the whole database union): probe as an XLA
                # row gather over the HBM-resident table (~36 ns/row
                # measured, vs impossible for the VMEM kernel).  The
                # packed int32 words view back to the uint8 bin layout
                # byte-exactly (bin 4w+j = byte j of word w).
                from .probe import count_xla

                # xla-engine tables arrive as native uint8 from the
                # host (a device-side bitcast materializes a widened
                # 4-bytes-per-byte copy on TPU — 19.3 GB for a 2.25 GB
                # at-scale root); the bitcast fallback remains only for
                # legacy packed callers
                fp8 = (g_fp if g_fp.dtype == jnp.uint8 else
                       jax.lax.bitcast_convert_type(
                           g_fp, jnp.uint8).reshape(S1, -1))
                fpr8 = (f4i & 0xFF).astype(jnp.uint8)
                # bound the gathered [R, chunk, 3, bins] intermediate to
                # ~128 MB — at-scale roots have thousands of padded bins
                # and the default 128-hash chunk exhausted HBM
                R_ = pos_raw.shape[0]
                bins_ = fp8.shape[1]
                hc = max(8, min(128, (128 << 20) // max(1, R_ * 3
                                                        * bins_)))
                counts = count_xla(fp8, pos_raw, fpr8,
                                   valid & act_any[:, None],
                                   hash_chunk=hc)
            elif g.get("p10"):
                from .pallas_probe import _probe_call_chunked_p10

                counts = _probe_call_chunked_p10(
                    g_fp, pos_raw, f4i, valid & act_any[:, None],
                    g["bl"], g["bt4"], interpret)
            else:
                pos = jnp.where(valid[..., None], pos_raw,
                                jnp.int32(S1 - 1))
                counts = _probe_call_chunked(
                    g_fp, pos, f4i, valid & act_any[:, None],
                    g["bt4"], interpret)
            sums = jnp.dot(
                counts.astype(jnp.float32), onehots[gi],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(jnp.int32)
            _emit_members(g, acts, sums, descend_all, active, chain,
                          thr, leaf_vals, leaf_sums)
        allv = jnp.concatenate(leaf_vals, axis=1)
        kk = min(topk, allv.shape[1])
        vals, idx = jax.lax.top_k(allv, kk)
        users = jnp.asarray(leaf_users)[idx]
        users = jnp.where(vals >= 0, users, jnp.int32(-1))
        pad = ((0, 0), (0, topk - kk))
        if descend_all:
            alls = jnp.concatenate(leaf_sums, axis=1)
            sums_k = jnp.take_along_axis(alls, idx, axis=1)
            if kk < topk:
                vals = jnp.pad(vals, pad, constant_values=-1)
                sums_k = jnp.pad(sums_k, pad, constant_values=-1)
                users = jnp.pad(users, pad, constant_values=-1)
            return jnp.concatenate(
                [vals, sums_k, users, n_unique[:, None],
                 n_emit[:, None]], axis=1)
        if kk < topk:
            vals = jnp.pad(vals, pad, constant_values=-1)
            users = jnp.pad(users, pad, constant_values=-1)
        return jnp.concatenate(
            [vals, users, n_unique[:, None], n_emit[:, None]], axis=1)

    return run


@functools.partial(
    jax.jit,
    static_argnames=("k", "s", "t", "hcap", "topk", "bin_tile4",
                     "interpret", "scheme_kind", "window",
                     "scale_thresh", "use_p10", "prefix_runs"),
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
    scheme_kind: str = "syncmer",
    window: int = 0,
    scale_thresh: int = 0,
    use_p10: bool = False,
    prefix_runs: int = 0,
):
    """Returns packed int32 [R, 2*topk + 2]:
    [:, :topk] descending raw run sums, [:, topk:2*topk] their user bins
    (-1 for merged/padding), [:, -2] the per-read hash count (unique for
    syncmers, emitted-vector size for minimizers/k-mers), [:, -1] the
    pre-dedup emission count (> hcap => host fallback; the minimizer
    path never truncates — its hash width IS the read length)."""
    R = raw_reads.shape[0]
    if scheme_kind == "syncmer":
        assert hcap % _HASH_UNROLL == 0
        hi, lo, valid, n_unique, n_emit = _syncmer_hashes(
            raw_reads, lengths, k, s, t, hcap, interpret)
    else:
        hi, lo, valid, n_emit = minimizer_kmers(raw_reads, lengths, k,
                                                window)
        n_unique = n_emit
    if scale_thresh:  # FracMinHash downsampling (exact integer form)
        valid = valid & _scaling_keep(hi, lo, scale_thresh)
        n_unique = valid.sum(axis=1, dtype=jnp.int32)
    pos, f4 = probe_positions_and_fprint4(hi, lo, seed_hi, seed_lo,
                                          block_length)
    S1 = fp_packed.shape[0]
    f4 = jnp.where(valid, f4, jnp.uint32(0x01010101))
    f4i = jax.lax.bitcast_convert_type(f4, jnp.int32)
    if use_p10:  # block-padded table + the p10x2 kernel (pallas_probe)
        from .pallas_probe import _probe_call_chunked_p10

        counts = _probe_call_chunked_p10(fp_packed, pos, f4i, valid,
                                         block_length, bin_tile4,
                                         interpret)
    else:
        pos = jnp.where(valid[..., None], pos, jnp.int32(S1 - 1))
        counts = _probe_call_chunked(fp_packed, pos, f4i, valid,
                                     bin_tile4, interpret)
    # HIGHEST precision is REQUIRED for exactness: the TPU MXU's default
    # f32 matmul truncates operands to bf16 (8 mantissa bits), silently
    # rounding any per-bin count > 256 — plain-k-mer reads carry ~1000
    # counts and came back off-by-one (caught by the bench parity gate).
    # 3-pass bf16 reconstructs exact f32, and one-hot sums of ints
    # < 2^24 are exact in f32.  prefix_runs (static): unit runs at
    # identity positions — the matmul IS a column slice (trivially
    # exact, and ~7 ms cheaper at 4096 bins).
    if prefix_runs:
        sums = counts[:, :prefix_runs]
    else:
        sums = jnp.dot(
            counts.astype(jnp.float32), onehot,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
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
    return jnp.concatenate(
        [vals, users, n_unique[:, None], n_emit[:, None]], axis=1)
