"""Level-synchronous HIXF traversal on device.

The reference recurses per read through the IXF tree
(bulk_contains_impl, hierarchical_interleaved_xor_filter.hpp:304-340).
TPU-native formulation: evaluate the tree breadth-first; for each IXF run
ONE batched probe kernel over all reads, masked by a per-read "active"
vector derived from the parent merged-bin sums.  Per-bin counts are
segment-summed into user-bin runs with an int matmul (MXU-friendly
one-hot), descent decisions and final per-user-bin assembly are cheap
[R, runs] reductions.

The probe positions/fingerprints depend on each IXF's (seed, block_length),
so they are precomputed per IXF from the uint64 hash values — host numpy
for now (32-bit device variant is a later optimization).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..hixf.container import HIXF
from ..ixf.xor_filter import compute_probes
from .probe import count_xla, pad_fingerprints


@dataclass
class _DeviceIXF:
    """Per-IXF device state.  Fingerprint packing and the device upload
    are LAZY (first touch of .fp/.run_onehot): the fused grouped path
    re-packs its own concatenated tables from the host arrays, so eager
    per-IXF uploads were ~200 pure-overhead transfers at at-scale tree
    widths (each device round-trip costs ~0.1-2 s through the tunnel —
    they dominated DeviceHIXF construction, not the packing math)."""

    pack_fp: object  # () -> numpy packed table (engine-specific layout)
    seed: int
    block_length: int
    bins: int
    onehot_host: np.ndarray  # float32 [bins_padded, n_runs]
    run_users: np.ndarray  # int64 [n_runs], -1 for merged runs
    run_children: np.ndarray  # int64 [n_runs], child ixf id for merged runs
    engine: str = "xla"  # 'xla' | 'pallas'
    # block-padded p10x2 table (pallas_probe.prepare_fingerprints_p10)
    p10: bool = False
    # n_runs when every run is one technical bin at its own index
    # (flat indexes): the segmentation matmul is then a column slice
    prefix_runs: int = 0
    # geometry scalars for the fused device step (numpy: device scalars
    # would lower as MLIR constants via a blocking device->host sync)
    seed_hi: np.uint32 | None = None
    seed_lo: np.uint32 | None = None
    bl_u32: np.uint32 | None = None
    mesh: object | None = None
    fp_shape: tuple | None = None  # packed shape, known without packing
    _fp_dev: object | None = None
    _onehot_dev: object | None = None

    @property
    def fp(self):
        if self._fp_dev is None:
            fp = self.pack_fp()
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                self._fp_dev = jax.device_put(
                    fp, NamedSharding(self.mesh, P(None, "bins")))
            else:
                self._fp_dev = jnp.asarray(fp)
        return self._fp_dev

    @property
    def run_onehot(self):
        if self._onehot_dev is None:
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                self._onehot_dev = jax.device_put(
                    self.onehot_host,
                    NamedSharding(self.mesh, P("bins", None)))
            else:
                self._onehot_dev = jnp.asarray(self.onehot_host)
        return self._onehot_dev


def _scale_thresh(scheme) -> int:
    """Static FracMinHash keep-threshold for the device filter; 0 means
    no downsampling (see schemes.scaling_threshold_u64)."""
    if scheme.scaling <= 1:
        return 0
    from ..hash.schemes import scaling_threshold_u64

    return scaling_threshold_u64(scheme.scaling)


def _default_engine() -> str:
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


# threshold models that depend on the hash count only — these descend
# with the exact count-indexed device table.  Everything else
# (fracminhash: count AND read length, taxor_search.cpp:263) uses the
# descend-all chain-min mode (e2e.make_hixf_e2e_grouped_fn docstring).
COUNT_ONLY_KINDS = ("percentage", "syncmer_model", "kmer_model")


def _descend_all(thresholder) -> bool:
    return thresholder is not None and \
        thresholder.kind not in COUNT_ONLY_KINDS


class DeviceHIXF:
    """Device-resident HIXF with BFS traversal metadata.

    engine 'pallas' runs the probe as the Pallas VMEM kernel (TPU); 'xla'
    uses the gather formulation (CPU tests and oversized filters).
    """

    def __init__(self, hixf: HIXF, engine: str | None = None, mesh=None):
        """mesh: optional jax.sharding.Mesh with axes ('reads', 'bins').
        When given, fingerprint matrices are placed bin-sharded and read
        batches reads-sharded; the jitted count+segment step runs SPMD
        with XLA inserting the collectives (the bins contraction in the
        run-sum matmul becomes an ICI reduce).  GSPMD requires the XLA
        engine for now (the Pallas kernel runs per-chip under shard_map in
        a later iteration)."""
        from .pallas_probe import (USE_P10X2, _WIDE_MIN_B4,
                                   choose_bin_tile4, p10_eligible,
                                   prepare_fingerprints,
                                   prepare_fingerprints_p10)

        self.mesh = mesh
        if mesh is not None:
            engine = "xla"
        else:
            engine = engine or _default_engine()
        self.hixf = hixf
        self.num_user_bins = hixf.num_user_bins
        self.dfs_rank = hixf.user_bin_dfs_order()
        self.ixfs: list[_DeviceIXF] = []
        from .pallas_probe import _LANE, _P10_BLPAD
        from .probe import LANE as _XLA_LANE

        for i, ixf in enumerate(hixf.ixfs):
            starts, ends, users = hixf.runs_of_ixf(i)
            ixf_engine = engine
            ixf_p10 = False
            S, B = ixf.fingerprints.shape
            b4 = -(-B // (4 * _LANE)) * _LANE  # packed int32 words
            if ixf_engine == "pallas":
                # narrow tables with small blocks take the p10x2 kernel
                # (see pallas_probe); wide tables keep the rotate-free
                # wide kernel.  Shapes are known without packing — the
                # tables themselves pack lazily on first .fp touch.
                if (USE_P10X2 and mesh is None
                        and p10_eligible(ixf.block_length)
                        and b4 < _WIDE_MIN_B4):
                    ixf_p10 = True
                pshape = ((3 * _P10_BLPAD, b4) if ixf_p10
                          else (S + 1, b4))
                if choose_bin_tile4(*pshape) is None:
                    ixf_engine = "xla"  # exceeds VMEM; gather fallback
                    # the p10 flag describes a block-relative PACKED
                    # layout; the xla path repacks via pad_fingerprints
                    # (absolute layout), so the flag must not survive
                    ixf_p10 = False
                else:
                    bins_padded = b4 * 4
            if ixf_engine == "xla":
                bins_padded = -(-B // _XLA_LANE) * _XLA_LANE
                pshape = (S, bins_padded)

            def make_pack(ixf=ixf, eng=ixf_engine, p10=ixf_p10):
                if eng == "pallas":
                    if p10:
                        return prepare_fingerprints_p10(
                            ixf.fingerprints, ixf.block_length)
                    return prepare_fingerprints(ixf.fingerprints)
                return pad_fingerprints(ixf.fingerprints)

            n_runs = starts.shape[0]
            prefix_runs = (
                n_runs if (np.array_equal(starts, np.arange(n_runs))
                           and np.array_equal(ends, starts + 1)) else 0)
            onehot = np.zeros((bins_padded, n_runs), dtype=np.float32)
            for r, (s, e) in enumerate(zip(starts, ends)):
                onehot[s:e, r] = 1.0
            children = np.array(
                [
                    int(hixf.next_ixf_id[i][int(s)]) if u < 0 else -1
                    for s, u in zip(starts, users)
                ],
                dtype=np.int64,
            )
            self.ixfs.append(
                _DeviceIXF(
                    pack_fp=make_pack,
                    seed=ixf.seed,
                    block_length=ixf.block_length,
                    bins=ixf.bin_count,
                    onehot_host=onehot,
                    run_users=users,
                    run_children=children,
                    engine=ixf_engine,
                    p10=ixf_p10,
                    prefix_runs=prefix_runs,
                    seed_hi=np.uint32(ixf.seed >> 32),
                    seed_lo=np.uint32(ixf.seed & 0xFFFFFFFF),
                    bl_u32=np.uint32(ixf.block_length),
                    mesh=mesh,
                    fp_shape=pshape,
                )
            )
        # BFS order from root (index 0); children discovered via run_children
        order: list[int] = [0]
        seen = {0}
        q = [0]
        while q:
            cur = q.pop(0)
            for child in self.ixfs[cur].run_children:
                c = int(child)
                if c >= 0 and c not in seen:
                    seen.add(c)
                    order.append(c)
                    q.append(c)
        self.bfs_order = order
        # parent link: (parent_ixf, run_index_in_parent) per ixf
        self.parent: dict[int, tuple[int, int]] = {}
        for i in order:
            for r, c in enumerate(self.ixfs[i].run_children):
                if int(c) >= 0:
                    self.parent[int(c)] = (i, r)

    def _all_active(self, n: int):
        """Cached all-ones active mask (saves one upload per batch)."""
        cache = getattr(self, "_active_cache", None)
        if cache is None:
            cache = self._active_cache = {}
        if n not in cache:
            cache[n] = jnp.asarray(np.ones(n, dtype=bool))
        return cache[n]

    @property
    def flat_fast_path(self) -> bool:
        """True when the compact top-k dispatch applies: one IXF, Pallas
        engine, no mesh."""
        return (len(self.ixfs) == 1 and self.ixfs[0].engine == "pallas"
                and self.mesh is None)

    def topk_async(self, hashes, mask, thresholds, k: int = 16):
        """Compact dispatch for flat single-IXF indexes: device-side
        threshold + top-k bin compaction (finalize_topk) so only
        [R, 2k] int32 returns over the (latency-bound) device link.

        Returns a zero-arg collector yielding (vals, users) int32
        [R, k] arrays, or None when this index needs the dense path
        (hierarchy, mesh, or XLA engine).
        """
        if not self.flat_fast_path:
            return None
        from .pallas_probe import _HASH_UNROLL, _READ_TILE, pack_batch

        R = hashes.shape[0]
        rpad = (-R) % _READ_TILE
        hpad = (-hashes.shape[1]) % _HASH_UNROLL
        if rpad or hpad:
            hashes = np.pad(hashes, ((0, rpad), (0, hpad)))
            mask = np.pad(mask, ((0, rpad), (0, hpad)))
        return self.topk_async_packed(pack_batch(hashes, mask), R,
                                      thresholds, k)

    def topk_async_packed(self, batch: np.ndarray, n_reads: int,
                          thresholds, k: int = 16):
        """Like topk_async but takes the already-packed
        [Rpad, 3*Hpad] uint32 batch (pack_batch / pack_hash_lists) —
        avoids every [R, H] uint64 intermediate on the host."""
        from .pallas_probe import (
            choose_bin_tile4,
            finalize_topk,
            fused_probe_step,
        )

        dixf = self.ixfs[0]
        run_users_dev = getattr(dixf, "_run_users_dev", None)
        if run_users_dev is None:
            run_users_dev = jnp.asarray(dixf.run_users.astype(np.int32))
            dixf._run_users_dev = run_users_dev
        Rp = batch.shape[0]
        thr = np.zeros(Rp, dtype=np.int32)
        thr[: len(thresholds)] = np.asarray(thresholds, dtype=np.int32)
        sums_dev = fused_probe_step(
            dixf.fp,
            jnp.asarray(batch),
            self._all_active(Rp),
            dixf.run_onehot,
            dixf.seed_hi,
            dixf.seed_lo,
            dixf.bl_u32,
            bin_tile4=choose_bin_tile4(*dixf.fp_shape),
            use_p10=dixf.p10,
            prefix_runs=dixf.prefix_runs,
        )
        packed_dev = finalize_topk(sums_dev, jnp.asarray(thr),
                                   run_users_dev, k)
        try:  # overlap the device->host copy with later dispatches
            packed_dev.copy_to_host_async()
        except Exception:
            pass

        def collect():
            packed = np.asarray(packed_dev)[:n_reads]
            return packed[:, :k], packed[:, k:]

        return collect

    def e2e_capable(self, thresholder=None) -> bool:
        """Whether the fused reads->top-k dispatch covers this index:
        flat always qualifies (thresholds applied on host); hierarchical
        needs every IXF on the Pallas engine plus a thresholder —
        count-only models (percentage / syncmer / kmer) descend with the
        exact per-count device table, length-dependent models
        (fracminhash) use the descend-all chain-min mode.  With a mesh,
        the fused steps run bin-sharded under shard_map
        (sharding.sharded_e2e_fn / sharded_hixf_e2e_fn)."""
        if self.mesh is not None:
            import jax

            if not (jax.default_backend() == "tpu"
                    or getattr(self, "_interpret", False)):
                return False
            if len(self.ixfs) == 1:
                return True
            return thresholder is not None
        import jax as _jax

        pallas_ok = (_jax.default_backend() == "tpu"
                     or getattr(self, "_interpret", False))
        if len(self.ixfs) == 1:
            return self.ixfs[0].engine == "pallas"
        if not all(d.engine == "pallas" for d in self.ixfs) \
                and not pallas_ok:
            # mixed pallas/xla groups (VMEM-exceeding at-scale roots go
            # through the XLA row gather) need a backend where the
            # pallas members can run
            return False
        return thresholder is not None

    def _sharded_e2e_async(self, raw_reads, lengths, scheme, k: int,
                           thresholder=None):
        """Fused search over the (reads x bins) mesh: extraction
        data-parallel over all chips, probe bin-sharded, run sums psum'd
        (sharding.sharded_e2e_fn).  Hierarchical trees go through
        _sharded_hixf_e2e_async.  Same collector contract as e2e_async."""
        if len(self.hixf.ixfs) > 1:
            return self._sharded_hixf_e2e_async(raw_reads, lengths,
                                                scheme, k, thresholder)
        from ..hash.device_syncmer import hash_cap
        from .pallas_probe import _LANE, _READ_TILE, prepare_fingerprints
        from .sharding import sharded_e2e_fn

        mesh = self.mesh
        nr, nb = mesh.shape["reads"], mesh.shape["bins"]
        state = getattr(self, "_sharded_e2e_state", None)
        if state is None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            ixf = self.hixf.ixfs[0]
            fp = prepare_fingerprints(ixf.fingerprints)  # [S1, B4]
            B4 = -(-fp.shape[1] // (_LANE * nb)) * (_LANE * nb)
            fp = np.pad(fp, ((0, 0), (0, B4 - fp.shape[1])))
            starts, ends, users = self.hixf.runs_of_ixf(0)
            onehot = np.zeros((4 * B4, starts.shape[0]), dtype=np.float32)
            for i, (a, b) in enumerate(zip(starts, ends)):
                onehot[a:b, i] = 1.0
            state = self._sharded_e2e_state = dict(
                fp=jax.device_put(
                    fp, NamedSharding(mesh, P(None, "bins"))),
                onehot=jax.device_put(
                    onehot, NamedSharding(mesh, P("bins", None))),
                run_users=jnp.asarray(users.astype(np.int32)),
                seed_hi=jnp.uint32(ixf.seed >> 32),
                seed_lo=jnp.uint32(ixf.seed & 0xFFFFFFFF),
                bl=jnp.uint32(ixf.block_length),
                fns={},
            )
        R0 = raw_reads.shape[0]
        rpad = (-R0) % (nr * nb * _READ_TILE)
        if rpad:
            raw_reads = np.pad(raw_reads, ((0, rpad), (0, 0)))
            lengths = np.pad(lengths, (0, rpad))
        L = raw_reads.shape[1] * 4
        hcap = hash_cap(L) if scheme.use_syncmer else L
        fkey = (scheme.kmer_size, scheme.syncmer_size, scheme.t_syncmer,
                scheme.use_syncmer, scheme.window_size, scheme.scaling,
                hcap, k)
        fn = state["fns"].get(fkey)
        if fn is None:
            fn = state["fns"][fkey] = sharded_e2e_fn(
                mesh, k=scheme.kmer_size, s=scheme.syncmer_size,
                t=scheme.t_syncmer, hcap=hcap, topk=k,
                interpret=getattr(self, "_interpret", False),
                scheme_kind=("syncmer" if scheme.use_syncmer
                             else "minimizer"),
                window=scheme.window_size,
                scale_thresh=_scale_thresh(scheme))
        packed_dev = fn(
            state["fp"], jnp.asarray(raw_reads),
            jnp.asarray(lengths.astype(np.int32)), state["onehot"],
            state["run_users"], state["seed_hi"], state["seed_lo"],
            state["bl"])
        try:
            packed_dev.copy_to_host_async()
        except Exception:
            pass

        def collect():
            from .sharding import host_view

            packed = host_view(packed_dev)[:R0]
            return (packed[:, :k], packed[:, k : 2 * k],
                    packed[:, 2 * k], packed[:, 2 * k + 1], hcap)

        return collect

    def _tree_metadata(self):
        """BFS-ordered static tree structure shared by the fused
        hierarchical steps: (tree_children, leaf_runs, leaf_users)."""
        bfs_pos = {ixf_id: p for p, ixf_id in enumerate(self.bfs_order)}
        tree_children = []
        leaf_runs = []
        leaf_users_parts = []
        for i in self.bfs_order:
            d = self.ixfs[i]
            kids = []
            leaves = []
            for r, c in enumerate(d.run_children):
                if int(c) >= 0:
                    kids.append((r, bfs_pos[int(c)]))
                else:
                    leaves.append(r)
            tree_children.append(kids)
            leaf_runs.append(np.array(leaves, dtype=np.int32))
            leaf_users_parts.append(
                d.run_users[np.array(leaves, dtype=np.int64)]
                if leaves else np.zeros(0, dtype=np.int64)
            )
        leaf_users = np.concatenate(leaf_users_parts)
        return tree_children, leaf_runs, leaf_users

    def _sharded_hixf_e2e_async(self, raw_reads, lengths, scheme, k: int,
                                thresholder):
        """Hierarchical fused search over the mesh: every level's bins
        shard evenly over the 'bins' axis (slot-count-balanced — each
        chip holds 1/nb of every level's fingerprint volume), IXFs of a
        level probe as one grouped kernel call per chip, descent sums
        psum per level (sharding.sharded_hixf_e2e_fn)."""
        from ..hash.device_syncmer import hash_cap
        from .pallas_probe import _LANE, _READ_TILE
        from .sharding import sharded_hixf_e2e_fn
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.mesh
        nr, nb = mesh.shape["reads"], mesh.shape["bins"]
        state = getattr(self, "_sharded_hixf_state", None)
        if state is None:
            host_groups, leaf_users = self._build_probe_groups(
                col_multiple=_LANE * nb, xla_col_multiple=8 * nb)
            fps, onehots, groups_meta = [], [], []
            ng = len(host_groups)
            seeds_hi = np.zeros(ng, dtype=np.uint32)
            seeds_lo = np.zeros(ng, dtype=np.uint32)
            bls = np.zeros(ng, dtype=np.uint32)
            engines = []
            for gi, g in enumerate(host_groups):
                fps.append(jax.device_put(
                    g["fp"], NamedSharding(mesh, P(None, "bins"))))
                onehots.append(jax.device_put(
                    g["onehot"], NamedSharding(mesh, P("bins", None))))
                groups_meta.append(g["members"])
                engines.append(g.get("engine", "pallas"))
                seeds_hi[gi] = g["seed"] >> 32
                seeds_lo[gi] = g["seed"] & 0xFFFFFFFF
                bls[gi] = g["bl"]
            state = self._sharded_hixf_state = dict(
                fps=tuple(fps), onehots=tuple(onehots),
                groups_meta=groups_meta, engines=tuple(engines),
                leaf_users=jnp.asarray(leaf_users.astype(np.int32)),
                seeds_hi=jnp.asarray(seeds_hi),
                seeds_lo=jnp.asarray(seeds_lo),
                bls=jnp.asarray(bls), fns={}, thr_tables={},
            )
        R0 = raw_reads.shape[0]
        rpad = (-R0) % (nr * nb * _READ_TILE)
        if rpad:
            raw_reads = np.pad(raw_reads, ((0, rpad), (0, 0)))
            lengths = np.pad(lengths, (0, rpad))
        L = raw_reads.shape[1] * 4
        hcap = hash_cap(L) if scheme.use_syncmer else L
        da = _descend_all(thresholder)
        tkey = ("zeros", hcap) if da else (id(thresholder), hcap)
        thr_tbl = state["thr_tables"].get(tkey)
        if thr_tbl is None:
            thr_tbl = state["thr_tables"][tkey] = jnp.asarray(
                np.zeros(hcap + 1, dtype=np.int32) if da
                else self._thr_table(thresholder, hcap))
        fkey = (scheme.kmer_size, scheme.syncmer_size, scheme.t_syncmer,
                scheme.use_syncmer, scheme.window_size, scheme.scaling,
                hcap, k, da)
        fn = state["fns"].get(fkey)
        if fn is None:
            fn = state["fns"][fkey] = sharded_hixf_e2e_fn(
                mesh, state["groups_meta"], k=scheme.kmer_size,
                s=scheme.syncmer_size, t=scheme.t_syncmer, hcap=hcap,
                topk=k, interpret=getattr(self, "_interpret", False),
                scheme_kind=("syncmer" if scheme.use_syncmer
                             else "minimizer"),
                window=scheme.window_size,
                scale_thresh=_scale_thresh(scheme),
                descend_all=da,
                engines=state["engines"])
        packed_dev = fn(
            state["fps"], state["onehots"], jnp.asarray(raw_reads),
            jnp.asarray(lengths.astype(np.int32)), thr_tbl,
            state["leaf_users"], state["seeds_hi"], state["seeds_lo"],
            state["bls"])
        try:
            packed_dev.copy_to_host_async()
        except Exception:
            pass

        def collect():
            from .sharding import host_view

            packed = host_view(packed_dev)[:R0]
            if da:  # [minv | leaf sums | users | n_unique | n_emit]
                return (packed[:, :k], packed[:, 2 * k : 3 * k],
                        packed[:, 3 * k], packed[:, 3 * k + 1],
                        hcap, packed[:, k : 2 * k])
            return (packed[:, :k], packed[:, k : 2 * k],
                    packed[:, 2 * k], packed[:, 2 * k + 1], hcap)

        return collect

    def _thr_table(self, thresholder, hcap: int) -> np.ndarray:
        """Exact per-hash-count descent thresholds, computed on host with
        the reference's float64 semantics and uploaded once.  Count-only
        models (percentage / syncmer) ignore the scaling argument."""
        tbl = np.empty(hcap + 1, dtype=np.int64)
        for c in range(hcap + 1):
            # clamp before the int64 store: size_t-wrapped "impossible"
            # thresholds are >= 2^63 and overflow np.int64
            tbl[c] = min(thresholder.get(c, 0.0), 2**31 - 1)
        return np.clip(tbl, 0, 2**31 - 1).astype(np.int32)

    def _depths(self) -> dict[int, int]:
        """ixf id -> tree depth (root = 0) via the parent links."""
        depths = {0: 0}
        for i in self.bfs_order[1:]:
            depths[i] = depths[self.parent[i][0]] + 1
        return depths

    @staticmethod
    def _stack_host_groups(host_groups):
        """Stack runs of consecutive probe groups that share
        (poskey, engine, p10, fp shape) into ONE group with
        fp [G, S1, B4] / onehot [G, 4*B4, runs_max] and members
        re-offset to run index g*runs_max + r.  The fused step lax.scans
        the probe over the G axis, so the executable contains ONE probe
        kernel per level geometry instead of one per subgroup — at 193
        IXFs that cut the compiled executable ~10x and with it the
        compile-service round trip (~30 s compile / ~27 s cached LOAD
        were the residual cold-start wall once lowering was fixed).
        Bit-equality: each scan step probes with its own subgroup's
        member-OR activity mask, exactly like the unstacked calls."""
        out = []
        i = 0
        while i < len(host_groups):
            g = host_groups[i]
            key = (g["poskey"], g.get("engine", "pallas"),
                   g.get("p10", False), g["fp"].shape)
            j = i + 1
            while (j < len(host_groups)
                   and (host_groups[j]["poskey"],
                        host_groups[j].get("engine", "pallas"),
                        host_groups[j].get("p10", False),
                        host_groups[j]["fp"].shape) == key):
                j += 1
            if j - i > 1 and g.get("engine", "pallas") == "pallas":
                sub = host_groups[i:j]
                G = len(sub)
                runs_max = max(s["onehot"].shape[1] for s in sub)
                fp = np.stack([s["fp"] for s in sub])
                onehot = np.zeros((G, fp.shape[2] * 4, runs_max),
                                  dtype=np.float32)
                members = []
                sub_members = []
                for gi, s in enumerate(sub):
                    onehot[gi, :, : s["onehot"].shape[1]] = s["onehot"]
                    adj = gi * runs_max
                    for (bfs, run_off, n_runs, kids, leaf_sel) \
                            in s["members"]:
                        members.append((bfs, run_off + adj, n_runs, kids,
                                        leaf_sel + adj))
                    sub_members.append([m[0] for m in s["members"]])
                out.append(dict(
                    fp=fp, onehot=onehot, seed=g["seed"], bl=g["bl"],
                    poskey=g["poskey"], members=members,
                    p10=g.get("p10", False), engine="pallas",
                    stacked=G, runs_max=runs_max,
                    sub_members=sub_members))
                i = j
            else:
                out.append(g)
                i += 1
        return out

    def _hixf_e2e_fn(self, scheme, k: int, descend_all: bool = False):
        """Cached hierarchical fused step: IXFs sharing
        (depth, seed, block_length, slots) probe as ONE grouped kernel
        call (e2e.make_hixf_e2e_grouped_fn) — the builder's uniform level
        geometry makes whole levels one group."""
        key = (scheme.kmer_size, scheme.syncmer_size, scheme.t_syncmer,
               scheme.use_syncmer, scheme.window_size, scheme.scaling, k,
               descend_all)
        cache = getattr(self, "_hixf_e2e_cache", None)
        if cache is None:
            cache = self._hixf_e2e_cache = {}
        if key not in cache:
            from .e2e import make_hixf_e2e_grouped_fn
            from .pallas_probe import (choose_bin_tile4,
                                       prepare_fingerprints)

            # p10_ok=False: the p10x2 kernel's PAIR-maxed trip counts
            # would defeat the zero-trip pruning that makes inactive
            # subgroups free (an active read drags its paired inactive
            # neighbor through the probe) — measured 13 -> 17 ms on
            # hier_1024.  Descent groups keep the per-read-trip p16
            # kernels; the flat paths (all reads active) keep p10x2.
            host_groups, leaf_users = self._build_probe_groups(
                max_group_b4=128, p10_ok=False)
            host_groups = self._stack_host_groups(host_groups)
            groups = []
            fps = []
            onehots = []
            for g in host_groups:
                # the big arrays travel as fn ARGUMENTS — closure
                # captures would lower them into the HLO as constants
                # (gigabytes at scale).  The SMALL per-member metadata
                # (seeds, leaf selectors, leaf_users) stays NUMPY: a
                # closure-captured device array lowers as an MLIR
                # constant via a blocking device->host sync (~2 s each
                # through the tunnel — 199 of them were the round-4
                # "200-300 s trace time" at 193 IXFs), while numpy
                # constants lower for free
                fps.append(jnp.asarray(g["fp"]))
                onehots.append(jnp.asarray(g["onehot"]))
                groups.append(dict(
                    seed_hi=np.uint32(g["seed"] >> 32),
                    seed_lo=np.uint32(g["seed"] & 0xFFFFFFFF),
                    bl=np.uint32(g["bl"]),
                    poskey=g["poskey"],
                    p10=g.get("p10", False),
                    engine=g.get("engine", "pallas"),
                    bt4=(None if g.get("engine") == "xla"
                         else choose_bin_tile4(*g["fp"].shape[-2:])),
                    stacked=g.get("stacked", 0),
                    runs_max=g.get("runs_max", 0),
                    sub_members=g.get("sub_members"),
                    members=[(m[0], m[1], m[2], m[3],
                              np.asarray(m[4], dtype=np.int32))
                             for m in g["members"]],
                ))
            fn = make_hixf_e2e_grouped_fn(
                groups, leaf_users.astype(np.int32),
                k=scheme.kmer_size, s=scheme.syncmer_size,
                t=scheme.t_syncmer, topk=k,
                interpret=getattr(self, "_interpret", False),
                scheme_kind=("syncmer" if scheme.use_syncmer
                             else "minimizer"),
                window=scheme.window_size,
                scale_thresh=_scale_thresh(scheme),
                descend_all=descend_all,
            )
            cache[key] = (fn, tuple(fps), tuple(onehots))
        return cache[key]

    def _build_probe_groups(self, col_multiple: int | None = None,
                            max_group_b4: int | None = None,
                            p10_ok: bool = False,
                            xla_col_multiple: int | None = None):
        """Assemble the level-grouped probe structure on the host.

        Groups IXFs by (depth, seed, block_length); members pack tightly
        (4-bin words, no per-member sentinel) and only the GROUP pads its
        columns — to `col_multiple` words when given (the sharded path
        needs each bins-shard to get whole 128-lane tiles), else to a
        1024-word multiple once rows get close to it (unlocking the
        rotate-free wide kernel) or the 128-lane minimum.

        max_group_b4: split multi-member groups at member boundaries so
        each subgroup spans <= this many packed words.  Each subgroup is
        probed with ITS members' activity OR — since a descending read is
        typically active in one subtree, it pays probe-row bytes for one
        narrow subgroup instead of the whole level (the CPU's pruning,
        recovered column-wise; per-read zero trip counts make inactive
        subgroups near-free).  Probe positions depend only on
        (seed, block_length), so subgroups share one position set —
        callers dedup via the `poskey` field.

        Returns (groups, leaf_users): groups are dicts of numpy
        fp [S1, B4g] (zero sentinel row appended), onehot [4*B4g, runs],
        seed, bl, poskey, members [(bfs_pos, run_off, n_runs,
        children [(local_run, child_bfs_pos)], leaf_sel int32)].
        """
        from .pallas_probe import (USE_P10X2, p10_eligible,
                                   prepare_fingerprints,
                                   prepare_fingerprints_p10)

        bfs_pos = {ixf_id: p for p, ixf_id in enumerate(self.bfs_order)}
        depths = self._depths()
        group_key_order: list[tuple] = []
        group_members: dict[tuple, list[int]] = {}
        for i in self.bfs_order:
            ixf = self.hixf.ixfs[i]
            gk = (depths[i], ixf.seed, ixf.block_length)
            if gk not in group_members:
                group_members[gk] = []
                group_key_order.append(gk)
            group_members[gk].append(i)
        group_key_order.sort(key=lambda gk: gk[0])

        if max_group_b4 is not None:
            # split member lists greedily by cumulative packed width
            split_order: list[tuple] = []
            split_members: dict[tuple, list[int]] = {}
            for gk in group_key_order:
                part: list[int] = []
                width = 0
                sub = 0
                for i in group_members[gk]:
                    b4_i = -(-self.hixf.ixfs[i].bin_count // 4)
                    if part and width + b4_i > max_group_b4:
                        k2 = gk + (sub,)
                        split_order.append(k2)
                        split_members[k2] = part
                        part, width, sub = [], 0, sub + 1
                    part.append(i)
                    width += b4_i
                k2 = gk + (sub,)
                split_order.append(k2)
                split_members[k2] = part
            group_key_order = split_order
            group_members = split_members

        groups = []
        leaf_users_parts = []
        for gk in group_key_order:
            members_meta = []
            fp_parts = []
            onehot_parts = []
            run_off = 0
            b4_off = 0
            # all group members share block_length (uniform level
            # geometry); small-block groups take the p10x2 kernel with
            # block-padded member tables (pallas_probe)
            g_p10 = bool(p10_ok and USE_P10X2 and p10_eligible(gk[2]))
            for i in group_members[gk]:
                ixf = self.hixf.ixfs[i]
                d = self.ixfs[i]
                if g_p10:
                    fp = prepare_fingerprints_p10(ixf.fingerprints,
                                                  gk[2], lane=4)
                else:
                    fp = prepare_fingerprints(ixf.fingerprints, lane=4,
                                              sentinel=False)
                fp_parts.append(fp)
                starts, ends, users = self.hixf.runs_of_ixf(i)
                n_runs = starts.shape[0]
                onehot_parts.append((b4_off, starts, ends, n_runs))
                kids = []
                leaves = []
                for r, c in enumerate(d.run_children):
                    if int(c) >= 0:
                        kids.append((r, bfs_pos[int(c)]))
                    else:
                        leaves.append(run_off + r)
                leaf_users_parts.append(
                    users[users >= 0] if leaves else
                    np.zeros(0, dtype=np.int64))
                members_meta.append(
                    (bfs_pos[i], run_off, n_runs, kids,
                     np.array(leaves, dtype=np.int32)))
                run_off += n_runs
                b4_off += fp.shape[1]
            # pad members to a common slot count (geometry equal =>
            # equal already; defensive for reseeded stragglers)
            S = max(f.shape[0] for f in fp_parts)
            b4 = sum(f.shape[1] for f in fp_parts)
            # engine by row size: a single 128-word column tile of the
            # packed table must fit scoped VMEM, else the group probes
            # via the XLA row gather (at-scale roots)
            from . import pallas_probe as _pp

            xla_rows = ((S + 1) * 128 * 4 > _pp._FP_VMEM_TILE
                        and not g_p10)
            if col_multiple is not None:
                # the sharded path needs each bins-shard to hold whole
                # 128-lane Pallas tiles; XLA-gather groups only need the
                # shard split to be exact — padding a multi-GB root to
                # lane*nb would multiply its footprint
                cm = (xla_col_multiple
                      if xla_rows and xla_col_multiple else col_multiple)
                target = -(-b4 // cm) * cm
            elif xla_rows:
                # gather path: count_xla has no lane requirement (plain
                # row gather + elementwise); pad words to 8 (32 bins)
                # only — at 37M slots every padded word costs ~150 MB
                target = -(-b4 // 8) * 8
            else:
                target = (-(-b4 // 1024) * 1024 if b4 > 384
                          else -(-b4 // 128) * 128)
            # assemble into ONE preallocated buffer: member slot/column
            # padding and the sentinel row fall out of the zero fill
            # (the np.pad/concatenate/vstack chain copied the ~1 GB
            # at-scale level three extra times)
            rows = S if g_p10 else S + 1  # p10 keeps sentinels in-block
            fp_group = np.zeros((rows, target), dtype=np.int32)
            off = 0
            for f in fp_parts:
                fp_group[: f.shape[0], off : off + f.shape[1]] = f
                off += f.shape[1]
            B4g = target
            onehot = np.zeros((4 * B4g, run_off), dtype=np.float32)
            roff = 0
            for b4_off, starts, ends, n_runs in onehot_parts:
                for r, (a, b) in enumerate(zip(starts, ends)):
                    onehot[4 * b4_off + a : 4 * b4_off + b,
                           roff + r] = 1.0
                roff += n_runs
            from .pallas_probe import choose_bin_tile4 as _cbt4

            g_engine = "pallas" if _cbt4(*fp_group.shape) else "xla"
            if g_engine == "xla":
                # the row-gather engine consumes BYTES: ship the table
                # as native uint8 [S1, 4*B4g].  A device-side
                # bitcast(int32 -> u8) materializes a WIDENED copy on
                # TPU (observed: u32[37M, 32, 4] = 4 bytes per byte,
                # 19.3 GB for a 2.25 GB at-scale root -> HBM OOM at
                # compile); a host-side view is free and uploads packed
                fp_group = np.ascontiguousarray(
                    fp_group).view(np.uint8).reshape(rows, 4 * B4g)
            groups.append(dict(
                fp=fp_group, onehot=onehot, seed=gk[1], bl=gk[2],
                poskey=(gk[1], gk[2]), members=members_meta, p10=g_p10,
                engine=g_engine,
            ))
        leaf_users = np.concatenate(leaf_users_parts)
        return groups, leaf_users

    def e2e_async(self, raw_reads: np.ndarray, lengths: np.ndarray,
                  scheme, thresholder=None, k: int = 16):
        """Whole-search dispatch from 2-bit packed reads (device/e2e.py):
        extraction, dedup, probe, (hierarchical descent) and top-k all in
        one device graph.

        raw_reads: uint8 [R, L/4] 2-bit packed (device_syncmer.pack_reads)
        lengths:      int32 [R]
        Returns a collector -> (vals [R,k], users [R,k], counts [R],
        n_emit [R], hcap); counts = unique hashes (threshold input),
        n_emit = pre-dedup emissions (n_emit > hcap => host fallback).
        Caller guarantees e2e_capable() and device_syncmer.supports()."""
        from ..hash.device_syncmer import hash_cap
        from .e2e import fused_e2e_step
        from .pallas_probe import _READ_TILE, choose_bin_tile4

        if self.mesh is not None:
            return self._sharded_e2e_async(raw_reads, lengths, scheme, k,
                                           thresholder)
        R = raw_reads.shape[0]
        rpad = (-R) % _READ_TILE
        if rpad:
            raw_reads = np.pad(raw_reads, ((0, rpad), (0, 0)))
            lengths = np.pad(lengths, (0, rpad))
        if len(self.ixfs) > 1:
            L = raw_reads.shape[1] * 4
            hcap = hash_cap(L) if scheme.use_syncmer else L
            da = _descend_all(thresholder)
            tbl_cache = getattr(self, "_thr_table_cache", None)
            if tbl_cache is None:
                tbl_cache = self._thr_table_cache = {}
            # descend-all ignores the table; an all-zero placeholder
            # keeps the fn signature (and avoids evaluating the
            # length-dependent model at a meaningless fixed length)
            tkey = ("zeros", hcap) if da else (id(thresholder), hcap)
            if tkey not in tbl_cache:
                tbl_cache[tkey] = jnp.asarray(
                    np.zeros(hcap + 1, dtype=np.int32) if da
                    else self._thr_table(thresholder, hcap))
            fn, fps, onehots = self._hixf_e2e_fn(scheme, k,
                                                 descend_all=da)
            packed_dev = fn(
                jnp.asarray(raw_reads),
                jnp.asarray(lengths.astype(np.int32)),
                tbl_cache[tkey],
                fps, onehots,
                hcap=hcap,
            )
            try:
                packed_dev.copy_to_host_async()
            except Exception:
                pass

            def collect():
                packed = np.asarray(packed_dev)[:R]
                if da:  # [minv | leaf sums | users | n_unique | n_emit]
                    return (packed[:, :k], packed[:, 2 * k : 3 * k],
                            packed[:, 3 * k], packed[:, 3 * k + 1],
                            hcap, packed[:, k : 2 * k])
                return (packed[:, :k], packed[:, k : 2 * k],
                        packed[:, 2 * k], packed[:, 2 * k + 1], hcap)

            return collect
        dixf = self.ixfs[0]
        run_users_dev = getattr(dixf, "_run_users_dev", None)
        if run_users_dev is None:
            run_users_dev = jnp.asarray(dixf.run_users.astype(np.int32))
            dixf._run_users_dev = run_users_dev
        L = raw_reads.shape[1] * 4  # bases: 4 per packed byte
        hcap = hash_cap(L) if scheme.use_syncmer else L
        packed_dev = fused_e2e_step(
            dixf.fp,
            jnp.asarray(raw_reads),
            jnp.asarray(lengths.astype(np.int32)),
            dixf.run_onehot,
            run_users_dev,
            dixf.seed_hi,
            dixf.seed_lo,
            dixf.bl_u32,
            k=scheme.kmer_size,
            s=scheme.syncmer_size,
            t=scheme.t_syncmer,
            hcap=hcap,
            topk=k,
            bin_tile4=choose_bin_tile4(*dixf.fp_shape),
            scheme_kind="syncmer" if scheme.use_syncmer else "minimizer",
            window=scheme.window_size,
            scale_thresh=_scale_thresh(scheme),
            interpret=getattr(self, "_interpret", False),
            use_p10=dixf.p10,
            prefix_runs=dixf.prefix_runs,
        )
        try:
            packed_dev.copy_to_host_async()
        except Exception:
            pass

        def collect():
            packed = np.asarray(packed_dev)[:R]
            return (packed[:, :k], packed[:, k : 2 * k], packed[:, 2 * k],
                    packed[:, 2 * k + 1], hcap)

        return collect

    def counts_async(self, hashes, mask, thresholds):
        """Dispatch the batch and return a zero-arg collector.

        Single-level Pallas indexes dispatch fully asynchronously (no
        device sync until the collector runs), which lets the pipeline
        overlap the ~tens-of-ms device round-trip latency of one batch
        with host work and dispatch of the next.  Hierarchical indexes
        fall back to the synchronous traversal (descent decisions need
        the parent sums on host).
        """
        if (len(self.ixfs) == 1 and self.ixfs[0].engine == "pallas"
                and self.mesh is None):
            from .pallas_probe import (
                _HASH_UNROLL,
                _READ_TILE,
                choose_bin_tile4,
                fused_probe_step,
                pack_batch,
            )

            R = hashes.shape[0]
            rpad = (-R) % _READ_TILE
            hpad = (-hashes.shape[1]) % _HASH_UNROLL
            if rpad or hpad:
                hashes = np.pad(hashes, ((0, rpad), (0, hpad)))
                mask = np.pad(mask, ((0, rpad), (0, hpad)))
            thresholds = np.asarray(thresholds, dtype=np.int64)
            dixf = self.ixfs[0]
            sums_dev = fused_probe_step(
                dixf.fp,
                jnp.asarray(pack_batch(hashes, mask)),  # ONE upload
                self._all_active(hashes.shape[0]),
                dixf.run_onehot,
                dixf.seed_hi,
                dixf.seed_lo,
                dixf.bl_u32,
                bin_tile4=choose_bin_tile4(*dixf.fp_shape),
                use_p10=dixf.p10,
                prefix_runs=dixf.prefix_runs,
            )

            def collect():
                sums = np.asarray(sums_dev).astype(np.int64)[:R]
                users = dixf.run_users
                leaf = users >= 0
                counts = np.zeros((R, self.num_user_bins), dtype=np.int64)
                emitted = np.zeros((R, self.num_user_bins), dtype=bool)
                s = sums[:, leaf]
                u = users[leaf]
                emit = s >= thresholds[:R, None]
                counts[:, u] = np.where(emit, s, 0)
                emitted[:, u] = emit
                return counts, emitted

            return collect

        result = self.counts(hashes, mask, thresholds)
        return lambda: result

    def counts(
        self,
        hashes: np.ndarray,  # uint64 [R, H] padded
        mask: np.ndarray,  # bool [R, H]
        thresholds: np.ndarray,  # int64 [R]
    ):
        """Per-read, per-user-bin (counts, emitted) as numpy arrays.

        ``emitted[r, u]`` replicates the reference's emission rule: the
        user bin's split-run sum reached the threshold AND every merged
        bin on the path down was descended.
        """
        R = hashes.shape[0]
        if self.mesh is not None:
            # pad the read axis to the reads-mesh size
            rsize = self.mesh.shape["reads"]
            rpad = (-R) % rsize
            if rpad:
                hashes = np.pad(hashes, ((0, rpad), (0, 0)))
                mask = np.pad(mask, ((0, rpad), (0, 0)))
                thresholds = np.pad(thresholds, (0, rpad))
        any_pallas = any(d.engine == "pallas" for d in self.ixfs)
        if any_pallas:
            # pad to the kernel's read/hash tiles once for the whole tree
            from .pallas_probe import _HASH_UNROLL, _READ_TILE

            rpad2 = (-hashes.shape[0]) % _READ_TILE
            hpad2 = (-hashes.shape[1]) % _HASH_UNROLL
            if rpad2 or hpad2:
                hashes = np.pad(hashes, ((0, rpad2), (0, hpad2)))
                mask = np.pad(mask, ((0, rpad2), (0, hpad2)))
                thresholds = np.pad(thresholds, (0, rpad2))
            from .pallas_probe import pack_batch

            batch_dev = jnp.asarray(pack_batch(hashes, mask))

        Rp = hashes.shape[0]
        run_sums: dict[int, np.ndarray] = {}
        active: dict[int, np.ndarray] = {0: np.ones(Rp, dtype=bool)}
        thresholds = np.asarray(thresholds, dtype=np.int64)

        for i in self.bfs_order:
            if i not in active:  # unreachable (no merged run points here)
                continue
            dixf = self.ixfs[i]
            act = active[i]
            if not act.any():
                run_sums[i] = np.zeros(
                    (Rp, dixf.run_users.shape[0]), dtype=np.int64
                )
                continue
            if dixf.engine == "pallas":
                from .pallas_probe import choose_bin_tile4, fused_probe_step

                sums = fused_probe_step(
                    dixf.fp, batch_dev, jnp.asarray(act),
                    dixf.run_onehot, dixf.seed_hi, dixf.seed_lo,
                    dixf.bl_u32,
                    bin_tile4=choose_bin_tile4(*dixf.fp_shape),
                    use_p10=dixf.p10,
                    prefix_runs=dixf.prefix_runs,
                )
            else:
                pos, fpr, _ = compute_probes(
                    hashes.reshape(-1), dixf.seed, dixf.block_length
                )
                pos = pos.reshape(Rp, -1, 3).astype(np.int32)
                fpr = fpr.reshape(Rp, -1)
                m = mask & act[:, None]
                if self.mesh is not None:
                    from jax.sharding import (
                        NamedSharding,
                        PartitionSpec as P,
                    )

                    sh3 = NamedSharding(self.mesh, P("reads", None, None))
                    sh2 = NamedSharding(self.mesh, P("reads", None))
                    sums = _count_and_segment_jit(
                        dixf.fp,
                        dixf.run_onehot,
                        jax.device_put(pos, sh3),
                        jax.device_put(fpr, sh2),
                        jax.device_put(m, sh2),
                    )
                else:
                    sums = _count_and_segment(
                        dixf.fp,
                        dixf.run_onehot,
                        jnp.asarray(pos),
                        jnp.asarray(fpr),
                        jnp.asarray(m),
                    )
            if self.mesh is not None:
                from .sharding import host_view

                run_sums[i] = host_view(sums).astype(np.int64)
            else:
                run_sums[i] = np.asarray(sums).astype(np.int64)
            # schedule children
            for r, c in enumerate(dixf.run_children):
                c = int(c)
                if c < 0:
                    continue
                child_active = act & (run_sums[i][:, r] >= thresholds)
                active[c] = child_active

        counts = np.zeros((Rp, self.num_user_bins), dtype=np.int64)
        emitted = np.zeros((Rp, self.num_user_bins), dtype=bool)
        for i in self.bfs_order:
            if i not in run_sums:
                continue
            act = active.get(i)
            if act is None or not act.any():
                continue
            users = self.ixfs[i].run_users
            leaf = users >= 0
            if not leaf.any():
                continue
            s = run_sums[i][:, leaf]
            u = users[leaf]
            emit = act[:, None] & (s >= thresholds[:, None])
            counts[:, u] = np.where(emit, s, counts[:, u])
            emitted[:, u] |= emit
        return counts[:R], emitted[:R]


def _count_and_segment(fp, onehot, pos, fpr, mask):
    return _count_and_segment_jit(fp, onehot, pos, fpr, mask)


@jax.jit
def _count_and_segment_jit(fp, onehot, pos, fpr, mask):
    c = count_xla(fp, pos, fpr, mask)  # int32 [R, bins_padded]
    return _segment_jit(c, onehot)


@jax.jit
def _segment_jit(counts, onehot):
    # exact for counts < 2^24; hash counts per read are far below that
    return jnp.dot(
        counts.astype(jnp.float32), onehot, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST
    ).astype(jnp.int32)
