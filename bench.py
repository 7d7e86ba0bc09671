"""Benchmark: classification throughput (reads/s) on the default JAX device.

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}.
Progress goes to stderr.

Protocol (BASELINE.md): the reference publishes no throughput numbers and
cannot be built here (its deps are fetched from the network at build
time), so the baseline proxy is this repo's own single-threaded numpy
host oracle — the same per-read algorithm the reference executes — scaled
by the reference's max thread count (32).  vs_baseline =
device_reads_per_s / (32 * oracle_reads_per_s).  The synthetic workload
approximates the viral config: open canonical syncmers k=22 s=12, 256
reference genomes, 2 kb ONT-like reads with 2% substitution errors.

Robustness: TPU kernel compiles go through a shared compile service whose
latency is erratic (observed 0.7s..500s for identical kernels).  The
device phase therefore runs with a wall-clock budget; if the first
compile exceeds it the run reports the host numbers with
"device_timeout": true rather than hanging the driver.  All shapes are
deterministic, so one successful run warms the service cache for the
next.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

DEVICE_BUDGET_S = 1500.0


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_problem(n_species=256, genome_len=20000, n_reads=8192,
                  read_len=2000, error_rate=0.02, seed=0):
    import os
    import tempfile

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    from util import make_reads, make_ref_set  # noqa: E402

    tmp = tempfile.mkdtemp(prefix="taxor_bench_")
    rng = np.random.default_rng(seed)
    tsv, gdir, genomes = make_ref_set(tmp, rng, n_species=n_species,
                                      genome_len=genome_len)
    reads = make_reads(tmp, rng, genomes,
                       n_reads_per_genome=max(1, n_reads // n_species),
                       read_len=read_len, error_rate=error_rate)
    return tmp, tsv, gdir, reads


def main():
    from taxor_tpu.apps.build import BuildConfig, run_build
    from taxor_tpu.device.hixf_search import DeviceHIXF
    from taxor_tpu.hash.schemes import search_hashes
    from taxor_tpu.hash import schemes as _schemes
    from taxor_tpu.io.fastx import read_all
    from taxor_tpu.search.thresholds import Thresholder

    _schemes.NUM_THREADS = 8
    deadline = time.monotonic() + DEVICE_BUDGET_S

    t0 = time.perf_counter()
    tmp, tsv, gdir, reads_file = build_problem()
    t_data = time.perf_counter() - t0
    log(f"bench: data generated in {t_data:.1f}s")

    t0 = time.perf_counter()
    index = run_build(BuildConfig(
        input_file=tsv, input_sequence_dir=gdir, output_filename="",
        kmer_size=22, syncmer_size=12, use_syncmer=True,
        layout_mode="flat", layout_file="", threads=8,
    ))
    t_build = time.perf_counter() - t0
    log(f"bench: index built in {t_build:.1f}s "
        f"({index.hixf.ixfs[0].bin_count} bins)")

    records = read_all(reads_file)
    seqs = [r.seq for r in records]
    scheme = index.scheme
    thresholder = Thresholder.make(scheme.kmer_size, scheme.window_size,
                                   0.04, -1.0, scheme.use_syncmer)

    t0 = time.perf_counter()
    hash_lists = search_hashes(seqs, scheme)
    t_hash = time.perf_counter() - t0
    log(f"bench: hash extraction {t_hash:.2f}s for {len(seqs)} reads")

    thresholds = np.array(
        [thresholder.get(h.shape[0],
                         h.shape[0] / (len(s) - scheme.kmer_size + 1.0))
         for h, s in zip(hash_lists, seqs)], dtype=np.int64)

    H = max(h.shape[0] for h in hash_lists)
    Hpad = 1 << (H - 1).bit_length()
    R = len(hash_lists)
    hashes = np.zeros((R, Hpad), dtype=np.uint64)
    mask = np.zeros((R, Hpad), dtype=bool)
    for r, h in enumerate(hash_lists):
        hashes[r, : h.shape[0]] = h
        mask[r, : h.shape[0]] = True

    # Honest CPU baseline: the reference's full worker loop (syncmer scan
    # -> dedup -> threshold -> recursive HIXF membership -> 0.8*max
    # filter) implemented in C++ (-O3 -march=native, threaded like
    # do_parallel) — native/ref_baseline.cpp, correctness-tested against
    # the host oracle in tests/test_baseline.py.  baseline_proxy models a
    # 32-core machine as 32 x the single-thread rate (this bench host has
    # few cores, so a literal 32-thread run here would UNDERstate the
    # reference); the literal 32-thread-on-this-host number is recorded
    # alongside.
    import os as _os

    from taxor_tpu.native.baseline import baseline_search

    t0 = time.perf_counter()
    _, _, _ = baseline_search(index.hixf, seqs, scheme, thresholder,
                              threads=1)
    t_oracle = time.perf_counter() - t0
    oracle_reads_per_s = R / t_oracle
    t0 = time.perf_counter()
    baseline_search(index.hixf, seqs, scheme, thresholder, threads=32)
    native32_reads_per_s = R / (time.perf_counter() - t0)
    baseline_proxy = 32 * oracle_reads_per_s
    log(f"bench: native C++ baseline {oracle_reads_per_s:.0f} reads/s/thread "
        f"(x32 extrapolated {baseline_proxy:.0f}; literal 32 threads on "
        f"{_os.cpu_count()} cores {native32_reads_per_s:.0f})")

    # device phase in a worker thread so a runaway compile can't hang the
    # driver; the thread is daemonic and abandoned on timeout
    device = {}

    def device_phase():
        import jax
        import jax.numpy as jnp

        from taxor_tpu.hash import device_syncmer as dsync
        from taxor_tpu.search.pipeline import _pairs_from_e2e

        dhixf = DeviceHIXF(index.hixf)
        assert dhixf.flat_fast_path and dsync.supports(scheme)
        dfs_rank = index.hixf.user_bin_dfs_order()
        L = dsync.pad_len_bucket(max(len(s) for s in seqs))

        def dispatch():
            # 2-bit packing is part of the measured per-pass cost, as in
            # the production pipeline (prepare step)
            packed, lengths = dsync.pack_reads(seqs, L)
            return dhixf.e2e_async(packed, lengths, scheme)

        def drain(collect):
            vals, users, counts, n_emit, hcap = collect()
            return _pairs_from_e2e(vals, users, counts, n_emit, seqs,
                                   index, scheme, thresholder, dfs_rank,
                                   hcap)

        log("bench: compiling fused e2e step ...")
        t0 = time.perf_counter()
        first_pairs, _ = drain(dispatch())
        log(f"bench: device compile+warmup {time.perf_counter()-t0:.1f}s")

        # (1) chip compute throughput — the primary metric.  Inputs stay
        # device-resident; N back-to-back dispatches of the full fused
        # step (extraction -> dedup -> probe -> top-k), forced once at
        # the end.  This is what one chip sustains when fed at PCIe/DMA
        # speed; the tunnel link of this test rig (tens of MB/s, see
        # link_mb_per_s) is measured separately below.
        from taxor_tpu.device.e2e import fused_e2e_step
        from taxor_tpu.device.pallas_probe import choose_bin_tile4
        from taxor_tpu.hash.device_syncmer import hash_cap

        packed, lengths = dsync.pack_reads(seqs, L)
        pr = jax.device_put(packed)
        ln = jax.device_put(lengths.astype(np.int32))
        dixf = dhixf.ixfs[0]
        users_dev = jnp.asarray(dixf.run_users.astype(np.int32))
        kw = dict(k=scheme.kmer_size, s=scheme.syncmer_size,
                  t=scheme.t_syncmer, hcap=hash_cap(L), topk=16,
                  bin_tile4=choose_bin_tile4(*dixf.fp.shape))

        # M passes inside ONE jit (scan) so per-dispatch tunnel chatter
        # can't pollute the number; each iteration sees row-rolled reads
        # (same workload, defeats CSE).
        import functools

        M = 10

        @functools.partial(jax.jit, static_argnames=())
        def multi_step(pr_, ln_):
            def body(carry, _):
                p, l2 = carry
                out = fused_e2e_step(dixf.fp, p, l2, dixf.run_onehot,
                                     users_dev, dixf.seed_hi,
                                     dixf.seed_lo, dixf.bl_u32, **kw)
                carry = (jnp.roll(p, 1, axis=0), jnp.roll(l2, 1))
                return carry, out[0, 0]
            _, probe = jax.lax.scan(body, (pr_, ln_), None, length=M)
            return probe

        np.asarray(multi_step(pr, ln))  # warm/compile
        t0 = time.perf_counter()
        np.asarray(multi_step(pr, ln))
        t_once = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(multi_step(pr, ln))
        t_comp = min(t_once, time.perf_counter() - t0) / M
        log(f"bench: chip compute {t_comp*1e3:.1f}ms/pass "
            f"({R/t_comp:.0f} reads/s)")

        # (2) host->device link probe: dependent tiny-sum forces each
        # upload; reports effective MB/s of this rig's tunnel
        redsum = jax.jit(lambda x: x.sum())
        np.asarray(redsum(jnp.asarray(packed)))
        t0 = time.perf_counter()
        ups = [redsum(jnp.asarray(packed)) for _ in range(4)]
        jax.block_until_ready(ups)
        link_mbps = packed.nbytes * 4 / (time.perf_counter() - t0) / 1e6
        log(f"bench: link {link_mbps:.0f} MB/s "
            f"({packed.nbytes // R} B/read uploaded)")

        # (3) full pipeline through the tunnel: worker threads own whole
        # passes (pack, upload, compute, download, decode) so transfers
        # multiplex with compute (same structure as search/pipeline.py)
        from concurrent.futures import ThreadPoolExecutor

        n_pass = 16
        depth = 4

        def one_pass(_):
            drain(dispatch())
            return time.perf_counter()

        with ThreadPoolExecutor(depth) as ex:
            list(ex.map(one_pass, range(depth)))  # warm per-worker state
            t0 = time.perf_counter()
            marks = sorted(ex.map(one_pass, range(n_pass)))
        t_full = (marks[-1] - t0) / n_pass
        log(f"bench: full pipeline {t_full*1e3:.1f}ms/pass "
            f"({R/t_full:.0f} reads/s through the tunnel)")
        device.update(
            t_device=t_comp,
            t_full=t_full,
            link_mbps=link_mbps,
            upload_bytes_per_read=packed.nbytes // R,
            classified=float(np.mean([bool(p) for p in first_pairs])),
            backend=jax.default_backend(),
        )

    import threading

    worker = threading.Thread(target=device_phase, daemon=True)
    worker.start()
    worker.join(timeout=max(10.0, deadline - time.monotonic()))

    n_hashes_total = int(mask.sum())
    bins = index.hixf.ixfs[0].bin_count

    if device:
        t_dev = device["t_device"]
        reads_per_s = R / t_dev
        result = {
            "metric": "reads/s/chip classification throughput "
                      "(k=22,s=12 syncmers, 256-genome index, 2kb reads)",
            "value": round(reads_per_s, 1),
            "unit": "reads/s",
            "vs_baseline": round(reads_per_s / baseline_proxy, 3),
            "detail": {
                "device_compute_reads_per_s": round(reads_per_s, 1),
                "full_pipeline_reads_per_s": round(R / device["t_full"], 1),
                "tunnel_link_mb_per_s": round(device["link_mbps"], 1),
                "upload_bytes_per_read": device["upload_bytes_per_read"],
                "note": "value = sustained chip compute (device-resident "
                        "inputs; what a chip does behind PCIe/DMA). The "
                        "full pipeline on this rig is bound by a "
                        "remote-tunnel host<->device link whose bandwidth "
                        "varies run to run; see tunnel_link_mb_per_s.",
                "probes_per_s": round(n_hashes_total * 3 / t_dev, 0),
                "probe_row_bytes_per_s": round(
                    n_hashes_total * 3 * bins / t_dev, 0),
                "baseline_1thread_reads_per_s": round(oracle_reads_per_s, 1),
                "baseline_32thread_on_this_host_reads_per_s": round(
                    native32_reads_per_s, 1),
                "baseline_proxy": "32-thread native C++ reference-algorithm "
                                  "worker (32 x measured single-thread rate; "
                                  "see native/ref_baseline.cpp)",
                "hash_extraction_s_per_1024reads": round(t_hash, 2),
                "classified_fraction": round(device["classified"], 3),
                "index_build_s": round(t_build, 1),
                "backend": device["backend"],
            },
        }
    else:
        result = {
            "metric": "reads/s/chip classification throughput "
                      "(k=22,s=12 syncmers, 256-genome index, 2kb reads)",
            "value": round(baseline_proxy, 1),
            "unit": "reads/s",
            "vs_baseline": 1.0,
            "detail": {
                "device_timeout": True,
                "note": "TPU compile service exceeded the bench budget; "
                        "reporting the 32-thread native C++ baseline proxy",
                "baseline_1thread_reads_per_s": round(oracle_reads_per_s, 1),
                "hash_extraction_s_per_1024reads": round(t_hash, 2),
                "index_build_s": round(t_build, 1),
            },
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
