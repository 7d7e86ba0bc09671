"""Benchmark: classification throughput (reads/s) on the default JAX device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol (BASELINE.md): the reference publishes no throughput numbers and
cannot be built here (its deps are fetched from the network at build time),
so the baseline proxy is this repo's own single-threaded numpy host oracle
— the same algorithm the reference executes per read — scaled by the
reference's max thread count (32).  vs_baseline = device_reads_per_s /
(32 * oracle_reads_per_s).  The synthetic workload approximates the viral
config: open canonical syncmers k=22 s=12, 256 reference genomes, 2 kb
ONT-like reads with 2% substitution errors.
"""

from __future__ import annotations

import json
import time

import numpy as np


def build_problem(n_species=256, genome_len=20000, n_reads=1024,
                  read_len=2000, error_rate=0.02, seed=0):
    import sys

    sys.path.insert(0, "tests")
    from util import make_reads, make_ref_set  # noqa: E402

    import tempfile

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
    from taxor_tpu.io.fastx import read_all
    from taxor_tpu.search.thresholds import Thresholder

    t0 = time.perf_counter()
    tmp, tsv, gdir, reads_file = build_problem()
    t_data = time.perf_counter() - t0

    t0 = time.perf_counter()
    index = run_build(BuildConfig(
        input_file=tsv, input_sequence_dir=gdir, output_filename="",
        kmer_size=22, syncmer_size=12, use_syncmer=True, layout_mode="flat",
        layout_file="",
    ))
    t_build = time.perf_counter() - t0

    records = read_all(reads_file)
    seqs = [r.seq for r in records]
    scheme = index.scheme
    thresholder = Thresholder.make(scheme.kmer_size, scheme.window_size,
                                   0.04, -1.0, scheme.use_syncmer)

    # hash extraction (host) once; device probing is what we time in the
    # kernel figure, the full-pipeline figure re-does extraction per pass
    t0 = time.perf_counter()
    hash_lists = search_hashes(seqs, scheme)
    t_hash = time.perf_counter() - t0

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

    dhixf = DeviceHIXF(index.hixf)
    # warmup (compile)
    dhixf.counts(hashes, mask, thresholds)

    # device pipeline passes (hash extraction already done -> measures
    # probe+traversal path, the reference's "compute" phase analog)
    n_pass = 5
    t0 = time.perf_counter()
    for _ in range(n_pass):
        counts, emitted = dhixf.counts(hashes, mask, thresholds)
    t_device = (time.perf_counter() - t0) / n_pass
    device_reads_per_s = R / t_device

    # full pipeline including host hash extraction
    t0 = time.perf_counter()
    hl = search_hashes(seqs, scheme)
    dhixf.counts(hashes, mask, thresholds)
    t_full = time.perf_counter() - t0
    full_reads_per_s = R / t_full

    # probes/s: hashes x 3 slots x bins touched per pass
    n_hashes_total = int(mask.sum())
    bins = index.hixf.ixfs[0].bin_count
    probes_per_s = n_hashes_total * 3 * bins / t_device

    # single-thread host oracle baseline (numpy recursion, same semantics)
    sub = min(32, R)
    t0 = time.perf_counter()
    for r in range(sub):
        index.hixf.membership(hash_lists[r], int(thresholds[r]))
    t_oracle = time.perf_counter() - t0
    oracle_reads_per_s = sub / t_oracle
    baseline_proxy = 32 * oracle_reads_per_s

    accuracy = float(emitted.any(axis=1).mean())

    result = {
        "metric": "reads/s/chip classification throughput "
                  "(k=22,s=12 syncmers, 256-genome index, 2kb reads)",
        "value": round(device_reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(device_reads_per_s / baseline_proxy, 3),
        "detail": {
            "device_compute_reads_per_s": round(device_reads_per_s, 1),
            "full_pipeline_reads_per_s": round(full_reads_per_s, 1),
            "probes_per_s": round(probes_per_s, 0),
            "host_oracle_reads_per_s_1thread": round(oracle_reads_per_s, 2),
            "baseline_proxy": "32 x single-thread numpy host oracle",
            "hash_extraction_s_per_1024reads": round(t_hash, 2),
            "classified_fraction": round(accuracy, 3),
            "data_gen_s": round(t_data, 1),
            "index_build_s": round(t_build, 1),
            "backend": __import__("jax").default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
