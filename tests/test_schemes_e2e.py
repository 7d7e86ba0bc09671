"""End-to-end coverage of the non-default hash schemes: plain k-mer
(window == k), true minimizers (window > k), and FracMinHash scaling."""

import os

import numpy as np
import pytest

from taxor_tpu.apps.build import BuildConfig, run_build
from taxor_tpu.search.pipeline import SearchConfig, run_search

from .util import make_reads, make_ref_set


@pytest.fixture(scope="module")
def ref_set(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("schemes"))
    rng = np.random.default_rng(77)
    tsv, gdir, genomes = make_ref_set(tmp, rng, n_species=5,
                                      genome_len=12000)
    reads = make_reads(tmp, rng, genomes, n_reads_per_genome=3,
                       read_len=1000, error_rate=0.02)
    return tmp, tsv, gdir, genomes, reads


def _accuracy(report):
    rows = [l.split("\t") for l in open(report).read().splitlines()[1:]]
    hits = [r for r in rows if r[1] != "-"]
    if not hits:
        return 0.0, 0
    correct = sum(1 for r in hits if r[1] == r[0].split("_", 1)[1])
    return correct / len(hits), len(hits)


def _build_and_search(tmp, tsv, gdir, reads, name, **kw):
    out = os.path.join(tmp, f"{name}.npz")
    search_kw = kw.pop("search", {})
    run_build(BuildConfig(
        input_file=tsv, input_sequence_dir=gdir, output_filename=out,
        layout_mode="flat", layout_file="", **kw,
    ))
    report = os.path.join(tmp, f"{name}.tsv")
    run_search(SearchConfig(index_file=out, query_file=reads,
                            report_file=report, engine="host",
                            **search_kw))
    return report


class TestPlainKmer:
    def test_kmer_model_threshold(self, ref_set):
        tmp, tsv, gdir, genomes, reads = ref_set
        # window == k: plain canonical k-mers + kmer CI threshold model
        report = _build_and_search(tmp, tsv, gdir, reads, "kmer",
                                   kmer_size=18, use_syncmer=False,
                                   search={"error_rate": 0.04})
        acc, n = _accuracy(report)
        assert n >= 10
        assert acc > 0.9


class TestMinimizer:
    def test_window_minimizers(self, ref_set):
        tmp, tsv, gdir, genomes, reads = ref_set
        # hidden --window-size flag: w > k engages the minimizer scheme
        # and the fracminhash threshold model
        report = _build_and_search(tmp, tsv, gdir, reads, "minim",
                                   kmer_size=18, window_size=24,
                                   use_syncmer=False,
                                   search={"percentage": 0.3})
        acc, n = _accuracy(report)
        assert n >= 10
        assert acc > 0.9


class TestScaling:
    def test_fracminhash_scaling(self, ref_set):
        tmp, tsv, gdir, genomes, reads = ref_set
        report = _build_and_search(tmp, tsv, gdir, reads, "scaled",
                                   kmer_size=16, syncmer_size=8,
                                   use_syncmer=True, scaling=10,
                                   search={"percentage": 0.2})
        acc, n = _accuracy(report)
        assert n >= 8
        assert acc > 0.85

    def test_scaling_shrinks_hash_counts(self, ref_set):
        tmp, tsv, gdir, genomes, reads = ref_set
        full = _build_and_search(tmp, tsv, gdir, reads, "full16",
                                 kmer_size=16, syncmer_size=8,
                                 use_syncmer=True,
                                 search={"percentage": 0.2})
        scaled = os.path.join(tmp, "scaled.tsv")
        rows_f = [l.split("\t") for l in open(full).read().splitlines()[1:]]
        rows_s = [l.split("\t") for l in open(scaled).read().splitlines()[1:]]
        hc_f = np.mean([int(r[6]) for r in rows_f if r[1] != "-"])
        hc_s = np.mean([int(r[6]) for r in rows_s if r[1] != "-"])
        # scaling 10 keeps ~10% of hashes
        assert hc_s < 0.25 * hc_f
