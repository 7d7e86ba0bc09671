"""Fused Pallas extraction kernel vs the exact XLA scan pipeline.

The kernel's emission rule (pure sliding rightmost argmin) equals the
reference tracker (src/hashing/syncmer.cpp:109-146) whenever no window
minimum is both tied and at the emission offset; such reads return the
n_emit sentinel and take the host-oracle fallback.  These tests pin:
  - exact hash-set / n_unique / n_emit agreement on every unflagged read
  - the engineered tie cases (homopolymer runs) are flagged, not wrong
  - short reads, empty reads, N-runs, full-length reads
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taxor_tpu.hash import device_syncmer as dsync
from taxor_tpu.hash.device_syncmer import (dedup_kmers, emission_min_gap,
                                           pack_reads, syncmer_kmers)
from taxor_tpu.utils.u64jnp import wyhash64
from taxor_tpu.device.pallas_extract import (_TIE_SENTINEL,
                                             syncmer_hashes_fused,
                                             supports_fused)

RNG = np.random.default_rng(7)
ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)


def randseq(n):
    return RNG.choice(ACGT, size=n).tobytes()


def oracle(pr, ln, k, s, t, hcap):
    khi, klo, emit = syncmer_kmers(pr, ln, k, s, t)
    chi, clo, valid, n_unique, n_emit = dedup_kmers(
        khi, klo, emit, hcap, emission_min_gap(k, s, t), sort_impl="xla")
    hi, lo = wyhash64(chi, clo)
    return (np.asarray(hi), np.asarray(lo), np.asarray(valid),
            np.asarray(n_unique), np.asarray(n_emit))


def check_config(seqs, L, k, s, t, min_unflagged=1):
    hcap = dsync.hash_cap(L)
    packed, lengths = pack_reads(seqs, L)
    pr, ln = jnp.asarray(packed), jnp.asarray(lengths)
    ohi, olo, ov, onu, one = oracle(pr, ln, k, s, t, hcap)
    fhi, flo, fv, fnu, fne = map(np.asarray, syncmer_hashes_fused(
        pr, ln, k, s, t, hcap, interpret=True))
    unflagged = 0
    for r in range(len(seqs)):
        if fne[r] >= int(_TIE_SENTINEL):
            continue
        unflagged += 1
        o_set = set(zip(ohi[r][ov[r]].tolist(), olo[r][ov[r]].tolist()))
        f_set = set(zip(fhi[r][fv[r]].tolist(), flo[r][fv[r]].tolist()))
        assert o_set == f_set, f"read {r}: hash sets differ"
        assert one[r] == fne[r], f"read {r}: n_emit {one[r]} != {fne[r]}"
        assert onu[r] == fnu[r], f"read {r}: n_unique {onu[r]} != {fnu[r]}"
    assert unflagged >= min_unflagged
    return fne


class TestFusedExtract:
    def test_default_scheme_random_reads(self):
        L = 512
        seqs = [randseq(int(RNG.integers(25, L))) for _ in range(48)]
        seqs += [randseq(L)]  # exactly bucket-length
        fne = check_config(seqs, L, 22, 12, 6, min_unflagged=40)
        # random reads should rarely flag
        flagged = (fne >= int(_TIE_SENTINEL)).sum()
        assert flagged <= len(seqs) // 4

    @pytest.mark.parametrize("k,s", [(16, 8), (30, 14), (20, 10),
                                     (32, 15), (14, 12)])
    def test_other_schemes(self, k, s):
        t = (k - s + 1 + 1) // 2
        assert supports_fused(k, s)
        L = 256
        seqs = [randseq(int(RNG.integers(20, L))) for _ in range(32)]
        check_config(seqs, L, k, s, t, min_unflagged=20)

    def test_edge_reads(self):
        L = 256
        seqs = [b"", randseq(5), randseq(21), randseq(22), randseq(23),
                b"N" * 200, b"NNAG" * 50]
        hcap = dsync.hash_cap(L)
        packed, lengths = pack_reads(seqs, L)
        pr, ln = jnp.asarray(packed), jnp.asarray(lengths)
        fhi, flo, fv, fnu, fne = map(np.asarray, syncmer_hashes_fused(
            pr, ln, 22, 12, 6, hcap, interpret=True))
        # reads shorter than k emit nothing
        for r in (0, 1, 2):
            assert fne[r] == 0 and fnu[r] == 0 and not fv[r].any()
        check_config(seqs, L, 22, 12, 6, min_unflagged=3)

    def test_homopolymer_ties_flagged(self):
        # a poly-A run makes the all-A s-mer the (tied) window minimum at
        # every offset including t -> must flag, never silently diverge
        L = 256
        seqs = [b"A" * 60 + randseq(120), randseq(80) + b"T" * 40]
        hcap = dsync.hash_cap(L)
        packed, lengths = pack_reads(seqs, L)
        fhi, flo, fv, fnu, fne = map(np.asarray, syncmer_hashes_fused(
            jnp.asarray(packed), jnp.asarray(lengths), 22, 12, 6, hcap,
            interpret=True))
        assert (fne >= int(_TIE_SENTINEL)).all()

    def test_compiled_matches_interpret_subvreg_bucket(self):
        # Regression: read buckets with < 128 stream words per row
        # (L < 2048) used sub-vreg [RT, Wd] phase arrays whose compiled
        # roll+funnel-shift chains corrupted sparse lanes — identical
        # wrong bits from Mosaic on TPU and the compiled pallas CPU
        # pipeline, while interpret mode was exact (found by the bench
        # device-vs-host parity gate; minimized in tools/debug_min.py).
        # syncmer_hashes_fused now pads the word stream to >= 128 lanes;
        # this pins compiled == interpret on the affected bucket.
        L = 1024
        seqs = [randseq(1000) for _ in range(8)]
        hcap = dsync.hash_cap(L)
        packed, lengths = pack_reads(seqs, L)
        pr, ln = jnp.asarray(packed), jnp.asarray(lengths)
        try:
            a = syncmer_hashes_fused(pr, ln, 22, 12, 5, hcap,
                                     interpret=False)
            jax.block_until_ready(a)
        except Exception as e:  # pytest's CPU env has no compiled
            # pallas path (the bench parity gate covers it on real TPU
            # and under the axon-site Mosaic emulation); JAX versions
            # vary in what they raise on non-TPU backends (ValueError,
            # NotImplementedError, lowering errors), so any failure to
            # RUN skips — the equality assert below is the test
            pytest.skip(f"compiled pallas unavailable: {e!r}")
        b = syncmer_hashes_fused(pr, ln, 22, 12, 5, hcap,
                                 interpret=True)
        for name, x, y in zip(("hi", "lo", "valid", "nu", "ne"), a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y)), name

    def test_emission_irrelevant_ties_still_exact(self):
        # many random reads across two configs: every unflagged read is
        # exact even when windows tie at non-emission offsets
        L = 1024
        seqs = [randseq(int(RNG.integers(200, L))) for _ in range(24)]
        check_config(seqs, L, 22, 12, 6, min_unflagged=15)
        check_config(seqs, L, 18, 12, 4, min_unflagged=15)
