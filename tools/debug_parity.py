"""Repro for the device-vs-host QHASH_MATCH off-by-one found by the
bench parity gate (read_len=1000 bucket, syncmer & plain-k-mer)."""
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np

import bench
from taxor_tpu.apps.build import BuildConfig, run_build
from taxor_tpu.device.hixf_search import DeviceHIXF
from taxor_tpu.hash import device_syncmer as dsync
from taxor_tpu.hash.device_syncmer import hash_cap
from taxor_tpu.hash.schemes import search_hashes
from taxor_tpu.io.fastx import read_all
from taxor_tpu.search.thresholds import Thresholder

tmp, tsv, gdir, reads_file = bench.build_problem(
    n_species=32, genome_len=8000, n_reads=256, read_len=1000, seed=7)
index = run_build(BuildConfig(
    input_file=tsv, input_sequence_dir=gdir, output_filename="",
    kmer_size=22, syncmer_size=12, use_syncmer=True,
    layout_mode="flat", layout_file="", threads=8))
scheme = index.scheme
thresholder = Thresholder.make(scheme.kmer_size, scheme.window_size,
                               0.04, -1.0, scheme.use_syncmer)
seqs = [r.seq for r in read_all(reads_file)][:8]

dhixf = DeviceHIXF(index.hixf)
L = dsync.pad_len_bucket(max(len(s) for s in seqs))
packed, lengths = dsync.pack_reads(seqs, L)
hcap = hash_cap(L)
print(f"L={L} hcap={hcap}")

vals, users, counts, n_emit, used_hcap = dhixf.e2e_async(
    packed, lengths, scheme, thresholder, k=16)()
counts = np.asarray(counts)
n_emit = np.asarray(n_emit)

for r, seq in enumerate(seqs):
    hl = search_hashes([seq], scheme)[0]
    host_pairs = index.hixf.membership(hl, 1)
    host_best = max((c for _, c in host_pairs), default=0)
    dev_best = int(np.asarray(vals)[r, 0])
    mark = "" if host_best == dev_best else "   <-- MISMATCH"
    print(f"read {r}: host_unique={hl.shape[0]} dev_unique={counts[r]} "
          f"n_emit={n_emit[r]} host_best={host_best} "
          f"dev_best={dev_best}{mark}")

# deep dive on the mismatching read: compare the deduped+wyhashed device
# hash set to the host's search_hashes output
from taxor_tpu.device import e2e as de2e  # noqa: E402
from taxor_tpu.device.e2e import _syncmer_hashes  # noqa: E402

r = 1
for fused in (True, False):
    de2e.USE_FUSED_EXTRACT = fused
    hi, lo, valid, n_unique, n_em = _syncmer_hashes(
        packed, lengths.astype(np.int32), scheme.kmer_size,
        scheme.syncmer_size, scheme.t_syncmer, hcap, False)
    whi = np.asarray(hi)[r].astype(np.uint64)
    wlo = np.asarray(lo)[r].astype(np.uint64)
    v = np.asarray(valid)[r]
    dev_h = np.unique(((whi << np.uint64(32)) | wlo)[v])
    host_h = np.unique(search_hashes([seqs[r]], scheme)[0])
    only_host = np.setdiff1d(host_h, dev_h)
    only_dev = np.setdiff1d(dev_h, host_h)
    print(f"read{r} fused={fused}: host {host_h.shape[0]} unique, "
          f"device {dev_h.shape[0]}, n_emit={np.asarray(n_em)[r]}, "
          f"only_host={[hex(int(x)) for x in only_host[:5]]}, "
          f"only_dev={[hex(int(x)) for x in only_dev[:5]]}")
