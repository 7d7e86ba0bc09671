"""Localize the fused-extractor divergence: find the emission position
whose hash differs, then dump the surrounding s-mer window values."""
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np

import bench
from taxor_tpu.apps.build import BuildConfig, run_build
from taxor_tpu.hash.syncmer import wyhash64
from taxor_tpu.io.fastx import read_all

tmp, tsv, gdir, reads_file = bench.build_problem(
    n_species=32, genome_len=8000, n_reads=256, read_len=1000, seed=7)
seqs = [r.seq for r in read_all(reads_file)]
seq = seqs[1]
k, s, t = 22, 12, 5

_MAP = np.full(256, 4, dtype=np.uint8)
for i, b in enumerate(b"ACGT"):
    _MAP[b] = i
    _MAP[ord(chr(b).lower())] = i
codes = _MAP[np.frombuffer(seq, dtype=np.uint8)]

# scalar tracker with positions (mirror of syncmer_hashes_scalar)
kmask = (1 << (2 * k)) - 1
smask = (1 << (2 * s)) - 1
kshift = (k - 1) * 2
sshift = (s - 1) * 2
qs = []
qs_min_val = (1 << 64) - 1
qs_min_pos = -1
l = 0
xk0 = xk1 = xs0 = xs1 = 0
w = k - s + 1
tracker = {}  # i -> (hash, kmer_val)
smer_vals = {}  # end position -> canonical s-mer value
for i, c in enumerate(codes):
    c = int(c)
    xk0 = ((xk0 << 2) | c) & kmask
    xk1 = (xk1 >> 2) | ((3 - c) << kshift)
    xs0 = ((xs0 << 2) | c) & smask
    xs1 = (xs1 >> 2) | ((3 - c) << sshift)
    l += 1
    if l < s:
        continue
    ys = min(xs0, xs1)
    smer_vals[i] = ys
    qs.append(ys)
    if len(qs) < w:
        continue
    if len(qs) == w:
        for j in range(w):
            if qs[j] < qs_min_val:
                qs_min_val = qs[j]
                qs_min_pos = i - k + j + 1
    else:
        qs.pop(0)
        if qs_min_pos == i - k:
            qs_min_val = (1 << 64) - 1
            qs_min_pos = i - s + 1
            for j in range(len(qs) - 1, -1, -1):
                if qs[j] < qs_min_val:
                    qs_min_val = qs[j]
                    qs_min_pos = i - k + j + 1
        elif ys < qs_min_val:
            qs_min_val = ys
            qs_min_pos = i - s + 1
    if qs_min_pos == i - k + t:
        yk = min(xk0, xk1)
        tracker[i] = (int(wyhash64(np.uint64(yk))), yk)

missing = 0xCB057423213759  # host-only wyhash from debug_parity
extra = 0x894058295F59214E  # device-only wyhash
for i, (h, yk) in tracker.items():
    if h == missing:
        print(f"host emission with missing hash at i={i}, kmer={yk:#x}")
        p = i
# pure rightmost-argmin emission positions
vals = smer_vals
emit_rm = []
for i in range(k - 1, len(codes)):
    window = [(vals[e], e) for e in range(i - w + 1 + (s - 1) - (s - 1),
                                          i + 1) if e in vals
              and e >= i - k + s]
    window = [(vals[e], e) for e in range(i - k + s, i + 1) if e in vals]
    if len(window) < w:
        continue
    mn = min(v for v, _ in window)
    rm = max(e for v, e in window if v == mn)
    if rm == i - k + t + s - 1:
        emit_rm.append(i)
tr_set = set(tracker)
rm_set = set(emit_rm)
print("tracker-only positions:", sorted(tr_set - rm_set))
print("argmin-only positions:", sorted(rm_set - tr_set))
for i in sorted((tr_set - rm_set) | (rm_set - tr_set)):
    window = [(vals[e], e) for e in range(i - k + s, i + 1)]
    mn = min(v for v, _ in window)
    ties = [e for v, e in window if v == mn]
    off = i - k + t + s - 1
    print(f"i={i}: off={off}, min ends={ties}, "
          f"off_val==min: {vals[off] == mn}")
