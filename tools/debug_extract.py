"""Bisect the fused extractor's compiled-vs-interpret divergence by
dumping per-stage intermediates from variant kernels."""
import functools
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench
from taxor_tpu.device import pallas_extract as pe
from taxor_tpu.hash import device_syncmer as dsync
from taxor_tpu.hash.device_syncmer import _stream_words
from taxor_tpu.io.fastx import read_all

U32 = jnp.uint32

k, s, t = 22, 12, 5
STAGE = sys.argv[1] if len(sys.argv) > 1 else "ys"


def _stage_kernel(E, words_ref, len_ref, o_ref):
    RT, Wd = words_ref.shape
    words = words_ref[:]
    lens = len_ref[:]
    w = k - s + 1
    sent = U32(0xFFFFFFFF)
    wcache = {}
    if STAGE in ("wlo", "whi", "frlo", "frhi", "rolls", "w0", "w1", "shonly", "shonly1"):
        m = s
        mask_lo = U32(0xFFFFFFFF) if m >= 16 else U32((1 << (2 * m)) - 1)
        mask_hi = U32(0) if m <= 16 else U32(((1 << (2 * m - 32)) - 1)
                                             & 0xFFFFFFFF)
        acc = []
        for c in range(16):
            off = 2 * c - 2 * m + 2
            jb = off >> 5
            sh = off - 32 * jb
            w0 = pe._roll_words(words, jb)
            w1 = pe._roll_words(words, jb + 1)
            w2 = pe._roll_words(words, jb + 2)
            if STAGE == "rolls":
                acc.append(w0 ^ w1 ^ w2)
                continue
            if STAGE == "w0":
                acc.append(w0)
                continue
            if STAGE == "w1":
                acc.append(w1)
                continue
            if STAGE == "shonly":
                acc.append(((w0 >> U32(sh)) if sh else w0) & U32(0xFFFFFF))
                continue
            if STAGE == "shonly1":
                acc.append(((w1 << U32(32 - sh)) if sh else w1)
                           & U32(0xFFFFFF))
                continue
            if sh == 0:
                lo, hi = w0, w1
            else:
                lo = (w0 >> U32(sh)) | (w1 << U32(32 - sh))
                hi = (w1 >> U32(sh)) | (w2 << U32(32 - sh))
            lo = lo & mask_lo if m < 16 else lo
            hi = hi & mask_hi
            if STAGE == "wlo":
                acc.append(lo)
            elif STAGE == "whi":
                acc.append(hi)
            elif STAGE == "frlo":
                acc.append(pe._rev2_32(hi))
            else:
                acc.append(pe._rev2_32(lo))
        o_ref[:] = jnp.concatenate(acc, axis=1)
        return
    _, sflo, _, srlo = pe._phase_windows(wcache, words, s)
    if STAGE == "sflo":
        o_ref[:] = jnp.concatenate(sflo, axis=1)
        return
    if STAGE == "srlo":
        o_ref[:] = jnp.concatenate(srlo, axis=1)
        return
    ys = [jnp.where(a < b, a, b) for a, b in zip(sflo, srlo)]
    word_iota = jax.lax.broadcasted_iota(jnp.int32, (RT, Wd), 1)
    col0 = word_iota == 0
    for c in range(min(s - 1, 16)):
        ys[c] = jnp.where(col0, sent, ys[c])
    if STAGE == "ys":
        o_ref[:] = jnp.concatenate(ys, axis=1)
        return
    kfhi, kflo, krhi, krlo = pe._phase_windows(wcache, words, k)
    chi, clo = [], []
    for c in range(16):
        f_less = (kfhi[c] < krhi[c]) | (
            (kfhi[c] == krhi[c]) & (kflo[c] < krlo[c]))
        chi.append(jnp.where(f_less, kfhi[c], krhi[c]))
        clo.append(jnp.where(f_less, kflo[c], krlo[c]))
    if STAGE == "chi":
        o_ref[:] = jnp.concatenate(chi, axis=1)
        return
    if STAGE == "clo":
        o_ref[:] = jnp.concatenate(clo, axis=1)
        return
    if STAGE == "kflo":
        o_ref[:] = jnp.concatenate(kflo, axis=1)
        return
    if STAGE == "krlo":
        o_ref[:] = jnp.concatenate(krlo, axis=1)
        return
    ends0 = [word_iota * 16 + c for c in range(16)]
    wmin, erm, elm = pe._sliding_argmin_both(ys, ends0, w)
    if STAGE == "erm":
        o_ref[:] = jnp.concatenate(
            [e.astype(jnp.uint32) for e in erm], axis=1)
        return
    emit = []
    pos16 = word_iota * 16
    for c in range(16):
        i_abs = pos16 + c
        pos_valid = (i_abs >= k - 1) & (i_abs < lens)
        e = (erm[c] == i_abs + (t + s - 1 - k)) & pos_valid
        emit.append(e)
    if STAGE == "emit":
        o_ref[:] = jnp.concatenate(
            [e.astype(jnp.uint32) for e in emit], axis=1)
        return
    cnt = jnp.zeros((RT, Wd), dtype=jnp.int32)
    out_hi = [jnp.full((RT, Wd), sent) for _ in range(E)]
    out_lo = [jnp.full((RT, Wd), sent) for _ in range(E)]
    for c in range(16):
        for e in range(E):
            take = emit[c] & (cnt == e)
            out_hi[e] = jnp.where(take, chi[c], out_hi[e])
            out_lo[e] = jnp.where(take, clo[c], out_lo[e])
        cnt = cnt + emit[c].astype(jnp.int32)
    if STAGE == "pre_hi":
        o_ref[:, : E * Wd] = jnp.concatenate(out_hi, axis=1)
        o_ref[:, E * Wd:] = U32(0)
        return
    if STAGE == "pre_lo":
        o_ref[:, : E * Wd] = jnp.concatenate(out_lo, axis=1)
        o_ref[:, E * Wd:] = U32(0)
        return


def run(words, lengths, E, Wd, interpret):
    RT = words.shape[0]
    width = 16 * Wd
    out = pl.pallas_call(
        functools.partial(_stage_kernel, E),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((RT, Wd), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 1), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RT, width), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((RT, width), jnp.uint32),
        interpret=interpret,
    )(words, lengths)
    return np.asarray(out)


tmp, tsv, gdir, reads_file = bench.build_problem(
    n_species=32, genome_len=8000, n_reads=256, read_len=1000, seed=7)
seqs = [r.seq for r in read_all(reads_file)]
sub = [seqs[i] for i in (1, 9, 11, 15, 0, 2, 3, 4)]
L = dsync.pad_len_bucket(max(len(x) for x in sub))
packed, lengths = dsync.pack_reads(sub, L)
Wd = L // 16
gap = pe.emission_min_gap(k, s, t)
E = (16 - 1) // max(1, gap) + 1
words = np.asarray(_stream_words(jnp.asarray(packed)))
lens = lengths.astype(np.int32)[:, None]

a = run(words, lens, E, Wd, False)
b = run(words, lens, E, Wd, True)
eq = np.array_equal(a, b)
print(f"stage {STAGE}: compiled==interpret: {eq}")
if not eq:
    d = np.argwhere(a != b)
    print("first diffs (read, col):", d[:8].tolist())
    for r, c in d[:4]:
        print(f"  [{r},{c}]: compiled={a[r,c]:#x} interpret={b[r,c]:#x}")
