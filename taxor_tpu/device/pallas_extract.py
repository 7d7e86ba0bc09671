"""Fused Pallas TPU kernel: syncmer extraction + dedup + wyhash.

Replaces the XLA extraction pipeline (hash/device_syncmer.syncmer_kmers +
dedup_kmers) whose cost was dominated by HBM traffic: the [R, L] u32
k-mer/s-mer/argmin intermediates round-trip HBM ~15x (measured 25.8 ms of
the 48.6 ms fused pass on the bench shape).  Here one kernel keeps a
read tile's entire working set in VMEM: 16-base stream words in, sorted
unique wyhashed values out — HBM sees L/16 words per read in and
~3L/16 hashes per read out.

Three structural moves vs the XLA path:

1. **Phase-major layout.** Position i decomposes as (word i//16, phase
   i%16); every per-position array lives as 16 separate [RT, L/16]
   tiles.  A shift by d positions is a Python re-indexing of the phase
   list plus a word-roll only where the phase wraps — rolls touch
   d/16th of the data instead of all of it.

2. **Scan-free emission.**  The reference's stateful window-minimum
   tracker (src/hashing/syncmer.cpp:109-146) equals the pure sliding
   RIGHTMOST argmin whenever no window has a tied minimum: every
   tracker event (strict new min / holder eviction) re-derives the
   holder from the current window alone, so with unique minima the
   holder IS the argmin.  The kernel computes the rightmost argmin by
   doubling (log2(w) combines), detects ties as leftmost != rightmost
   argmin on any valid window, and flags tied reads for the host-oracle
   fallback through the existing n_emit sentinel (the same route as
   hash-capacity overflow).  Tied-minimum windows need a duplicated
   canonical s-mer inside one w-window — rare for real s (measured
   ~0-2% of reads at s=12; homopolymer runs >= s+1 bases are the main
   source).

3. **In-VMEM compaction before the sort.**  Emissions are >= min_gap
   apart (hash/device_syncmer.emission_min_gap), so each 16-position
   block holds <= E = (16-1)//gap + 1 of them; per block the emitted
   k-mers collapse into E static slots with selects that never leave
   VMEM.  The bitonic dedup sort then runs at E*L/16 (~3L/16) wide
   instead of L — at L=2048 that is a 45-stage [RT, 512] network
   instead of the 66-stage [RT, 2048] one that cost ~12 ms.

Contract matches device_syncmer.dedup_kmers + utils.u64jnp.wyhash64:
returns (hi, lo, valid, n_unique, n_emit) with hi/lo the wyhashed
sorted-unique canonical k-mers.  Reference semantics pinned by
tests/test_pallas_extract.py against the host oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hash.device_syncmer import _rev2_32, emission_min_gap
from ..utils.u64jnp import wyhash64
from .pallas_sort import _bitonic_body, _next_pow2

U32 = jnp.uint32
_UMAX32 = 0xFFFFFFFF
_TIE_SENTINEL = np.int32(2**30)  # n_emit value that forces host fallback


def supports_fused(k: int, s: int) -> bool:
    """Same envelope as the XLA device extractor (device_syncmer)."""
    return 2 <= s <= 15 and s < k <= 32


def _roll_words(x, sw: int):
    """Access word wd+sw (sw <= 0: earlier words) via a circular lane
    roll; wrapped lanes only feed positions gated off downstream."""
    if sw == 0:
        return x
    Wd = x.shape[1]
    return pltpu.roll(x, (-sw) % Wd, axis=1)


def _phase_windows(wcache, words, m: int):
    """(fhi, flo, rhi, rlo) of the m-mer ending at phase c of each word,
    as 4 lists of 16 [RT, Wd] u32 arrays.  Same funnel-shift math as
    device_syncmer._rolling_packed_words, phase-major."""
    mask_lo = U32(_UMAX32) if m >= 16 else U32((1 << (2 * m)) - 1)
    mask_hi = U32(0) if m <= 16 else U32(((1 << (2 * m - 32)) - 1)
                                         & _UMAX32)
    fhi, flo, rhi, rlo = [], [], [], []
    for c in range(16):
        off = 2 * c - 2 * m + 2
        jb = off >> 5
        sh = off - 32 * jb
        key0, key1, key2 = jb, jb + 1, jb + 2
        for kk in (key0, key1, key2):
            if kk not in wcache:
                wcache[kk] = _roll_words(words, kk)
        w0, w1, w2 = wcache[key0], wcache[key1], wcache[key2]
        if sh == 0:
            lo, hi = w0, w1
        else:
            lo = (w0 >> U32(sh)) | (w1 << U32(32 - sh))
            hi = (w1 >> U32(sh)) | (w2 << U32(32 - sh))
        lo = lo & mask_lo if m < 16 else lo
        hi = hi & mask_hi
        r_lo = (~lo) & mask_lo
        r_hi = (~hi) & mask_hi
        fr_lo = _rev2_32(hi)
        fr_hi = _rev2_32(lo)
        s64 = 64 - 2 * m
        if s64 == 0:
            f_lo, f_hi = fr_lo, fr_hi
        elif s64 < 32:
            f_lo = (fr_lo >> U32(s64)) | (fr_hi << U32(32 - s64))
            f_hi = fr_hi >> U32(s64)
        else:
            f_lo = fr_hi >> U32(s64 - 32) if s64 > 32 else fr_hi
            f_hi = jnp.zeros_like(fr_hi)
        fhi.append(f_hi)
        flo.append(f_lo)
        rhi.append(r_hi)
        rlo.append(r_lo)
    return fhi, flo, rhi, rlo


def _sliding_argmin_both(ys, ends0, w: int):
    """Phase-major sliding-window argmin over s-mer END positions
    [i-w+1, i]: returns (erm, elm) — end arrays of the RIGHTMOST and
    LEFTMOST minimum per position (junk where windows touch junk, gated
    by the caller).  Doubling: combine spans 1,2,4,... then one
    overlapping combine to reach exactly w (idempotent min makes the
    overlap safe; tie directions stay consistent because each operand's
    window is entirely left/right of the other's right/left edge)."""
    val = list(ys)
    erm = list(ends0)
    elm = list(ends0)

    def combine(delta: int):
        nv, nr, nl = [], [], []
        for c in range(16):
            pc = (c - delta) % 16
            sw = (c - delta) >> 4  # floor; <= 0
            pv = _roll_words(val[pc], sw)
            pr = _roll_words(erm[pc], sw)
            pl_ = _roll_words(elm[pc], sw)
            take_rm = pv < val[c]     # ties keep the (righter) current
            take_lm = pv <= val[c]    # ties take the (lefter) partner
            nv.append(jnp.where(take_rm, pv, val[c]))
            nr.append(jnp.where(take_rm, pr, erm[c]))
            nl.append(jnp.where(take_lm, pl_, elm[c]))
        return nv, nr, nl

    span = 1
    while span * 2 <= w:
        val, erm, elm = combine(span)
        span *= 2
    if span < w:
        val, erm, elm = combine(w - span)
    return val, erm, elm


def _extract_kernel(k: int, s: int, t: int, E: int, W_sort: int,
                    hcap_k: int, words_ref, len_ref,
                    ohi_ref, olo_ref, ouq_ref, onu_ref, one_ref):
    RT, Wd = words_ref.shape
    words = words_ref[:]
    lens = len_ref[:]  # [RT, 1] int32
    w = k - s + 1
    sent = U32(_UMAX32)

    wcache = {}
    # ---- canonical s-mer values per phase (s <= 15: single word) ----
    # (select, not jnp.minimum: Mosaic has no unsigned vector min)
    _, sflo, _, srlo = _phase_windows(wcache, words, s)
    ys = [jnp.where(a < b, a, b) for a, b in zip(sflo, srlo)]
    # junk s-mers end at positions < s-1: word 0, phases c < s-1
    word_iota = jax.lax.broadcasted_iota(jnp.int32, (RT, Wd), 1)
    col0 = word_iota == 0
    for c in range(min(s - 1, 16)):
        ys[c] = jnp.where(col0, sent, ys[c])

    # ---- canonical k-mer (hi, lo) pairs per phase ----
    kfhi, kflo, krhi, krlo = _phase_windows(wcache, words, k)
    chi, clo = [], []
    for c in range(16):
        f_less = (kfhi[c] < krhi[c]) | (
            (kfhi[c] == krhi[c]) & (kflo[c] < krlo[c]))
        chi.append(jnp.where(f_less, kfhi[c], krhi[c]))
        clo.append(jnp.where(f_less, kflo[c], krlo[c]))

    # ---- sliding rightmost/leftmost argmin over s-mer ends ----
    ends0 = [word_iota * 16 + c for c in range(16)]
    wmin, erm, elm = _sliding_argmin_both(ys, ends0, w)

    # ---- emission + tie detection ----
    # emit at i  <=>  rightmost-argmin end == i - k + t + s - 1
    # valid positions: k-1 <= i < len.
    #
    # The tracker's holder ALWAYS carries the current window minimum
    # (strict-smaller newcomers take over; pops re-derive from the
    # window; equal newcomers never displace a min-valued holder), so
    # after any UNtied window the holder is the unique argmin regardless
    # of history — history-dependence never outlives a tie.  A tied
    # window's own emission is therefore the ONLY uncertain decision,
    # and only when one of the tied minima sits at the emission offset
    # i-k+t: otherwise emit(i) is certainly False either way.  Flag
    # exactly those windows (the per-read tie rate drops ~(w/2)x vs
    # flagging every tie).
    emit = []
    tie_acc = jnp.zeros((RT, Wd), dtype=jnp.int32)
    pos16 = word_iota * 16
    d_off = k - t - s + 1  # i minus the emission-offset s-mer END
    for c in range(16):
        i_abs = pos16 + c
        pos_valid = (i_abs >= k - 1) & (i_abs < lens)
        e = (erm[c] == i_abs + (t + s - 1 - k)) & pos_valid
        emit.append(e)
        pc = (c - d_off) % 16
        sw = (c - d_off) >> 4
        ys_off = _roll_words(ys[pc], sw)
        tie_acc = tie_acc + jnp.where(
            (erm[c] != elm[c]) & (ys_off == wmin[c]) & pos_valid, 1, 0)

    n_emit = jnp.zeros((RT, Wd), dtype=jnp.int32)
    for c in range(16):
        n_emit = n_emit + emit[c].astype(jnp.int32)
    n_emit_row = jnp.sum(n_emit, axis=1, dtype=jnp.int32)
    tie_row = jnp.sum(tie_acc, axis=1, dtype=jnp.int32)

    # ---- gap-theorem block compaction: <= E emissions per word ----
    cnt = jnp.zeros((RT, Wd), dtype=jnp.int32)
    out_hi = [jnp.full((RT, Wd), sent) for _ in range(E)]
    out_lo = [jnp.full((RT, Wd), sent) for _ in range(E)]
    for c in range(16):
        for e in range(E):
            take = emit[c] & (cnt == e)
            out_hi[e] = jnp.where(take, chi[c], out_hi[e])
            out_lo[e] = jnp.where(take, clo[c], out_lo[e])
        cnt = cnt + emit[c].astype(jnp.int32)
    overflow_row = jnp.sum(jnp.where(cnt > E, 1, 0), axis=1,
                           dtype=jnp.int32)

    # tied or overflowing reads -> host oracle via the n_emit sentinel
    bad = (tie_row + overflow_row) > 0
    one_ref[:] = jnp.where(bad, _TIE_SENTINEL, n_emit_row)[:, None]

    # ---- assemble sort rows (slot-major concat; order irrelevant) ----
    h = jnp.concatenate(out_hi, axis=1)  # [RT, E*Wd]
    l_ = jnp.concatenate(out_lo, axis=1)
    if W_sort > E * Wd:
        pad = jnp.full((RT, W_sort - E * Wd), sent)
        h = jnp.concatenate([h, pad], axis=1)
        l_ = jnp.concatenate([l_, pad], axis=1)

    # ---- bitonic dedup (pallas_sort network) + uniq + wyhash ----
    h, l_ = _bitonic_body(h, l_)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W_sort), 1)
    prev_h = pltpu.roll(h, 1, axis=1)
    prev_l = pltpu.roll(l_, 1, axis=1)
    is_sent = (h == sent) & (l_ == sent)
    uniq = ((h != prev_h) | (l_ != prev_l) | (lane == 0)) & ~is_sent
    onu_ref[:] = jnp.sum(uniq, axis=1, dtype=jnp.int32)[:, None]
    hh, ll = wyhash64(h[:, :hcap_k], l_[:, :hcap_k])
    ohi_ref[:] = hh
    olo_ref[:] = ll
    ouq_ref[:] = uniq[:, :hcap_k]


def _read_tile(Wd: int, W_sort: int, R: int) -> int:
    """Read rows per grid cell.  Scoped-VMEM stack per row is dominated
    by the [RT, W_sort] sort/compaction scratch, not the [RT, Wd] phase
    arrays — measured 23.3 MB at (RT=64, Wd=512, W_sort=2048), i.e.
    ~364 KB/row, which blew the 16 MB scoped limit on the L=8192 read
    bucket (the old Wd-only heuristic kept RT=64 there).  Model each
    row at 64*Wd + 150*W_sort bytes and target ~11 MB so long-read
    buckets (ONT mixes reach L_CAP=32768) compile with headroom."""
    per_row = 64 * Wd + 150 * W_sort
    rt = (11_000_000 // max(1, per_row)) // 8 * 8
    return max(8, min(64, rt, R))


@functools.partial(jax.jit,
                   static_argnames=("k", "s", "t", "hcap", "interpret"))
def syncmer_hashes_fused(packed_reads, lengths, k: int, s: int, t: int,
                         hcap: int, interpret: bool = False):
    """2-bit packed reads -> (hi, lo, valid, n_unique, n_emit): the
    wyhashed sorted-unique open-canonical-syncmer k-mers per read, one
    Pallas kernel.  Drop-in for syncmer_kmers + dedup_kmers + wyhash64
    in the fused e2e step; reads whose tracker state is history-
    dependent (tied window minima) or whose emissions overflow the
    compaction return n_emit = 2^30 so callers fall back to the host
    oracle (same route as capacity overflow)."""
    from ..hash.device_syncmer import _stream_words

    R = packed_reads.shape[0]
    L = packed_reads.shape[1] * 4
    Wd = L // 16
    gap = emission_min_gap(k, s, t)
    E = (16 - 1) // max(1, gap) + 1

    words = _stream_words(packed_reads)  # [R, Wd] u32
    # The per-phase [RT, Wd] arrays MUST span >= 128 lanes (one full
    # vreg row): at Wd == 64 the compiled kernel (Mosaic on TPU and the
    # pallas CPU pipeline alike, identical wrong bits on both) corrupts
    # a sparse subset of lanes in the roll+funnel-shift chains that
    # interpret mode computes correctly — found by the bench parity
    # gate at the L=1024 read bucket, minimized in tools/debug_min.py.
    # Zero-padding the word stream to 128 lanes sidesteps the sub-vreg
    # layouts entirely; padded positions sit beyond every read's length
    # and are gated by pos_valid, and the circular rolls only ever wrap
    # padding into positions that are themselves gated.
    if Wd < 128:
        words = jnp.pad(words, ((0, 0), (0, 128 - Wd)))
        Wd = 128
    W_sort = max(128, _next_pow2(E * Wd))
    hcap_k = min(hcap, W_sort)
    RT = _read_tile(Wd, W_sort, R)
    rpad = (-R) % RT
    if rpad:
        words = jnp.pad(words, ((0, rpad), (0, 0)))
        lengths = jnp.pad(lengths, (0, rpad))
    Rp = R + rpad
    row = lambda r: (r, 0)  # noqa: E731
    outs = pl.pallas_call(
        functools.partial(_extract_kernel, k, s, t, E, W_sort, hcap_k),
        grid=(Rp // RT,),
        in_specs=[
            pl.BlockSpec((RT, Wd), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 1), row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RT, hcap_k), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, hcap_k), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, hcap_k), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 1), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rp, hcap_k), jnp.uint32),
            jax.ShapeDtypeStruct((Rp, hcap_k), jnp.uint32),
            jax.ShapeDtypeStruct((Rp, hcap_k), jnp.bool_),
            jax.ShapeDtypeStruct((Rp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Rp, 1), jnp.int32),
        ],
        interpret=interpret,
    )(words, lengths.astype(jnp.int32)[:, None])
    ohi, olo, ouq, onu, one = outs
    ohi, olo, ouq = ohi[:R], olo[:R], ouq[:R]
    if hcap_k < hcap:
        pad = ((0, 0), (0, hcap - hcap_k))
        ohi = jnp.pad(ohi, pad)
        olo = jnp.pad(olo, pad)
        ouq = jnp.pad(ouq, pad, constant_values=False)
    return ohi, olo, ouq, onu[:R, 0], one[:R, 0]
