"""Open canonical syncmer extraction ON DEVICE (TPU).

The search path reads bases through dna4 traits (ambiguity -> A,
src/main/taxor_search.cpp:181), so the scanner has NO N-resets — which
makes the state machine mostly position-parallel:

  - 2-bit rolling k-mer/s-mer values on both strands are ordinary
    sliding-window polynomials -> computed for EVERY position with s (resp.
    2k) shifted adds over the [R, L] base matrix (VPU-wide, no scan),
  - only the window-minimum tracker is genuinely sequential: the
    reference keeps a stateful minimum with hysteresis (leftmost min on
    the first window; on evicting the tracked min, recompute as the
    RIGHTMOST min; ties never displace the holder —
    src/hashing/syncmer.cpp:109-146).  That tracker is not a pure
    function of the current window, so it runs as a lax.scan over base
    positions carrying only (qmin_val u32, qmin_pos i32) per read —
    ~40 vector ops per step on [R]-wide lanes,
  - emitted canonical k-mers hash via the bit-exact device wyhash64
    (utils/u64jnp.py), then a 2-key lexicographic sort per read
    deduplicates (the reference returns a hash SET,
    syncmer.cpp:157-165) and compacts valid hashes to a prefix.

Upload per read: L/4 bytes of 2-bit packed bases (+1 length) — ~8x less
than shipping extracted hashes; the ~130 MB/s host->device tunnel link
is the end-to-end bottleneck, so bytes on the wire dominate the design.

Restrictions (callers fall back to the host scanner otherwise):
s <= 15 (s-mer fits uint32), k <= 32, scaling == 1, dna4 search
semantics.  Build-time counting keeps the host dna5 path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.u64jnp import wyhash64
from .encode import encode_dna4

U32 = jnp.uint32
_UMAX32 = 0xFFFFFFFF

# reads longer than this use the host scanner (segmentation on device
# would break per-read dedup across segments)
L_CAP = 8192
BASES_PER_WORD = 16


def supports(scheme) -> bool:
    """Whether the device extractor covers this hash scheme."""
    return (
        scheme.use_syncmer
        and scheme.scaling == 1
        and 2 <= scheme.syncmer_size <= 15
        and scheme.syncmer_size < scheme.kmer_size <= 32
    )


def pad_len_bucket(max_len: int) -> int:
    """Power-of-two length bucket (>= 256) to bound recompilation."""
    return max(256, 1 << (int(max_len) - 1).bit_length())


def hash_cap(L: int) -> int:
    """Static per-read hash capacity for length bucket L.  Open-syncmer
    density is ~2/(k-s+1) (< 1/4 for every valid even-k/even-s config);
    reads denser than this (adversarial) are detected via the device
    hash count and fall back to the host oracle."""
    return max(128, L // 4)


def pack_reads(seqs: list[bytes], L: int):
    """2-bit pack a read batch, 4 bases per byte.

    Returns (packed uint8 [R, L/4] with base i at bits 2*(i%4) of byte
    i//4, lengths int32 [R]).  The tunnel-attached TPU's host->device
    link is the e2e bottleneck (~130 MB/s cold), so bases ship 2-bit
    packed; the pack itself is branch-free u8 arithmetic + strided ORs
    (a reduction-based 16-per-word packer cost 20x more than this on the
    2-core host).  dna4 semantics: A/a->0 C/c->1 G/g->2 T/t/U/u->3,
    everything else (incl. N) -> A, via y=(c>>1)&3 then y^(y>>1) with a
    whitelist mask (matches encode_dna4)."""
    R = len(seqs)
    lengths = np.fromiter((min(len(s), L) for s in seqs), dtype=np.int64,
                          count=R)
    from ..native import get_lib

    lib = get_lib()
    if lib is not None:
        import ctypes

        packed = np.zeros((R, L // 4), dtype=np.uint8)
        ptrs = (ctypes.c_char_p * R)(*seqs)
        lib.pack_reads_2bit(
            ptrs, lengths.ctypes.data_as(ctypes.c_void_p), R, L,
            packed.ctypes.data_as(ctypes.c_void_p),
        )
        return packed, lengths.astype(np.int32)
    # numpy fallback (no compiler): branch-free u8 arithmetic
    buf = np.zeros((R, L), dtype=np.uint8)
    for r, s in enumerate(seqs):
        n = int(lengths[r])
        buf[r, :n] = np.frombuffer(s, dtype=np.uint8, count=n)
    upper = buf & np.uint8(0xDF)  # fold lowercase
    valid = (
        (upper == 65) | (upper == 67) | (upper == 71)
        | (upper == 84) | (upper == 85)
    )
    y = (buf >> np.uint8(1)) & np.uint8(3)
    code = (y ^ (y >> np.uint8(1))) & (valid * np.uint8(3))
    packed = (
        code[:, 0::4]
        | (code[:, 1::4] << np.uint8(2))
        | (code[:, 2::4] << np.uint8(4))
        | (code[:, 3::4] << np.uint8(6))
    )
    return packed, lengths.astype(np.int32)


def _codes_from_packed(packed):
    """uint8 [R, L/4] (pack_reads) -> uint32 [R, L] codes in {0..3}."""
    R, W = packed.shape
    p = packed.astype(jnp.uint32)
    shifts = (2 * jnp.arange(4, dtype=jnp.uint32))[None, None, :]
    codes = (p[:, :, None] >> shifts) & jnp.uint32(3)
    return codes.reshape(R, W * 4)


def _rolling_smers(codes, s: int):
    """Canonical s-mer value ending at each position (junk for i < s-1).

    fwd[i] = sum_j codes[i-s+1+j] << 2(s-1-j);  rev = complement rolled
    the other way (syncmer.cpp:97-104).  s <= 15 so values fit uint32."""
    L = codes.shape[1]
    fwd = jnp.zeros_like(codes)
    rev = jnp.zeros_like(codes)
    for j in range(s):
        # base at offset j of the s-mer ending at i sits at i-(s-1)+j
        shifted = jnp.roll(codes, s - 1 - j, axis=1)
        fwd = fwd | (shifted << jnp.uint32(2 * (s - 1 - j)))
        rev = rev | ((jnp.uint32(3) - shifted) << jnp.uint32(2 * j))
    return jnp.minimum(fwd, rev)


def _rolling_kmers(codes, k: int):
    """Canonical k-mer (hi, lo) uint32 pairs ending at each position
    (junk for i < k-1).  k <= 32 -> 2k bits across the pair."""
    zeros = jnp.zeros_like(codes)
    fhi, flo = zeros, zeros
    rhi, rlo = zeros, zeros
    for j in range(k):
        shifted = jnp.roll(codes, k - 1 - j, axis=1)
        comp = jnp.uint32(3) - shifted
        bit = 2 * (k - 1 - j)
        if bit < 32:
            flo = flo | (shifted << jnp.uint32(bit))
        if bit >= 30:  # straddles or sits in the high word
            if bit >= 32:
                fhi = fhi | (shifted << jnp.uint32(bit - 32))
            else:
                fhi = fhi | (shifted >> jnp.uint32(32 - bit))
        rbit = 2 * j
        if rbit < 32:
            rlo = rlo | (comp << jnp.uint32(rbit))
        if rbit >= 30:
            if rbit >= 32:
                rhi = rhi | (comp << jnp.uint32(rbit - 32))
            else:
                rhi = rhi | (comp >> jnp.uint32(32 - rbit))
    # canonical = unsigned 64-bit min
    f_less = (fhi < rhi) | ((fhi == rhi) & (flo < rlo))
    chi = jnp.where(f_less, fhi, rhi)
    clo = jnp.where(f_less, flo, rlo)
    return chi, clo


# scan steps unrolled per lax.scan iteration: the min tracker does ~40
# vector ops on [R]-wide lanes per base, so per-iteration overhead (HBM
# dynamic slice + loop bookkeeping) dominates an un-chunked scan
_SCAN_CHUNK = 16


@functools.partial(jax.jit, static_argnames=("k", "s", "t"))
def syncmer_kmers(packed_reads, lengths, k: int, s: int, t: int):
    """Emission mask + canonical k-mer value for every base position.

    Returns (khi, klo uint32 [R, L], emit bool [R, L]) where emit[r, i]
    marks an open-syncmer k-mer ending at base i.  Bit-equal to the host
    scanner (hash/syncmer.py) under dna4 codes — hashes are NOT applied
    here so callers can dedup on raw k-mers first (cheaper: the wyhash
    runs on the compacted [R, hcap] slice, not all L positions)."""
    w = k - s + 1
    codes = _codes_from_packed(packed_reads)
    R, L = codes.shape
    ys = _rolling_smers(codes, s)  # [R, L] canonical smers (end-indexed)
    khi, klo = _rolling_kmers(codes, k)

    ys_t = ys.T  # [L, R]: scan axis leading
    # pad so the last chunk's dynamic_slice never clamps (clamping would
    # shift the window of the real trailing positions); padded rows are
    # only touched by overrun steps whose emits are discarded
    ys_t = jnp.concatenate(
        [ys_t, jnp.full((_SCAN_CHUNK, R), _UMAX32, dtype=jnp.uint32)]
    )

    # first full window: k-mer ends at i0 = k-1; ordered s-mers end at
    # s-1 .. k-1.  Leftmost minimum, strict < (syncmer.cpp:120-126).
    lmv = jnp.full((R,), _UMAX32, dtype=jnp.uint32)
    lmj = jnp.zeros((R,), dtype=jnp.int32)
    for j in range(w):
        take = ys_t[s - 1 + j] < lmv
        lmv = jnp.where(take, ys_t[s - 1 + j], lmv)
        lmj = jnp.where(take, jnp.int32(j), lmj)
    qmin_val0 = lmv
    qmin_pos0 = lmj  # absolute smer start = (k-1)-k+1+j = j
    emit0 = qmin_pos0 == jnp.int32(t - 1)  # i0-k+t = t-1

    def substep(carry, win, i):
        """One base position: window = smers ending at i-w+1 .. i
        ([w, R] static slice of the chunk)."""
        qmin_val, qmin_pos = carry
        ys_new = win[w - 1]
        popped = qmin_pos == (i - k)  # the evicted smer held the min
        # rightmost minimum, strict < scanning right-to-left
        # (syncmer.cpp:128-136)
        rmv = jnp.full((R,), _UMAX32, dtype=jnp.uint32)
        rmj = jnp.zeros((R,), dtype=jnp.int32)
        for j in range(w - 1, -1, -1):
            take = win[j] < rmv
            rmv = jnp.where(take, win[j], rmv)
            rmj = jnp.where(take, jnp.int32(j), rmj)
        newer = (~popped) & (ys_new < qmin_val)
        qmin_val = jnp.where(popped, rmv,
                             jnp.where(newer, ys_new, qmin_val))
        qmin_pos = jnp.where(popped, i - k + 1 + rmj,
                             jnp.where(newer, i - s + 1, qmin_pos))
        emit_i = qmin_pos == (i - k + t)
        return (qmin_val, qmin_pos), emit_i

    CH = _SCAN_CHUNK

    def chunk_step(carry, i0):
        # one HBM slice per chunk; the CH inner steps use static slices
        blk = jax.lax.dynamic_slice(ys_t, (i0 - w + 1, 0), (CH + w - 1, R))
        emits = []
        for c in range(CH):
            carry, e = substep(carry, blk[c : c + w], i0 + c)
            emits.append(e)
        return carry, jnp.stack(emits)  # [CH, R]

    n_steps = max(0, L - k)
    if n_steps:
        nb = (n_steps + CH - 1) // CH
        # overrun steps read clamped slices (garbage) — their emits are
        # sliced away below and they only run after all real positions,
        # so the carry they corrupt is never used
        starts = k + CH * jnp.arange(nb, dtype=jnp.int32)
        (_, _), emits = jax.lax.scan(
            chunk_step, (qmin_val0, qmin_pos0), starts
        )  # [nb, CH, R]
        emits = emits.reshape(nb * CH, R)[:n_steps]
        emit = jnp.concatenate([emit0[None, :], emits], axis=0).T
    else:
        emit = emit0[:, None]
    # align: emit[:, j] corresponds to k-mer ending at base k-1+j
    pad = jnp.zeros((R, k - 1), dtype=bool)
    emit = jnp.concatenate([pad, emit], axis=1)[:, :L]
    # gate by read length (bases beyond the read are A-padding)
    emit = emit & (jnp.arange(L, dtype=jnp.int32)[None, :]
                   < lengths[:, None])
    return khi, klo, emit


@functools.partial(jax.jit, static_argnames=("k", "s", "t"))
def syncmer_emit(packed_reads, lengths, k: int, s: int, t: int):
    """syncmer_kmers + wyhash64 per position: (h_hi, h_lo, emit)."""
    khi, klo, emit = syncmer_kmers(packed_reads, lengths, k, s, t)
    h_hi, h_lo = wyhash64(khi, klo)
    return h_hi, h_lo, emit


@functools.partial(jax.jit, static_argnames=("hcap",))
def dedup_kmers(khi, klo, emit, hcap: int):
    """Sort each read's emitted CANONICAL K-MERS, mask duplicates, slice
    to [R, hcap].  Returns (khi, klo, valid, n_unique, n_emit).

    Dedup runs on raw k-mer values, before hashing: (1) the all-ones
    sentinel is collision-free — a canonical k-mer can never be 2^64-1
    (that would need fwd == rev == all-T, but rev(all-T) == all-A), so
    unlike hash-space dedup there is no sentinel divergence; (2) the
    wyhash then only runs on the hcap-wide slice.  Unlike dedup_sorted
    there is NO compaction sort: duplicates stay interleaved with a
    False valid bit — the probe kernel sentinel-probes them for free
    (pallas_probe._body_counts uses the last-true position).  The
    reference dedups on hash values (syncmer.cpp:160); k-mer dedup
    differs only if two distinct k-mers wyhash-collide (~2^-64/pair).

    n_emit is the pre-dedup emission count: n_emit > hcap means unique
    k-mers may sit beyond the slice, so callers must fall back to the
    host oracle for that read (n_unique alone can miss truncation —
    duplicates can push uniques past hcap)."""
    sent = jnp.uint32(_UMAX32)
    shi = jnp.where(emit, khi, sent)
    slo = jnp.where(emit, klo, sent)
    shi, slo = jax.lax.sort((shi, slo), dimension=1, num_keys=2)
    prev_hi = jnp.concatenate([~shi[:, :1], shi[:, :-1]], axis=1)
    prev_lo = jnp.concatenate([~slo[:, :1], slo[:, :-1]], axis=1)
    is_sent = (shi == sent) & (slo == sent)
    uniq = ((shi != prev_hi) | (slo != prev_lo)) & ~is_sent
    n_unique = uniq.sum(axis=1, dtype=jnp.int32)
    n_emit = emit.sum(axis=1, dtype=jnp.int32)
    return (shi[:, :hcap], slo[:, :hcap], uniq[:, :hcap],
            n_unique, n_emit)


@functools.partial(jax.jit, static_argnames=("hcap",))
def dedup_sorted(h_hi, h_lo, emit, hcap: int):
    """Sort each read's emitted hashes, mask duplicates, compact to a
    [R, hcap] prefix.  Returns (hi, lo, valid, n_unique)."""
    sent = jnp.uint32(_UMAX32)
    shi = jnp.where(emit, h_hi, sent)
    slo = jnp.where(emit, h_lo, sent)
    shi, slo = jax.lax.sort((shi, slo), dimension=1, num_keys=2)
    prev_hi = jnp.concatenate([~shi[:, :1], shi[:, :-1]], axis=1)
    prev_lo = jnp.concatenate([~slo[:, :1], slo[:, :-1]], axis=1)
    is_sent = (shi == sent) & (slo == sent)
    uniq = ((shi != prev_hi) | (slo != prev_lo)) & ~is_sent
    # sentinel collision guard: a real hash equal to UMAX64 is dropped by
    # the mask above; the reference cannot distinguish it either (it
    # would hash-collide with the empty sentinel probability ~2^-64) —
    # accepted divergence, documented in DIVERGENCES.md.
    n_unique = uniq.sum(axis=1, dtype=jnp.int32)
    # duplicates sit between uniques after the sort; compact uniques to a
    # prefix with a stable sort on the inverted mask (scatter is slow on
    # TPU, a second sort is not)
    key = (~uniq).astype(jnp.uint8)
    _, chi, clo = jax.lax.sort((key, shi, slo), dimension=1, num_keys=1,
                               is_stable=True)
    out_hi = chi[:, :hcap]
    out_lo = clo[:, :hcap]
    valid = (jnp.arange(hcap, dtype=jnp.int32)[None, :]
             < jnp.minimum(n_unique, hcap)[:, None])
    return out_hi, out_lo, valid, n_unique
