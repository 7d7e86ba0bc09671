"""64-bit hash math on device as (hi, lo) uint32 pairs.

TPUs have no native 64-bit integers; Pallas refuses them outright and XLA
emulates them slowly.  The probe-position math (murmur mix + rotations +
Lemire reduce, utils/u64np.py) only needs a handful of 64-bit ops, all
expressible in uint32 pairs with 16-bit limb products for the widening
multiplies.  Bit-exact against the numpy uint64 reference (tested).
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32
_MASK16 = jnp.uint32(0xFFFF)

_M1_HI = jnp.uint32(0xFF51AFD7)
_M1_LO = jnp.uint32(0xED558CCD)
_M2_HI = jnp.uint32(0xC4CEB9FE)
_M2_LO = jnp.uint32(0x1A85EC53)


def umul32_full(a, b):
    """(hi, lo) of the 64-bit product of two uint32 arrays."""
    a = a.astype(U32)
    b = b.astype(U32)
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> 16) + (p01 & _MASK16) + (p10 & _MASK16)
    lo = (p00 & _MASK16) | (mid << 16)
    hi = p11 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
    return hi, lo


def add64(ahi, alo, bhi, blo):
    lo = alo + blo
    carry = (lo < alo).astype(U32)
    hi = ahi + bhi + carry
    return hi, lo


def mul64_lo(ahi, alo, bhi, blo):
    """Low 64 bits of a 64x64 product as a (hi, lo) pair."""
    hi0, lo = umul32_full(alo, blo)
    hi = hi0 + alo * bhi + ahi * blo  # wrapping uint32 products
    return hi, lo


def xor64(ahi, alo, bhi, blo):
    return ahi ^ bhi, alo ^ blo


def shr64(ahi, alo, s: int):
    """Logical right shift by a static amount."""
    if s == 0:
        return ahi, alo
    if s < 32:
        lo = (alo >> s) | (ahi << (32 - s))
        hi = ahi >> s
        return hi, lo
    if s == 32:
        return jnp.zeros_like(ahi), ahi
    return jnp.zeros_like(ahi), ahi >> (s - 32)


def rotl64(ahi, alo, s: int):
    s = s % 64
    if s == 0:
        return ahi, alo
    if s == 32:
        return alo, ahi
    if s < 32:
        hi = (ahi << s) | (alo >> (32 - s))
        lo = (alo << s) | (ahi >> (32 - s))
        return hi, lo
    return rotl64(alo, ahi, s - 32)


def murmur64(hi, lo):
    """murmur3 finalizer on (hi, lo) pairs (utils/u64np.murmur64)."""
    hi, lo = xor64(hi, lo, *shr64(hi, lo, 33))
    hi, lo = mul64_lo(hi, lo, _M1_HI, _M1_LO)
    hi, lo = xor64(hi, lo, *shr64(hi, lo, 33))
    hi, lo = mul64_lo(hi, lo, _M2_HI, _M2_LO)
    hi, lo = xor64(hi, lo, *shr64(hi, lo, 33))
    return hi, lo


def mix_split(khi, klo, seed_hi, seed_lo):
    """murmur64(key + seed) — the XOR-filter hash family."""
    hi, lo = add64(khi, klo, seed_hi, seed_lo)
    return murmur64(hi, lo)


def reduce32(r, n):
    """(uint32(r) * n) >> 32 with n a (traced or static) uint32 scalar."""
    hi, _ = umul32_full(r, n)
    return hi


def probe_positions_and_fprint4(khi, klo, seed_hi, seed_lo, block_length):
    """Device analog of ixf.compute_probes + fingerprint packing.

    Returns (pos int32 [..., 3], f4 int32 fingerprint replicated to all
    4 bytes) from uint32 hash pairs; block_length is a uint32 scalar
    (traced — one compilation serves every IXF geometry).
    """
    hi, lo = mix_split(khi, klo, seed_hi, seed_lo)
    bl = block_length.astype(U32)
    p0 = reduce32(lo, bl)
    h1hi, h1lo = rotl64(hi, lo, 21)
    p1 = reduce32(h1lo, bl) + bl
    h2hi, h2lo = rotl64(hi, lo, 42)
    p2 = reduce32(h2lo, bl) + bl + bl
    pos = jnp.stack(
        [p0.astype(jnp.int32), p1.astype(jnp.int32), p2.astype(jnp.int32)],
        axis=-1,
    )
    f = (hi ^ lo) & jnp.uint32(0xFF)
    f4 = (f * jnp.uint32(0x01010101)).astype(jnp.uint32)
    return pos, f4
