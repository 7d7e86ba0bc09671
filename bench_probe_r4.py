"""Round-4 probe-kernel experiments (real chip).

Questions this answers (feeds PHASES_r04.md and the round-4 kernel
decisions):

  1. `vpux{2,4,8}`: does the VLIW have FREE VECTOR SLOTS under the
     scalar-bound probe loop?  p16 + N extra dependent vector ops per
     hash, seeded from the probe data (no const-folding).  If vpux8 ==
     p16, extraction (~6 vector ops/hash worth of work) can hide inside
     the probe loop and the fused extract+probe kernel is worth
     building; if it slows 1:1 there is no slack and the VERDICT's ~5 ms
     fusion estimate is refuted by measurement.
  2. `p10`: block-relative 10-bit positions, ONE pos word per hash plus
     a fingerprint word shared by 4 hashes (1.25 SMEM reads/hash vs
     p16's 2, at +4 scalar ALU).  PHASES_r03 predicted breakeven from
     the 3.3 ns/read + 0.76 ns/ALU model; this measures it.
  3. `x2`: two reads interleaved per loop body (4 hashes each on
     separate sublane halves) — independent metadata chains.  If the
     12.9 ns/hash floor contains load-to-use STALLS, doubling the
     independent chains shrinks it; if it is pure issue cost, no
     change.
  4. `smemflood`: scalar-only loop of SMEM reads — the marginal
     per-read cost with zero vector work, pinning the 3.3 ns/read
     number.

All timing modes compute the REAL probe workload (same positions /
fingerprints); p10 is checked for count parity against p16 before
timing.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from profile_phases import timed
from taxor_tpu.device import pallas_probe as pp

U32 = jnp.uint32
LOW7 = pp._LOW7
SIGN = pp._SIGN
B0 = pp._B0
FLUSH = pp._FLUSH_BODIES

S1, BL = 2419, 806  # slots+sentinel, block length (bench geometry)
B4 = 128


def log(m):
    print(m, file=sys.stderr, flush=True)


def _swar(x):
    nz = ((x & LOW7) + LOW7) | x
    return jax.lax.shift_right_logical((~nz) & SIGN, 7)


def make_kernel(mode, U, nops=0):
    def kernel(pos_ref, cnt_ref, fp_ref, out_ref):
        RT = out_ref.shape[0]
        BT4 = out_ref.shape[2]
        H2 = pos_ref.shape[2]
        # p10 layout: [H/4 f-words | H pos-words]
        Hf = H2 * 1 // 5 if mode.startswith("p10") else 0

        def fetch_p16(r, h):
            w0 = pos_ref[r, 0, 2 * h]
            w1 = pos_ref[r, 0, 2 * h + 1]
            p0 = w0 & 0xFFFF
            p1 = jax.lax.shift_right_logical(w0, 16)
            p2 = w1 & 0xFFFF
            f4 = jax.lax.shift_right_logical(w1, 16) * 0x01010101
            return p0, p1, p2, f4

        def fetch_p10(r, h, fw, u):
            w = pos_ref[r, 0, Hf + h]
            p0 = w & 1023
            p1 = BL + (jax.lax.shift_right_logical(w, 10) & 1023)
            p2 = 2 * BL + jax.lax.shift_right_logical(w, 20)
            f4 = (jax.lax.shift_right_logical(fw, 8 * (u & 3))
                  & 0xFF) * 0x01010101
            return p0, p1, p2, f4

        if "x" in mode and mode[-1].isdigit() and mode not in ("p10",
                                                              "p16"):
            # NR reads per body, U//NR hashes each, on sublane groups
            p10 = mode.startswith("p10")
            NR = int(mode.rsplit("x", 1)[1])
            HB = U // NR  # hashes per read per body
            rows_per_body = NR * HB

            def read_body(rp, _):
                rs = [NR * rp + i for i in range(NR)]
                nb = cnt_ref[rs[0], 0, 0]  # equal counts by construction

                def hash_body(hu, carry):
                    packed, d1, d2 = carry
                    rows = []
                    for r in rs:
                        fw = [jnp.int32(0)]
                        for u in range(HB):
                            h = hu * HB + u
                            if p10:
                                if u % 4 == 0:
                                    fw[0] = pos_ref[r, 0, h >> 2]
                                p0, p1, p2, f4 = fetch_p10(
                                    r, h, fw[0], u)
                            else:
                                p0, p1, p2, f4 = fetch_p16(r, h)
                            rows.append((fp_ref[p0, :] ^ fp_ref[p1, :]
                                         ^ fp_ref[p2, :] ^ f4)[None, :])
                    x = jnp.concatenate(rows, axis=0)
                    if nops:
                        for i in range(nops * U // 4):
                            d1 = (d1 ^ x) + jnp.int32(-1640531527)
                            d2 = (d2 + x) ^ jnp.int32(-2048144789)
                    return (packed + _swar(x), d1, d2)

                def chunk_body(ci, accs):
                    parts, d1, d2 = accs
                    lo = ci * FLUSH
                    hi = jnp.minimum(nb, lo + FLUSH)
                    packed, d1, d2 = jax.lax.fori_loop(
                        lo, hi, hash_body,
                        (jnp.zeros((rows_per_body, BT4), jnp.int32),
                         d1, d2))
                    out = []
                    for i in range(NR):
                        p = packed[i * HB : (i + 1) * HB]
                        out.append(parts[i] + jnp.sum(p & B0, axis=0)
                                   + jnp.sum(jax.lax.shift_right_logical(
                                       p, 8) & B0, axis=0))
                    return (tuple(out), d1, d2)

                zero = jnp.zeros((BT4,), jnp.int32)
                dz = jnp.zeros((rows_per_body, BT4), jnp.int32)
                nc = (nb + FLUSH - 1) // FLUSH
                parts, d1, d2 = jax.lax.fori_loop(
                    0, nc, chunk_body,
                    (tuple(zero for _ in range(NR)), dz, dz))
                for i, r in enumerate(rs):
                    if nops and i == 0:
                        out_ref[r, 0, :] = parts[i] + jnp.sum(
                            jax.lax.shift_right_logical(d1 ^ d2, 31),
                            axis=0)
                    else:
                        out_ref[r, 0, :] = parts[i]
                return 0

            jax.lax.fori_loop(0, RT // NR, read_body, 0)
            return

        def read_body(r, _):
            nb = cnt_ref[r, 0, 0]

            def hash_body(hu, carry):
                packed, d1, d2 = carry
                rows = []
                fw = [jnp.int32(0)]
                for u in range(U):
                    h = hu * U + u
                    if mode.startswith("p10"):
                        if u % 4 == 0:
                            fw[0] = pos_ref[r, 0, (hu * U + u) >> 2]
                        p0, p1, p2, f4 = fetch_p10(r, h, fw[0], u)
                    else:
                        p0, p1, p2, f4 = fetch_p16(r, h)
                    rows.append((fp_ref[p0, :] ^ fp_ref[p1, :]
                                 ^ fp_ref[p2, :] ^ f4)[None, :])
                x = jnp.concatenate(rows, axis=0)
                if nops:
                    # dependent-but-independent-chain dummy vector work
                    # seeded from x (not const-foldable); 2 chains
                    for i in range(nops * U // 4):  # 4 vec ops/iter
                        d1 = (d1 ^ x) + jnp.int32(-1640531527)
                        d2 = (d2 + x) ^ jnp.int32(-2048144789)
                return (packed + _swar(x), d1, d2)

            def chunk_body(ci, accs):
                a0, a1, a2, a3, d1, d2 = accs
                lo = ci * FLUSH
                hi = jnp.minimum(nb, lo + FLUSH)
                packed, d1, d2 = jax.lax.fori_loop(
                    lo, hi, hash_body,
                    (jnp.zeros((U, BT4), jnp.int32), d1, d2))
                a0 = a0 + jnp.sum(packed & B0, axis=0)
                a1 = a1 + jnp.sum(
                    jax.lax.shift_right_logical(packed, 8) & B0, axis=0)
                a2 = a2 + jnp.sum(
                    jax.lax.shift_right_logical(packed, 16) & B0, axis=0)
                a3 = a3 + jnp.sum(
                    jax.lax.shift_right_logical(packed, 24), axis=0)
                return (a0, a1, a2, a3, d1, d2)

            zero = jnp.zeros((BT4,), jnp.int32)
            dz = jnp.zeros((U, BT4), jnp.int32)
            nc = (nb + FLUSH - 1) // FLUSH
            a0, a1, a2, a3, d1, d2 = jax.lax.fori_loop(
                0, nc, chunk_body, (zero, zero, zero, zero, dz, dz))
            out_ref[r, 0, :] = a0
            out_ref[r, 1, :] = a1
            out_ref[r, 2, :] = a2
            if nops:  # consume the dummy chains so they cannot be DCE'd
                out_ref[r, 3, :] = a3 + jnp.sum(
                    jax.lax.shift_right_logical(d1 ^ d2, 31), axis=0)
            else:
                out_ref[r, 3, :] = a3
            return 0

        jax.lax.fori_loop(0, RT, read_body, 0)

    return kernel


def make_smemflood(K):
    """Scalar-only loop: K SMEM reads + adds per body."""
    def kernel(pos_ref, cnt_ref, fp_ref, out_ref):
        RT = out_ref.shape[0]

        def read_body(r, _):
            nb = cnt_ref[r, 0, 0]

            def body(h, acc):
                s = acc
                for u in range(K):
                    s = s + pos_ref[r, 0, (K * h + u) & 1023]
                return s

            acc = jax.lax.fori_loop(0, nb, body, jnp.int32(0))
            z = jnp.zeros((out_ref.shape[2],), jnp.int32)
            out_ref[r, 0, :] = z + acc
            out_ref[r, 1, :] = z
            out_ref[r, 2, :] = z
            out_ref[r, 3, :] = z
            return 0

        jax.lax.fori_loop(0, RT, read_body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "U", "RT", "bt4",
                                             "nops"))
def call(fp, posp, bodies, mode, U, RT, bt4, nops=0):
    R, _, H2 = posp.shape
    S1_, B4_ = fp.shape
    kern = (make_smemflood(U) if mode == "smemflood"
            else make_kernel(mode, U, nops))
    out = pl.pallas_call(
        kern,
        grid=(B4_ // bt4, R // RT),
        in_specs=[
            pl.BlockSpec((RT, 1, H2), lambda j, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RT, 1, 1), lambda j, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((S1_, bt4), lambda j, r: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RT, 4, bt4), lambda j, r: (r, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 4, B4_), jnp.int32),
    )(posp, bodies, fp)
    return out


def main():
    rng = np.random.default_rng(0)
    R, H = 8192, 512
    nvalid = 173
    fp = rng.integers(-2**31, 2**31, (S1, B4)).astype(np.int32)
    fp[-1] = 0
    # block-structured positions (as production): p_i in block i
    off = rng.integers(0, BL, (R, H, 3)).astype(np.int32)
    pos = off + np.array([0, BL, 2 * BL], dtype=np.int32)
    f4 = rng.integers(0, 256, (R, H)).astype(np.int32)

    posp16 = np.empty((R, H, 2), dtype=np.int32)
    posp16[..., 0] = pos[..., 0] | (pos[..., 1] << 16)
    posp16[..., 1] = pos[..., 2] | (f4 << 16)
    posp16 = posp16.reshape(R, 1, H * 2)

    # p10 layout: [H/4 f-words | H packed-offset words]
    p10w = off[..., 0] | (off[..., 1] << 10) | (off[..., 2] << 20)
    fword = (f4.reshape(R, H // 4, 4)
             * (1 << (8 * np.arange(4, dtype=np.int64)))).sum(
                 axis=2).astype(np.int64).astype(np.uint32)
    posp10 = np.concatenate(
        [fword.view(np.int32), p10w], axis=1).reshape(R, 1, H + H // 4)

    fpd = jax.device_put(jnp.asarray(fp))
    log(f"backend={jax.default_backend()}  R={R} H={H} valid={nvalid} "
        f"hashes={R*nvalid/1e6:.2f}M")

    d16 = jax.device_put(jnp.asarray(posp16))
    d10 = jax.device_put(jnp.asarray(posp10))

    def bodies_for(U):
        b = np.full((R, 1, 1), (nvalid + U - 1) // U, np.int32)
        return jax.device_put(jnp.asarray(b))

    # -- parity check p10 vs p16 on a slice ------------------------------
    o16 = np.asarray(call(fpd, d16[:64], bodies_for(8)[:64], "p16", 8,
                          16, B4))
    o10 = np.asarray(call(fpd, d10[:64], bodies_for(8)[:64], "p10", 8,
                          16, B4))
    same = bool((o16[:, :3] == o10[:, :3]).all()
                and (o16[:, 3] == o10[:, 3]).all())
    log(f"p10 == p16 counts: {same}")
    assert same

    runs = [
        ("p16", 8, 16, d16, 0),
        ("p10", 8, 16, d10, 0),
        ("p10", 8, 32, d10, 0),
        ("x2", 8, 16, d16, 0),
        ("vpux2", 8, 16, d16, 2),
        ("vpux4", 8, 16, d16, 4),
        ("vpux8", 8, 16, d16, 8),
        ("smemflood", 2, 16, d16, 0),
        ("smemflood", 4, 16, d16, 0),
        ("smemflood", 8, 16, d16, 0),
    ] if "--r1" in sys.argv else [
        ("p10", 16, 16, d10, 0),   # deeper unroll amortizes loop
        ("p10x2", 8, 16, d10, 0),  # p10 + two-read interleave
        ("p10", 8, 16, d10, 2),    # p10 with free-slot vector work
    ] if "--r2" in sys.argv else [
        ("p10x2", 8, 16, d10, 0),   # control (7.19 in r2)
        ("p10x4", 8, 16, d10, 0),   # 4 reads x 2 hashes
        ("p10x2", 16, 16, d10, 0),  # 2 reads x 8 hashes (2-vreg SWAR)
        ("p10x2", 8, 16, d10, 2),   # vector-slack under the new floor
        ("p10x2", 8, 16, d10, 4),
        ("p16x2", 8, 16, d16, 0),   # re-measure (12.29 in r1)
    ]
    for mode, U, RT, pdat, nops in runs:
        if "x" in mode and mode[-1].isdigit():
            b = bodies_for(U // int(mode.rsplit("x", 1)[1]))
        else:
            b = bodies_for(U)
        if mode == "smemflood":
            b = jax.device_put(jnp.asarray(
                np.full((R, 1, 1), nvalid, np.int32)))
        t = timed(lambda p, bb: call(fpd, p, bb, mode, U, RT, B4, nops),
                  pdat, b)
        denom = R * nvalid * (U if mode == "smemflood" else 1)
        unit = "ns/read" if mode == "smemflood" else "ns/hash"
        log(f"{mode:10s} U={U:2d} RT={RT:2d} nops={nops}  "
            f"{t*1e3:8.2f} ms ({t*1e9/denom:5.2f} {unit})")


if __name__ == "__main__":
    main()
