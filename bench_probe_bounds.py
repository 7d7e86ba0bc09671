"""Diagnostic bounds for the narrow probe kernel's scalar budget.

Each variant deliberately REMOVES part of the per-hash work to measure
its share of the 12.7 ns/hash floor (results feed PHASES_r03.md):

  p16      current production kernel (2 SMEM words/hash)
  load1    1 dynamic row load instead of 3 (wrong result; bounds the
           vector-load-issue share)
  nosmem   positions from a hoisted constant (wrong; bounds the SMEM
           read + unpack share)
  u16      production kernel with a 16-hash inner unroll
  rt64     production kernel with a 64-read tile
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


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_kernel(mode, U):
    LOW7 = pp._LOW7
    SIGN = pp._SIGN
    B0 = pp._B0
    FLUSH = pp._FLUSH_BODIES

    def kernel(pos_ref, cnt_ref, fp_ref, out_ref):
        RT = pos_ref.shape[0]
        BT4 = out_ref.shape[2]

        def read_body(r, _):
            nb = cnt_ref[r, 0, 0]

            def hash_body(hu, packed):
                rows = []
                for u in range(U):
                    h = hu * U + u
                    if mode == "nosmem":
                        p0, p1, p2 = 1 + u, 2 + u, 3 + u
                        f4 = 0x01010101
                    elif mode == "lcg":
                        # dynamic scalar positions, no SMEM: cost of
                        # dynamic addressing + a little ALU
                        z = (h * 40503 + r * 2057) & 0x7FF
                        p0 = z
                        p1 = (z + 7) & 0x7FF
                        p2 = (z + 13) & 0x7FF
                        f4 = 0x01010101
                    elif mode == "smem1":
                        # ONE SMEM word/hash; fake second/third rows
                        w0 = pos_ref[r, 0, 2 * h]
                        p0 = w0 & 0xFFFF
                        p1 = p0
                        p2 = jax.lax.shift_right_logical(w0, 16)
                        f4 = 0x01010101
                    else:
                        w0 = pos_ref[r, 0, 2 * h]
                        w1 = pos_ref[r, 0, 2 * h + 1]
                        p0 = w0 & 0xFFFF
                        p1 = jax.lax.shift_right_logical(w0, 16)
                        p2 = w1 & 0xFFFF
                        f4 = jax.lax.shift_right_logical(w1, 16) \
                            * 0x01010101
                    if mode == "load1":
                        x = fp_ref[p0, :] ^ f4
                    else:
                        x = (fp_ref[p0, :] ^ fp_ref[p1, :]
                             ^ fp_ref[p2, :] ^ f4)
                    rows.append(x[None, :])
                x = jnp.concatenate(rows, axis=0)
                nz = ((x & LOW7) + LOW7) | x
                hits = jax.lax.shift_right_logical((~nz) & SIGN, 7)
                return packed + hits

            def chunk_body(ci, accs):
                a0, a1, a2, a3 = accs
                lo = ci * FLUSH
                hi = jnp.minimum(nb, lo + FLUSH)
                packed = jax.lax.fori_loop(
                    lo, hi, hash_body, jnp.zeros((U, BT4), jnp.int32))
                a0 = a0 + jnp.sum(packed & B0, axis=0)
                a1 = a1 + jnp.sum(
                    jax.lax.shift_right_logical(packed, 8) & B0, axis=0)
                a2 = a2 + jnp.sum(
                    jax.lax.shift_right_logical(packed, 16) & B0, axis=0)
                a3 = a3 + jnp.sum(
                    jax.lax.shift_right_logical(packed, 24), axis=0)
                return (a0, a1, a2, a3)

            zero = jnp.zeros((BT4,), jnp.int32)
            nc = (nb + FLUSH - 1) // FLUSH
            a0, a1, a2, a3 = jax.lax.fori_loop(
                0, nc, chunk_body, (zero, zero, zero, zero))
            out_ref[r, 0, :] = a0
            out_ref[r, 1, :] = a1
            out_ref[r, 2, :] = a2
            out_ref[r, 3, :] = a3
            return 0

        jax.lax.fori_loop(0, pos_ref.shape[0], read_body, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("mode", "U", "RT", "bt4"))
def call(fp, posp, bodies, mode, U, RT, bt4):
    R, _, H2 = posp.shape
    S1, B4 = fp.shape
    out = pl.pallas_call(
        make_kernel(mode, U),
        grid=(B4 // bt4, R // RT),
        in_specs=[
            pl.BlockSpec((RT, 1, H2), lambda j, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RT, 1, 1), lambda j, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((S1, bt4), lambda j, r: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RT, 4, bt4), lambda j, r: (r, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 4, B4), jnp.int32),
    )(posp, bodies, fp)
    return out


def main():
    rng = np.random.default_rng(0)
    R, H = 8192, 512
    nvalid = 173
    S1, B4 = 2419, 128
    fp = rng.integers(-2**31, 2**31, (R and S1, B4)).astype(np.int32)
    fp[-1] = 0
    pos = rng.integers(0, S1 - 1, (R, H, 3)).astype(np.int32)
    f4 = rng.integers(0, 256, (R, H)).astype(np.int32)
    valid = np.zeros((R, H), dtype=bool)
    valid[:, :nvalid] = True
    posp = np.empty((R, H, 2), dtype=np.int32)
    posp[..., 0] = pos[..., 0] | (pos[..., 1] << 16)
    posp[..., 1] = pos[..., 2] | (f4 << 16)
    fpd = jax.device_put(jnp.asarray(fp))
    log(f"backend={jax.default_backend()}")

    for mode, U, RT in (("lcg", 8, 16), ("smem1", 8, 16),
                        ("p16", 8, 16)):
        posd = jax.device_put(jnp.asarray(posp.reshape(R, 1, H * 2)))
        bodies = np.full((R, 1, 1), (nvalid + U - 1) // U, np.int32)
        bd = jax.device_put(jnp.asarray(bodies))
        t = timed(lambda p, b: call(fpd, p, b, mode, U, RT, B4),
                  posd, bd)
        log(f"{mode:8s} U={U:2d} RT={RT:2d}  {t*1e3:8.2f} ms "
            f"({t*1e9/(R*nvalid):5.2f} ns/hash)")


if __name__ == "__main__":
    main()
