"""At-scale probe feasibility (round 4): can the chip probe a ROOT-level
IXF whose slot table far exceeds VMEM?

At GTDB/RefSeq scale (BASELINE.json configs 4-5) the root IXF's merged
bins hold the union of the whole database: S1 reaches 10^6..10^9 slots,
so the Pallas kernel's VMEM-resident [S1, B4] block is impossible and
probing becomes pure random row gather in HBM.  This measures the XLA
gather formulation (probe.count_xla — jnp.take rows of a [S1, bins]
uint8 table) at root-class shapes, giving the ns/hash cost model the
device-aware layout DP and the at-scale search design rest on.

Run on the real chip: python bench_gather_scale.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from profile_phases import timed
from taxor_tpu.device.probe import count_xla


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    R, H = 2048, 192
    log(f"backend={jax.default_backend()}  R={R} H={H} "
        f"({R*H/1e6:.2f}M hashes/pass)")
    for S1, bins in ((1 << 20, 64), (1 << 23, 64), (1 << 23, 256)):
        fp = rng.integers(0, 256, (S1, bins), dtype=np.uint8)
        bl = S1 // 3
        pos = np.stack([
            rng.integers(0, bl, (R, H)),
            rng.integers(bl, 2 * bl, (R, H)),
            rng.integers(2 * bl, 3 * bl, (R, H)),
        ], axis=-1).astype(np.int32)
        fpr = rng.integers(0, 256, (R, H), dtype=np.uint8)
        mask = np.ones((R, H), dtype=bool)
        fpd = jax.device_put(jnp.asarray(fp))
        posd = jax.device_put(jnp.asarray(pos))
        fprd = jax.device_put(jnp.asarray(fpr))
        maskd = jax.device_put(jnp.asarray(mask))
        t = timed(lambda p, f, m: count_xla(fpd, p, f, m),
                  posd, fprd, maskd, M=4)
        nh = R * H
        gb = nh * 3 * bins / 1e9
        log(f"S1=2^{int(np.log2(S1))} bins={bins} "
            f"table={S1*bins/2**20:.0f}MiB: {t*1e3:8.2f} ms/pass "
            f"({t*1e9/nh:6.1f} ns/hash, {gb/t:6.1f} GB/s gathered)")


if __name__ == "__main__":
    main()
