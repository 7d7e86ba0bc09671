"""Microbench: syncmer extraction sub-phase costs (DCE-proof timer)."""
import sys

import numpy as np

from profile_phases import timed


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from taxor_tpu.hash import device_syncmer as ds

    rng = np.random.default_rng(0)
    R, L = 8192, 2048
    k, s, t = 22, 12, 6
    packed = rng.integers(0, 256, (R, L // 4), dtype=np.uint8)
    lengths = np.full(R, 2000, dtype=np.int32)
    pr = jnp.asarray(packed)
    ln = jnp.asarray(lengths)
    log(f"backend={jax.default_backend()} R={R} L={L}")

    tw = timed(lambda p: ds._stream_words(p), pr)
    log(f"stream words            {tw*1e3:8.2f} ms")

    ts = timed(lambda p: ds._rolling_smers(p, s), pr)
    log(f"rolling smers           {ts*1e3:8.2f} ms")

    tk = timed(lambda p: ds._rolling_kmers(p, k), pr)
    log(f"rolling kmers           {tk*1e3:8.2f} ms")

    def vanherk(p):
        ys = ds._rolling_smers(p, s)
        return ds._sliding_rightmost_min(ys, k - s + 1)
    tv = timed(vanherk, pr)
    log(f"smers+vanherk           {tv*1e3:8.2f} ms (vanherk ~{(tv-ts)*1e3:.2f})")

    tf = timed(lambda p, l: ds.syncmer_kmers(p, l, k, s, t), pr, ln)
    log(f"full syncmer_kmers      {tf*1e3:8.2f} ms "
        f"(scan+glue ~{(tf-tv-tk)*1e3:.2f})")


if __name__ == "__main__":
    main()
