"""Microbench: probe kernel only, synthetic inputs shaped like the
bench workload (R=8192, hcap=512, ~190 valid hashes/read, 256-bin IXF).
Also asserts kernel counts == XLA-gather reference counts on device."""
import functools
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from taxor_tpu.device.pallas_probe import (_probe_call_chunked,
                                               choose_bin_tile4)

    rng = np.random.default_rng(0)
    R, H = 8192, 512
    nvalid = 190
    S1, B4 = 2419, 128
    fp = rng.integers(-2**31, 2**31, (S1, B4)).astype(np.int32)
    fp[-1] = 0  # sentinel row
    pos = rng.integers(0, S1 - 1, (R, H, 3)).astype(np.int32)
    f4 = (rng.integers(0, 256, (R, H)).astype(np.uint32)
          * np.uint32(0x01010101))
    valid = np.zeros((R, H), dtype=bool)
    valid[:, :nvalid] = True
    pos = np.where(valid[..., None], pos, S1 - 1)
    f4 = np.where(valid, f4, np.uint32(0x01010101))
    f4i = f4.view(np.int32)
    bt4 = choose_bin_tile4(S1, B4)
    log(f"bt4={bt4} backend={jax.default_backend()}")

    posd, f4d, vd = (jax.device_put(jnp.asarray(x))
                     for x in (pos, f4i, valid))
    fpd = jax.device_put(jnp.asarray(fp))

    M = 10

    @jax.jit
    def multi(p, f, v):
        def body(carry, _):
            out = _probe_call_chunked(fpd, *carry, bt4, False)
            return carry, out[0, 0]
        _, o = jax.lax.scan(body, (p, f, v), None, length=M)
        return o

    np.asarray(multi(posd, f4d, vd))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(multi(posd, f4d, vd))
        best = min(best, (time.perf_counter() - t0) / M)
    nrows = R * nvalid * 3
    log(f"probe kernel {best*1e3:8.2f} ms/pass "
        f"({nrows * B4 * 4 / best / 1e9:.1f} GB/s probe rows, "
        f"{nrows / best / 1e9:.2f} Grows/s)")

    # correctness vs XLA gather reference on the same device
    counts = np.asarray(_probe_call_chunked(fpd, posd, f4d, vd, bt4,
                                            False))
    fpu8 = fp.view(np.uint8).reshape(S1, B4 * 4)
    sub = 64
    gat = fpu8[pos[:sub, :, 0]] ^ fpu8[pos[:sub, :, 1]] ^ fpu8[pos[:sub, :, 2]]
    fpr = (f4[:sub] & 0xFF).astype(np.uint8)
    hits = (gat ^ fpr[:, :, None]) == 0
    ref = (hits & valid[:sub, :, None]).sum(axis=1).astype(np.int32)
    assert np.array_equal(counts[:sub], ref), "kernel counts mismatch"
    log("counts match XLA/numpy reference")


if __name__ == "__main__":
    main()
