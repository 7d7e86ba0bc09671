"""Microbench: dedup_kmers component costs on the current device.

Uses the rolled-input timer (profile_phases.timed) — the constant-carry
variant lets XLA hoist the body (LICM) and under-reports by ~M x.
"""
import sys

import numpy as np

from profile_phases import timed


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from taxor_tpu.hash.device_syncmer import (_block_compact, dedup_kmers,
                                               emission_min_gap)

    rng = np.random.default_rng(0)
    R, L = 8192, 2048
    k, s, t = 22, 12, 6
    gap = emission_min_gap(k, s, t)
    hcap = 512
    # realistic emission density ~1/11 with min-gap structure
    khi = rng.integers(0, 1 << 12, (R, L), dtype=np.uint32)
    klo = rng.integers(0, 1 << 32, (R, L), dtype=np.uint32)
    emit = np.zeros((R, L), dtype=bool)
    pos = np.arange(0, L, 11)
    emit[:, pos] = rng.random((R, pos.shape[0])) < 0.9
    khi_d, klo_d = jnp.asarray(khi), jnp.asarray(klo)
    emit_d = jnp.asarray(emit)
    log(f"backend={jax.default_backend()} R={R} L={L} gap={gap}")

    tfull = timed(lambda a, b, e: dedup_kmers(a, b, e, hcap, gap),
                  khi_d, klo_d, emit_d)
    log(f"full dedup_kmers          {tfull*1e3:8.2f} ms")

    tcomp = timed(lambda a, b, e: _block_compact(a, b, e, gap),
                  khi_d, klo_d, emit_d)
    log(f"block_compact only        {tcomp*1e3:8.2f} ms")

    # the sort at the compacted width
    W = (L // 16) * ((16 - 1) // gap + 1)
    shi = jnp.asarray(khi[:, :W])
    slo = jnp.asarray(klo[:, :W])
    tsort = timed(lambda a, b: jax.lax.sort((a, b), dimension=1,
                                            num_keys=2), shi, slo)
    log(f"lax.sort 2-key [R,{W}]   {tsort*1e3:8.2f} ms")

    tne = timed(lambda e: e.sum(axis=1, dtype=jnp.int32), emit_d)
    log(f"n_emit sum [R,L]          {tne*1e3:8.2f} ms")


if __name__ == "__main__":
    main()


def bench_pallas():
    import jax
    import jax.numpy as jnp

    from taxor_tpu.device.pallas_sort import sort_pairs
    from taxor_tpu.hash.device_syncmer import dedup_kmers

    rng = np.random.default_rng(0)
    R, W = 8192, 384
    khi = jnp.asarray(rng.integers(0, 1 << 12, (R, W), dtype=np.uint32))
    klo = jnp.asarray(rng.integers(0, 1 << 32, (R, W), dtype=np.uint32))
    t = timed(lambda a, b: sort_pairs(a, b), khi, klo)
    log(f"pallas sort [R,{W}->512] {t*1e3:8.2f} ms")
    t = timed(lambda a, b: jax.lax.sort((a, b), dimension=1, num_keys=2),
              khi, klo)
    log(f"lax.sort [R,{W}]         {t*1e3:8.2f} ms")
    # full dedup with each impl
    L = 2048
    khi2 = rng.integers(0, 1 << 12, (R, L), dtype=np.uint32)
    klo2 = rng.integers(0, 1 << 32, (R, L), dtype=np.uint32)
    emit = np.zeros((R, L), dtype=bool)
    pos = np.arange(0, L, 11)
    emit[:, pos] = rng.random((R, pos.shape[0])) < 0.9
    a, b, e = jnp.asarray(khi2), jnp.asarray(klo2), jnp.asarray(emit)
    for impl in ("xla", "pallas"):
        t = timed(lambda x, y, z: dedup_kmers(x, y, z, 512, 6,
                                              sort_impl=impl), a, b, e)
        log(f"dedup_kmers {impl:7s}      {t*1e3:8.2f} ms")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "pallas":
    bench_pallas()
