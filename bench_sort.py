"""Microbench: per-read dedup sort variants on TPU (8192 x 512 u32)."""
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(fn, *args, M=10):
    import functools

    import jax

    @functools.partial(jax.jit)
    def multi(*a):
        def body(carry, _):
            out = fn(*carry)
            return carry, jax.tree_util.tree_map(
                lambda x: x.reshape(-1)[0], out)
        _, o = jax.lax.scan(body, a, None, length=M)
        return o
    np.asarray(jax.tree_util.tree_leaves(multi(*args))[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(multi(*args))[0])
        best = min(best, (time.perf_counter() - t0) / M)
    return best


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    R, W = 8192, 512
    khi = jnp.asarray(rng.integers(0, 1 << 12, (R, W), dtype=np.uint32))
    klo = jnp.asarray(rng.integers(0, 1 << 32, (R, W), dtype=np.uint32))
    log(f"backend={jax.default_backend()}")

    t = timed(lambda a, b: jax.lax.sort((a, b), dimension=1, num_keys=2),
              khi, klo)
    log(f"2-key sort (current)      {t*1e3:8.2f} ms")

    t = timed(lambda a, b: jax.lax.sort((a, b), dimension=1, num_keys=1),
              klo, khi)
    log(f"1-key sort + payload      {t*1e3:8.2f} ms")

    t = timed(lambda a: jax.lax.sort((a,), dimension=1, num_keys=1), klo)
    log(f"1-key sort no payload     {t*1e3:8.2f} ms")

    t = timed(lambda a, b: jax.lax.sort(
        (a[:, :416], b[:, :416]), dimension=1, num_keys=1), klo, khi)
    log(f"1-key width 416           {t*1e3:8.2f} ms")

    t = timed(lambda a, b: jax.lax.sort(
        (a[:, :256], b[:, :256]), dimension=1, num_keys=1), klo, khi)
    log(f"1-key width 256           {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
