"""Microbench: narrow-row probe kernel escape hatches (VERDICT r2 #4).

The narrow (<=512-bin) probe is scalar-core bound: per hash ~4 SMEM
loads + 3 dynamic SUBLANE loads each paying a vreg rotate.  Variants:

  base:  current sublane kernel ([S1, 128] packed words)
  rep8:  table replicated 8x column-wise -> [S1, 8, 128] wide layout;
         fp3[p] is whole aligned vregs, NO rotate; all sublanes
         redundant, copy 0 sliced after.  Trades 8x VMEM (9.9 MB here)
         for zero rotates.
"""
import sys

import numpy as np

from profile_phases import timed


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from taxor_tpu.device.pallas_probe import (_probe_call_chunked,
                                               choose_bin_tile4)

    rng = np.random.default_rng(0)
    R, H = 8192, 512
    nvalid = 173
    S1, B4 = 2419, 128
    fp = rng.integers(-2**31, 2**31, (S1, B4)).astype(np.int32)
    fp[-1] = 0
    pos = rng.integers(0, S1 - 1, (R, H, 3)).astype(np.int32)
    f4 = (rng.integers(0, 256, (R, H)).astype(np.uint32)
          * np.uint32(0x01010101))
    valid = np.zeros((R, H), dtype=bool)
    valid[:, :nvalid] = True
    pos = np.where(valid[..., None], pos, S1 - 1)
    f4 = np.where(valid, f4, np.uint32(0x01010101))
    f4i = f4.view(np.int32)
    log(f"backend={jax.default_backend()} R={R} valid={nvalid} "
        f"S1={S1} B4={B4}")

    posd = jax.device_put(jnp.asarray(pos))
    f4d = jax.device_put(jnp.asarray(f4i))
    vd = jax.device_put(jnp.asarray(valid))

    # base: current narrow kernel
    fpd = jax.device_put(jnp.asarray(fp))
    bt4 = choose_bin_tile4(S1, B4)
    t = timed(lambda p, f, v: _probe_call_chunked(fpd, p, f, v, bt4,
                                                  False), posd, f4d, vd)
    base_counts = np.asarray(
        _probe_call_chunked(fpd, posd, f4d, vd, bt4, False))
    log(f"base narrow [S1,128]      {t*1e3:8.2f} ms "
        f"({t*1e9/(R*nvalid):.1f} ns/hash)")

    # rep8: replicate 8x -> wide kernel eligible (B4=1024)
    fp_rep = np.tile(fp, (1, 8))  # [S1, 1024]: copy j at cols j*128..
    fpr_d = jax.device_put(jnp.asarray(fp_rep))
    bt4w = choose_bin_tile4(S1, 1024)
    log(f"rep8 bt4={bt4w} vmem={S1*1024*4/1e6:.1f} MB")

    def rep8(p, f, v):
        out = _probe_call_chunked(fpr_d, p, f, v, bt4w, False)
        return out[:, :512]  # copy 0

    t = timed(rep8, posd, f4d, vd)
    rep_counts = np.asarray(rep8(posd, f4d, vd))
    log(f"rep8 wide [S1,8,128]      {t*1e3:8.2f} ms "
        f"({t*1e9/(R*nvalid):.1f} ns/hash)")
    assert np.array_equal(base_counts, rep_counts), "rep8 mismatch"
    log("rep8 counts match base")


if __name__ == "__main__":
    main()
