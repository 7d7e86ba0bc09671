"""Phase breakdown of the fused e2e step on the current device.

Times (scan-amortized, device-resident inputs):
  A. syncmer extraction only
  B. extraction + dedup
  C. probe kernel only (precomputed positions)
  D. full fused step
Prints one line per phase to stderr.
"""
import functools
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(fn, *args, M=10):
    """ms/pass with the FIRST argument row-rolled between scan
    iterations — same workload every pass, but the loop body depends on
    the carry so XLA cannot hoist it (loop-invariant code motion made
    the old constant-carry version report 1/M of the real time).

    EVERY output leaf is fully reduced into the consumed scalar: taking
    just leaf[0] lets XLA dead-code-eliminate whole sub-computations of
    pure-XLA phases (round-2's dedup number was ~3x inflated relative to
    extraction because of exactly this asymmetry).  The reductions add
    one HBM read of the outputs (~0.1-0.3 ms on [R, L] shapes)."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit)
    def multi(head, *rest):
        def body(c, _):
            out = fn(c, *rest)
            acc = jnp.float32(0)
            for leaf in jax.tree_util.tree_leaves(out):
                acc = acc + jnp.sum(leaf, dtype=jnp.float32)
            return jnp.roll(c, 1, axis=0), acc
        _, o = jax.lax.scan(body, head, None, length=M)
        return o
    np.asarray(multi(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(multi(*args))
        best = min(best, (time.perf_counter() - t0) / M)
    return best


def main():
    sys.path.insert(0, "tests")
    import jax
    import jax.numpy as jnp

    from bench import build_problem
    from taxor_tpu.apps.build import BuildConfig, run_build
    from taxor_tpu.device.hixf_search import DeviceHIXF
    from taxor_tpu.device import e2e as de2e
    from taxor_tpu.device.pallas_probe import (_probe_call_chunked,
                                               _probe_call_chunked_p10,
                                               choose_bin_tile4)
    from taxor_tpu.hash import device_syncmer as dsync
    from taxor_tpu.hash.device_syncmer import (dedup_kmers,
                                               emission_min_gap,
                                               hash_cap, syncmer_kmers)
    from taxor_tpu.io.fastx import read_all
    from taxor_tpu.utils.u64jnp import (probe_positions_and_fprint4,
                                        wyhash64)

    tmp, tsv, gdir, reads_file = build_problem()
    index = run_build(BuildConfig(
        input_file=tsv, input_sequence_dir=gdir, output_filename="",
        kmer_size=22, syncmer_size=12, use_syncmer=True,
        layout_mode="flat", layout_file="", threads=8,
    ))
    seqs = [r.seq for r in read_all(reads_file)]
    scheme = index.scheme
    k, s, t = scheme.kmer_size, scheme.syncmer_size, scheme.t_syncmer
    L = dsync.pad_len_bucket(max(len(x) for x in seqs))
    packed, lengths = dsync.pack_reads(seqs, L)
    pr = jax.device_put(packed)
    ln = jax.device_put(lengths.astype(np.int32))
    hcap = hash_cap(L)
    R = packed.shape[0]
    log(f"R={R} L={L} hcap={hcap} backend={jax.default_backend()}")

    dhixf = DeviceHIXF(index.hixf)
    dixf = dhixf.ixfs[0]
    bt4 = choose_bin_tile4(*dixf.fp.shape)
    users_dev = jnp.asarray(dixf.run_users.astype(np.int32))

    # A: extraction
    tA = timed(lambda p, l: syncmer_kmers(p, l, k, s, t), pr, ln)
    log(f"A extraction            {tA*1e3:8.2f} ms/pass")

    # B: extraction + dedup
    def ext_dedup(p, l):
        k_hi, k_lo, emit = syncmer_kmers(p, l, k, s, t)
        return dedup_kmers(k_hi, k_lo, emit, hcap,
                           emission_min_gap(k, s, t))
    tB = timed(ext_dedup, pr, ln)
    log(f"B extract+dedup         {tB*1e3:8.2f} ms/pass (dedup ~{(tB-tA)*1e3:.2f})")

    # F: the production fused Pallas extraction+dedup+wyhash kernel
    # (replaces A+B in the e2e step since round 3)
    from taxor_tpu.device.pallas_extract import syncmer_hashes_fused

    tF = timed(lambda p, l: syncmer_hashes_fused(p, l, k, s, t, hcap),
               pr, ln)
    log(f"F fused extract+dedup   {tF*1e3:8.2f} ms/pass (production)")

    # C: probe only, on precomputed inputs
    k_hi, k_lo, emit = syncmer_kmers(pr, ln, k, s, t)
    khi_c, klo_c, valid, n_unique, n_emit = dedup_kmers(
        k_hi, k_lo, emit, hcap, emission_min_gap(k, s, t))
    hi, lo = wyhash64(khi_c, klo_c)
    pos, f4 = probe_positions_and_fprint4(hi, lo, dixf.seed_hi,
                                          dixf.seed_lo, dixf.bl_u32)
    S1 = dixf.fp.shape[0]
    pos = jnp.where(valid[..., None], pos, jnp.int32(S1 - 1))
    f4 = jnp.where(valid, f4, jnp.uint32(0x01010101))
    f4i = jax.lax.bitcast_convert_type(f4, jnp.int32)
    pos, f4i, valid = jax.device_put(pos), jax.device_put(f4i), jax.device_put(valid)
    jax.block_until_ready((pos, f4i, valid))
    nvalid = int(np.asarray(valid).sum())
    log(f"valid hashes total {nvalid} (avg {nvalid/R:.0f}/read), "
        f"fp {dixf.fp.shape} bt4={bt4}")

    if dixf.p10:
        tC = timed(lambda p, f, v: _probe_call_chunked_p10(
            dixf.fp, p, f, v, dixf.bl_u32, bt4, False), pos, f4i, valid)
    else:
        tC = timed(lambda p, f, v: _probe_call_chunked(
            dixf.fp, p, f, v, bt4, False), pos, f4i, valid)
    row_bytes = nvalid * 3 * dixf.fp.shape[1] * 4
    log(f"C probe kernel          {tC*1e3:8.2f} ms/pass  "
        f"({row_bytes/tC/1e9:.1f} GB/s probe rows)")

    # C2: hash math only (wyhash + positions)
    def hashmath(a, b):
        h1, l1 = wyhash64(a, b)
        return probe_positions_and_fprint4(h1, l1, dixf.seed_hi,
                                           dixf.seed_lo, dixf.bl_u32)
    khd, kld = jax.device_put(khi_c), jax.device_put(klo_c)
    tC2 = timed(hashmath, khd, kld)
    log(f"C2 u64 hash math        {tC2*1e3:8.2f} ms/pass")

    # D: full fused step
    kw = dict(k=k, s=s, t=t, hcap=hcap, topk=16, bin_tile4=bt4,
              use_p10=dixf.p10)
    tD = timed(lambda p, l: de2e.fused_e2e_step(
        dixf.fp, p, l, dixf.run_onehot, users_dev, dixf.seed_hi,
        dixf.seed_lo, dixf.bl_u32, **kw), pr, ln)
    log(f"D full fused step       {tD*1e3:8.2f} ms/pass "
        f"({R/tD:.0f} reads/s)")
    log(f"unaccounted (D-B-C-C2)  {(tD-tB-tC-tC2)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
