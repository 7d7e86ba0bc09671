"""Pallas probe kernel vs numpy oracle (interpreter mode on CPU)."""

import numpy as np
import pytest

from taxor_tpu.device.pallas_probe import (
    choose_bin_tile4,
    prepare_fingerprints,
    probe_counts_pallas,
)
from taxor_tpu.ixf.xor_filter import build_ixf, compute_probes


def test_packed_layout():
    fp = np.arange(12, dtype=np.uint8).reshape(3, 4)
    packed = prepare_fingerprints(fp)
    # bins pad to 512 -> 128 int32 words; sentinel row appended
    assert packed.shape == (4, 128)
    assert packed.dtype == np.int32
    # little-endian: word 0 of row 0 packs bins 0..3 = bytes 0,1,2,3
    assert packed[0, 0] == int.from_bytes(bytes([0, 1, 2, 3]), "little")
    assert (packed[3] == 0).all()


def test_bin_tile_choice():
    assert choose_bin_tile4(100, 128) == 128
    assert choose_bin_tile4(100, 1024) == 1024
    # over budget -> None
    assert choose_bin_tile4(10 * 1024 * 1024, 128) is None


def test_kernel_matches_oracle_interpret():
    rng = np.random.default_rng(3)
    n_bins = 20
    bins = [rng.integers(0, 2**63, 200, dtype=np.uint64)
            for _ in range(n_bins)]
    ixf = build_ixf(bins, max_elements_per_bin=400)
    packed = prepare_fingerprints(ixf.fingerprints)

    R, H = 4, 48
    pos = np.zeros((R, H, 3), np.int32)
    fpr = np.zeros((R, H), np.uint8)
    mask = np.zeros((R, H), bool)
    for r in range(R):
        keys = np.unique(np.concatenate([
            bins[r][:10], rng.integers(0, 2**63, 30, dtype=np.uint64)
        ]))[:H]
        p, f, _ = compute_probes(keys, ixf.seed, ixf.block_length)
        n = keys.shape[0]
        pos[r, :n] = p
        fpr[r, :n] = f
        mask[r, :n] = True

    import jax.numpy as jnp

    out = np.asarray(
        probe_counts_pallas(jnp.asarray(packed), pos, fpr, mask,
                            interpret=True)
    )
    for r in range(R):
        m = mask[r]
        rows = ixf.fingerprints[pos[r][m]]
        x = rows[:, 0] ^ rows[:, 1] ^ rows[:, 2] ^ fpr[r][m][:, None]
        expect = (x == 0).sum(axis=0)
        np.testing.assert_array_equal(out[r, :n_bins], expect)


def test_fused_step_matches_oracle_interpret():
    """Full fused device step (on-device probe math + kernel + segment
    matmul) in interpreter mode, including invalid-hash masking across
    all 4 packed byte lanes and inactive reads."""
    import jax.numpy as jnp

    from taxor_tpu.device.pallas_probe import (
        choose_bin_tile4,
        fused_probe_step,
    )

    rng = np.random.default_rng(9)
    n_bins = 10
    bins = [rng.integers(0, 2**63, 150, dtype=np.uint64)
            for _ in range(n_bins)]
    ixf = build_ixf(bins, max_elements_per_bin=300)
    packed = prepare_fingerprints(ixf.fingerprints)

    R, H = 16, 32
    hashes = np.zeros((R, H), np.uint64)
    mask = np.zeros((R, H), bool)
    for r in range(R):
        keys = np.unique(np.concatenate([
            bins[r % n_bins][:8],
            rng.integers(0, 2**63, 12, dtype=np.uint64),
        ]))[:H]
        hashes[r, : keys.shape[0]] = keys
        mask[r, : keys.shape[0]] = True
    active = np.ones(R, bool)
    active[3] = False

    from taxor_tpu.device.pallas_probe import pack_batch

    onehot = np.eye(packed.shape[1] * 4, dtype=np.float32)
    sums = np.asarray(fused_probe_step(
        jnp.asarray(packed),
        jnp.asarray(pack_batch(hashes, mask)),
        jnp.asarray(active), jnp.asarray(onehot),
        jnp.uint32(ixf.seed >> 32), jnp.uint32(ixf.seed & 0xFFFFFFFF),
        jnp.uint32(ixf.block_length),
        bin_tile4=choose_bin_tile4(*packed.shape), interpret=True,
    ))
    for r in range(R):
        if not active[r]:
            assert (sums[r] == 0).all()
            continue
        m = mask[r]
        keys = hashes[r][m]
        expect = ixf.bulk_count(keys)
        np.testing.assert_array_equal(sums[r, :n_bins], expect)


def test_wide_kernel_matches_oracle_interpret():
    """The rotate-free wide-row kernel (bins >= 4096) must agree with the
    brute-force oracle bit for bit, including interior-invalid masking
    and the de-interleaved bin order."""
    from taxor_tpu.device.pallas_probe import _wide_eligible

    rng = np.random.default_rng(9)
    n_bins = 4100  # pads to 4608 -> B4 = 1152... ensure wide-eligible pad
    bins = [rng.integers(0, 2**63, 40, dtype=np.uint64)
            for _ in range(n_bins)]
    ixf = build_ixf(bins, max_elements_per_bin=64)
    packed = prepare_fingerprints(ixf.fingerprints)
    B4 = packed.shape[1]
    if B4 % 1024:  # pad bins so the wide layout applies
        packed = np.pad(packed, ((0, 0), (0, 1024 - B4 % 1024)))
        B4 = packed.shape[1]
    bt4 = choose_bin_tile4(packed.shape[0], B4)
    assert _wide_eligible(B4, bt4)

    R, H = 4, 40
    pos = np.zeros((R, H, 3), np.int32)
    fpr = np.zeros((R, H), np.uint8)
    mask = np.zeros((R, H), bool)
    for r in range(R):
        keys = np.unique(np.concatenate([
            bins[r][:8], rng.integers(0, 2**63, 24, dtype=np.uint64)
        ]))[:H]
        p, f, _ = compute_probes(keys, ixf.seed, ixf.block_length)
        n = keys.shape[0]
        pos[r, :n] = p
        fpr[r, :n] = f
        mask[r, :n] = True
    # interior invalid slot: must be sentinel-probed, not counted
    mask[0, 3] = False

    import jax.numpy as jnp

    out = np.asarray(
        probe_counts_pallas(jnp.asarray(packed), pos, fpr, mask,
                            interpret=True)
    )
    for r in range(R):
        m = mask[r]
        rows = ixf.fingerprints[pos[r][m]]
        x = rows[:, 0] ^ rows[:, 1] ^ rows[:, 2] ^ fpr[r][m][:, None]
        expect = (x == 0).sum(axis=0)
        np.testing.assert_array_equal(out[r, :n_bins], expect)
