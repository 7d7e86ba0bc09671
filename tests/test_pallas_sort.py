"""Pallas bitonic pair-sort: equality with lax.sort on every shape
class the dedup path uses (interpret mode; conftest forces CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taxor_tpu.device.pallas_sort import sort_pairs


def _ref(hi, lo):
    h, l = jax.lax.sort((jnp.asarray(hi), jnp.asarray(lo)),
                        dimension=1, num_keys=2)
    return np.asarray(h), np.asarray(l)


def _run(hi, lo):
    h, l = sort_pairs(jnp.asarray(hi), jnp.asarray(lo), interpret=True)
    return np.asarray(h), np.asarray(l)


class TestSortPairs:
    @pytest.mark.parametrize("R,W", [(8, 128), (16, 256), (8, 512)])
    def test_random_pairs(self, R, W):
        rng = np.random.default_rng(R * W)
        hi = rng.integers(0, 1 << 12, (R, W), dtype=np.uint32)
        lo = rng.integers(0, 1 << 32, (R, W), dtype=np.uint32)
        got = _run(hi, lo)
        want = _ref(hi, lo)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])

    def test_non_pow2_width_pads(self):
        # the dedup block-compact width (e.g. 384) is not a power of two
        rng = np.random.default_rng(7)
        hi = rng.integers(0, 1 << 8, (8, 384), dtype=np.uint32)
        lo = rng.integers(0, 1 << 32, (8, 384), dtype=np.uint32)
        got = _run(hi, lo)
        want = _ref(hi, lo)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])

    def test_row_padding(self):
        # R not a multiple of the read tile
        rng = np.random.default_rng(3)
        hi = rng.integers(0, 4, (9, 128), dtype=np.uint32)
        lo = rng.integers(0, 1 << 32, (9, 128), dtype=np.uint32)
        got = _run(hi, lo)
        want = _ref(hi, lo)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])

    def test_duplicates_and_sentinels(self):
        # heavy duplication + all-ones sentinels (the dedup workload):
        # duplicates must group adjacent, sentinels sort to the tail
        rng = np.random.default_rng(11)
        vals = rng.integers(0, 8, (8, 256), dtype=np.uint32)
        hi = np.where(vals < 6, vals, np.uint32(0xFFFFFFFF))
        lo = np.where(vals < 6, vals * 3, np.uint32(0xFFFFFFFF))
        got = _run(hi, lo)
        want = _ref(hi, lo)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])

    def test_hi_dominates_order(self):
        # lexicographic: hi is the major key
        hi = np.array([[2, 1, 1, 0]], dtype=np.uint32)
        lo = np.array([[0, 5, 1, 9]], dtype=np.uint32)
        h, l = _run(hi, lo)
        np.testing.assert_array_equal(h[0], [0, 1, 1, 2])
        np.testing.assert_array_equal(l[0], [9, 1, 5, 0])

    @pytest.mark.parametrize("impl", ["pallas_interpret",
                                      "fused_interpret"])
    def test_dedup_kmers_impls_match_xla(self, impl):
        # dedup_kmers with the pallas sort / fully-fused kernel must
        # produce identical (values, valid, counts) to the lax.sort path
        from taxor_tpu.hash.device_syncmer import dedup_kmers

        rng = np.random.default_rng(5)
        R, L = 16, 512
        khi = rng.integers(0, 1 << 12, (R, L), dtype=np.uint32)
        klo = rng.integers(0, 1 << 32, (R, L), dtype=np.uint32)
        # duplicated k-mer values across a read (repeats) + min-gap
        # spaced emissions
        khi[:, 128:256] = khi[:, :128]
        klo[:, 128:256] = klo[:, :128]
        emit = np.zeros((R, L), dtype=bool)
        emit[:, ::11] = rng.random((R, len(range(0, L, 11)))) < 0.9
        a = dedup_kmers(jnp.asarray(khi), jnp.asarray(klo),
                        jnp.asarray(emit), 128, 6, sort_impl="xla")
        b = dedup_kmers(jnp.asarray(khi), jnp.asarray(klo),
                        jnp.asarray(emit), 128, 6, sort_impl=impl)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    @pytest.mark.parametrize("R,L,hcap", [(16, 256, 128), (8, 512, 512),
                                          (12, 384, 512)])
    def test_dedup_fused_shapes(self, R, L, hcap):
        # row padding, hcap == width, hcap > padded width
        from taxor_tpu.hash.device_syncmer import dedup_kmers

        rng = np.random.default_rng(R + L)
        khi = rng.integers(0, 1 << 12, (R, L), dtype=np.uint32)
        klo = rng.integers(0, 8, (R, L), dtype=np.uint32)  # many dups
        emit = rng.random((R, L)) < 0.2
        a = dedup_kmers(jnp.asarray(khi), jnp.asarray(klo),
                        jnp.asarray(emit), hcap, 1, sort_impl="xla")
        b = dedup_kmers(jnp.asarray(khi), jnp.asarray(klo),
                        jnp.asarray(emit), hcap, 1,
                        sort_impl="fused_interpret")
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
