"""taxor_tpu — a TPU-native long-read taxonomic classifier.

A from-scratch JAX/XLA/Pallas framework with the capabilities of Taxor
(Ulrich & Renard, Genome Research 2024): open-canonical-syncmer / k-mer /
minimizer hashing, hierarchical interleaved XOR filter (HIXF) membership
counting, statistical match thresholds, EM read reassignment and CAMI
profiling output.

Architecture (TPU-first, not a port):
  - host (numpy / C++): sequence IO, hash extraction, XOR-filter peeling
    (inherently sequential), HIBF layout DP, profile/EM text transform
  - device (JAX/XLA/Pallas): fingerprint probe + per-bin count kernels over
    HBM-resident [slots, bins] uint8 arrays, level-synchronous HIXF
    traversal, read-sharded (DP) and bin-sharded (index-parallel) meshes

Reference behavior citations use /root/reference/<path>:<line> notation.
"""

__version__ = "0.1.0"

import os as _os


def _setup_jax_cache() -> None:
    """Enable the persistent compilation cache: kernel compiles through
    shared TPU compile services can take minutes, and caching makes
    repeat shapes near-instant."""
    try:
        import jax

        cache_dir = _os.environ.get(
            "TAXOR_TPU_JAX_CACHE",
            _os.path.expanduser("~/.cache/taxor_tpu_jax"),
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_setup_jax_cache()
