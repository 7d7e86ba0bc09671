"""HIXF construction from a layout tree.

Mirrors the recursive reference build (src/hixf/build/hierarchical_build.cpp,
create_ixfs_from_chopper_pack.cpp) with the same post-order semantics:
children (merged bins) are built first, a merged bin's technical bin in the
parent stores the *union* of all hashes of its subtree, leaf records hash
their FASTA files, split records chunk their hash set over consecutive
technical bins (insert_into_bins.cpp:9-30: chunk_size = n/num_bins + 1).

Deviations (documented):
  - all in RAM, no hixf_tmp/ spill files (the reference streams the top two
    levels through temp files purely to bound peak RSS,
    hierarchical_build.cpp:69-117); a spill path can be added when building
    GTDB-scale indexes,
  - hash-set chunking for split bins follows sorted hash order rather than
    the C++ unordered-set iteration order.  Split-bin membership totals per
    user bin are unchanged (runs are summed at query time), so
    classification output is identical,
  - user-bin / IXF ids are assigned in deterministic DFS order.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..hash.schemes import HashScheme, build_hashes
from ..io.fastx import iter_fastx
from ..ixf.xor_filter import build_ixf
from .container import HIXF
from .layout import LayoutNode

U64 = np.uint64


def hashes_for_files(filenames: list[str], scheme: HashScheme) -> np.ndarray:
    """Union hash set over the records of the given FASTA files
    (compute_hashes.cpp:76-142)."""
    record_seqs: list[bytes] = []
    for f in filenames:
        for rec in iter_fastx(f):
            record_seqs.append(rec.seq)
    return build_hashes(record_seqs, scheme)


def precompute_file_hashes(filenames: list[str],
                           scheme: HashScheme) -> dict[str, np.ndarray]:
    """Hash every file's records in ONE batched scan (the vectorized
    scanner needs many lanes to amortize; per-file calls starve it).
    Returns file -> sorted unique uint64 hash set."""
    from ..hash.encode import build_record_seq
    from ..hash.schemes import _syncmer_sets_batch, scaling_filter
    from ..hash.minimizer import minimiser_hashes
    from ..hash.encode import encode_dna4

    uniq_files = list(dict.fromkeys(filenames))
    record_seqs: list[bytes] = []
    owner: list[int] = []
    for i, f in enumerate(uniq_files):
        for rec in iter_fastx(f):
            record_seqs.append(rec.seq)
            owner.append(i)

    per_file: dict[str, list[np.ndarray]] = {f: [] for f in uniq_files}
    if scheme.use_syncmer:
        trimmed = [build_record_seq(s) for s in record_seqs]
        sets = _syncmer_sets_batch(trimmed, scheme, dna5=False)
    else:
        sets = [
            minimiser_hashes(encode_dna4(s), scheme.kmer_size,
                             scheme.window_size)
            for s in record_seqs
        ]
    for i, h in zip(owner, sets):
        per_file[uniq_files[i]].append(h)

    out: dict[str, np.ndarray] = {}
    for f in uniq_files:
        parts = per_file[f]
        h = (np.unique(np.concatenate(parts)) if parts
             else np.zeros(0, dtype=U64))
        if scheme.scaling > 1:
            h = scaling_filter(h, scheme.scaling)
        out[f] = h
    return out


def split_chunks(hashes: np.ndarray, number_of_bins: int) -> list[np.ndarray]:
    """Reference chunking: chunk_size = n // num_bins + 1
    (insert_into_bins.cpp:15)."""
    n = hashes.shape[0]
    chunk = n // number_of_bins + 1
    return [hashes[i : i + chunk] for i in range(0, max(n, 1), chunk)]


def build_hixf_from_layout(
    root: LayoutNode,
    scheme: HashScheme,
    hash_fn=None,
) -> tuple[HIXF, dict[str, int]]:
    """Build the full HIXF.  ``hash_fn(filenames) -> uint64 array`` may be
    injected for tests; defaults to hashing the FASTA files.

    Returns (hixf, user_bin_of_filename) where filenames are joined with
    ';' per record like the reference (update_user_bins.cpp:24-29).
    """
    if hash_fn is None:
        cache = precompute_file_hashes(root.all_filenames(), scheme)

        def hash_fn(filenames):
            parts = [cache[f] for f in filenames]
            if len(parts) == 1:
                return parts[0]
            return (np.unique(np.concatenate(parts)) if parts
                    else np.zeros(0, dtype=U64))

    ixfs: list = []
    next_ids: list = []
    bin_maps: list = []
    filenames: list[str] = []
    user_bin_of_filename: dict[str, int] = {}

    def build_node(node: LayoutNode) -> tuple[int, np.ndarray]:
        """Returns (ixf_pos, union-of-subtree hashes)."""
        ixf_pos = len(ixfs)
        ixfs.append(None)  # reserve slot; children appended after
        nb = node.num_technical_bins
        next_ids.append(np.full(nb, ixf_pos, dtype=np.int64))
        bin_maps.append(np.full(nb, -1, dtype=np.int64))

        per_bin: list[np.ndarray] = [
            np.zeros(0, dtype=U64) for _ in range(nb)
        ]

        # children first (loop_over_children.cpp:43-87)
        for b in sorted(node.children):
            child_pos, child_hashes = build_node(node.children[b])
            next_ids[ixf_pos][b] = child_pos
            per_bin[b] = child_hashes
            # bin_maps stays -1: merged bin

        for rec in node.records:
            ub = len(filenames)
            joined = ";".join(rec.filenames)
            filenames.append(joined)
            user_bin_of_filename[joined] = ub
            hashes = hash_fn(rec.filenames)
            if rec.number_of_bins == 1:
                per_bin[rec.bin_index] = hashes
            else:
                for j, chunk in enumerate(
                    split_chunks(hashes, rec.number_of_bins)
                ):
                    per_bin[rec.bin_index + j] = chunk
            bin_maps[ixf_pos][
                rec.bin_index : rec.bin_index + rec.number_of_bins
            ] = ub

        ixfs[ixf_pos] = build_ixf(per_bin)
        union = (
            np.unique(np.concatenate([b for b in per_bin if b.size]))
            if any(b.size for b in per_bin)
            else np.zeros(0, dtype=U64)
        )
        return ixf_pos, union

    build_node(root)
    hixf = HIXF(
        ixfs=ixfs,
        next_ixf_id=next_ids,
        bin_to_user=bin_maps,
        user_bin_filenames=filenames,
    )
    hixf.validate()
    return hixf, user_bin_of_filename
