"""Host-side fragment model.

A fragment is one sequencing read (or merged read pair / supplementary
grouping) projected onto SNP space: a sparse map SNP position -> allele
index, with per-site base qualities. Mirrors the reference Frag
(/root/reference/src/types_structs.rs:68-112) but stores the SNP profile as
sorted numpy arrays once frozen, so blocks of fragments can be packed into
dense device tensors without per-read Python overhead.

SNP positions are 1-indexed (VCF record order), matching the reference.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

SNP_MAX = np.iinfo(np.uint32).max


class Frag:
    __slots__ = (
        "id",
        "counter_id",
        "seq_dict",
        "qual_dict",
        "first_position",
        "last_position",
        "seq_string",
        "qual_string",
        "is_paired",
        "snp_pos_to_seq_pos",
        "first_pos_base",
        "last_pos_base",
        "snps",
        "alleles",
        "quals",
        "weights",
    )

    def __init__(self, read_id: str, counter_id: int, is_paired: bool):
        self.id = read_id
        self.counter_id = counter_id
        # Sparse SNP profile, mutable during ingest (types_structs.rs:72-76).
        self.seq_dict: Dict[int, int] = {}
        self.qual_dict: Dict[int, int] = {}
        self.first_position = SNP_MAX  # 1-indexed SNP counter
        self.last_position = 0
        # Raw read payloads; index 0/1 = first/second of pair
        # (types_structs.rs:77-78).
        self.seq_string = [b"", b""]
        self.qual_string = [b"", b""]  # phred+33 bytes
        self.is_paired = is_paired
        # SNP position -> (pair index, position in read sequence)
        # (types_structs.rs:80).
        self.snp_pos_to_seq_pos: Dict[int, Tuple[int, int]] = {}
        self.first_pos_base = np.iinfo(np.int64).max
        self.last_pos_base = np.iinfo(np.int64).max
        # Frozen arrays (built by freeze()).
        self.snps: Optional[np.ndarray] = None
        self.alleles: Optional[np.ndarray] = None
        self.quals: Optional[np.ndarray] = None
        self.weights: Optional[np.ndarray] = None

    # Ordering: (self.first, other.last, self.counter) vs
    # (other.first, self.last, other.counter) — start ascending, end
    # DESCENDING, then counter_id (types_structs.rs:87-93).
    def sort_key(self) -> Tuple[int, int, int]:
        return (self.first_position, -self.last_position, self.counter_id)

    def add_site(self, snp_pos: int, allele: int, qual: int,
                 pair: int, seq_pos: int) -> None:
        self.seq_dict[snp_pos] = allele
        self.qual_dict[snp_pos] = qual
        self.snp_pos_to_seq_pos[snp_pos] = (pair, seq_pos)
        if snp_pos < self.first_position:
            self.first_position = snp_pos
        if snp_pos > self.last_position:
            self.last_position = snp_pos

    def freeze(self, use_qual_weights: bool = True) -> None:
        """Convert the sparse dicts to sorted arrays for tensor packing."""
        if not self.seq_dict:
            self.snps = np.empty(0, dtype=np.int64)
            self.alleles = np.empty(0, dtype=np.int8)
            self.quals = np.empty(0, dtype=np.uint8)
            self.weights = np.empty(0, dtype=np.float32)
            return
        snps = np.fromiter(self.seq_dict.keys(), dtype=np.int64,
                           count=len(self.seq_dict))
        order = np.argsort(snps, kind="stable")
        self.snps = snps[order]
        alleles = np.fromiter(self.seq_dict.values(), dtype=np.int8,
                              count=len(self.seq_dict))
        self.alleles = alleles[order]
        quals = np.fromiter((self.qual_dict[int(p)] for p in self.snps),
                            dtype=np.uint8, count=len(self.snps))
        self.quals = quals
        self.weights = phred_weight(quals, use_qual_weights)

    @property
    def num_sites(self) -> int:
        return len(self.seq_dict)

    def __repr__(self) -> str:
        return (f"Frag({self.id!r}, n={len(self.seq_dict)}, "
                f"span={self.first_position}-{self.last_position})")


def phred_weight(quals: np.ndarray, use_qual: bool = True) -> np.ndarray:
    """Allele weight = probability the base call is correct.

    1 - 10^(-q/10), computed in float32 like the reference
    (utils_frags.rs:702-711, which uses f32 before widening).
    """
    if not use_qual:
        return np.ones_like(quals, dtype=np.float32)
    q = quals.astype(np.float32)
    return (1.0 - np.power(np.float32(10.0), q / np.float32(-10.0))).astype(
        np.float32)


def sort_and_renumber(frags) -> list:
    """Canonical fragment ordering + contiguous counter ids.

    Mirrors the driver's sort + renumber step (bin/floria.rs:289-293): sort
    by (first asc, last desc, counter asc) then rewrite counter_id to the
    vector index so partitions can be stored as index sets.
    """
    frags = sorted(frags, key=Frag.sort_key)
    for i, frag in enumerate(frags):
        frag.counter_id = i
    return frags
