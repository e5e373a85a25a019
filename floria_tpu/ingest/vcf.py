"""VCF ingest.

Replaces the reference's two htslib/bcf passes (file_reader.rs:116-181 and
239-314) with one text-level scan that builds both products:

- per-contig sorted genome positions of usable SNPs (snp_to_genome_pos),
- the VcfProfile maps: genome pos -> allele byte list, genome pos -> 1-based
  SNP counter, SNP counter -> genome pos.

A record is a usable SNP iff every allele (REF and each ALT) is a single
A/C/G/T character, case-insensitively (file_reader.rs:288-302); otherwise it
is skipped. Plain and bgzip/gzip-compressed VCF are supported.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np

from . import bgzf

_ACGT = frozenset(b"ACGT")


@dataclasses.dataclass
class ContigVcf:
    """SNP table for one contig. SNP counters are 1-indexed."""
    # 0-based genome position per SNP, ascending (index i = SNP counter i+1).
    genome_pos: np.ndarray
    # genome position -> allele index list as bytes [ref, alt1, ...]
    pos_allele_map: Dict[int, bytes]
    # genome position -> 1-based SNP counter
    pos_to_snp: Dict[int, int]

    @property
    def num_snps(self) -> int:
        return len(self.genome_pos)

    def snp_to_gn(self, snp_counter: int) -> int:
        return int(self.genome_pos[snp_counter - 1])

    _allele_matrix_cache: np.ndarray = None

    def allele_matrix(self) -> np.ndarray:
        """[num_snps, MAX_ALLELES] uint8 allele bases, 0-padded. Cached."""
        if self._allele_matrix_cache is None:
            from .. import constants
            out = np.zeros((self.num_snps, constants.MAX_ALLELES),
                           dtype=np.uint8)
            for i, pos in enumerate(self.genome_pos):
                al = self.pos_allele_map[int(pos)]
                out[i, :len(al)] = np.frombuffer(al, dtype=np.uint8)
            self._allele_matrix_cache = out
        return self._allele_matrix_cache


class VcfProfile:
    """Per-contig SNP profiles (types_structs.rs:54-58)."""

    def __init__(self, contigs: Dict[str, ContigVcf]):
        self.contigs = contigs

    def __contains__(self, contig: str) -> bool:
        return contig in self.contigs

    def get(self, contig: str) -> ContigVcf:
        return self.contigs[contig]

    def snp_to_genome_pos_map(self) -> Dict[str, List[int]]:
        """Contig -> list of 0-based SNP genome positions
        (file_reader.rs:116-181 equivalent)."""
        return {name: [int(p) for p in cv.genome_pos]
                for name, cv in self.contigs.items()}


def read_vcf(path: str, ref_chroms: List[str] = None) -> VcfProfile:
    data = bgzf.read_file(path)
    restrict = set(ref_chroms) if ref_chroms is not None else None
    per_contig_pos: Dict[str, List[int]] = {}
    per_contig_alleles: Dict[str, Dict[int, bytes]] = {}
    warned = False
    for line in data.split(b"\n"):
        if not line or line.startswith(b"#"):
            continue
        fields = line.split(b"\t", 5)
        if len(fields) < 5:
            continue
        chrom = fields[0].decode()
        if restrict is not None and chrom not in restrict:
            continue
        # Collect REF + comma-separated ALT alleles in record order; the
        # allele index stored on fragments is the position in this list
        # (file_reader.rs:297, frag_from_record:702-710).
        alleles = [fields[3]] + fields[4].split(b",")
        is_snp = True
        al_bytes = bytearray()
        for al in alleles:
            if len(al) != 1 or al.upper()[0] not in _ACGT:
                is_snp = False
                if not warned and len(al) == 1:
                    warned = True
                break
            al_bytes.append(al[0])
        if not is_snp:
            continue
        pos = int(fields[1]) - 1  # VCF POS is 1-based
        per_contig_pos.setdefault(chrom, []).append(pos)
        per_contig_alleles.setdefault(chrom, {})[pos] = bytes(al_bytes)

    contigs = {}
    for chrom, positions in per_contig_pos.items():
        gp = np.asarray(positions, dtype=np.int64)
        pos_to_snp = {int(p): i + 1 for i, p in enumerate(gp)}
        contigs[chrom] = ContigVcf(genome_pos=gp,
                                   pos_allele_map=per_contig_alleles[chrom],
                                   pos_to_snp=pos_to_snp)
    return VcfProfile(contigs)
