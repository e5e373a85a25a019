"""floria_tpu — TPU-native metagenomic strain haplotype phasing.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference tool floria (strain-level haplotype phasing of metagenomes from
BAM + VCF + FASTA): read fragments become dense read×SNP allele tensors,
local phasing runs as batched beam-search/UPEM device kernels, and the
global strain resolution (hap-graph, LP flow, widest paths) runs on host.
Work scales across devices by sharding SNP blocks over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"

from .options import Options  # noqa: F401
