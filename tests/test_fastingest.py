"""Native fast-ingest path must produce fragments identical to the pure
Python extraction."""

import numpy as np
import pytest

from floria_tpu import native
from floria_tpu.ingest import bam as bamlib
from floria_tpu.ingest import vcf
from floria_tpu.ingest.fragments import get_frags_from_bam
from floria_tpu.options import Options


@pytest.fixture(scope="module")
def have_native():
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")


def test_fast_matches_pure(have_native, small_sim):
    cfg, truth, out = small_sim
    from floria_tpu.ingest.fastingest import FastBam

    prof = vcf.read_vcf(out + "/sim.vcf")
    cv = prof.get(cfg.contig_name)
    opts = Options()

    pure_bam = bamlib.BamFile(out + "/sim.bam")
    fast_bam = FastBam(out + "/sim.bam")
    assert fast_bam.references == pure_bam.references
    assert fast_bam.n_records == sum(
        len(v) for v in pure_bam.records_by_contig().values())

    with_p, without_p = get_frags_from_bam(pure_bam, None, cv, opts,
                                           None, cfg.contig_name)
    with_f, without_f = get_frags_from_bam(fast_bam, None, cv, opts,
                                           None, cfg.contig_name)
    assert len(with_p) == len(with_f)
    assert len(without_p) == len(without_f)
    pure_by_id = {f.id: f for f in with_p}
    for f in with_f:
        g = pure_by_id[f.id]
        assert f.seq_dict == g.seq_dict, f.id
        assert f.qual_dict == g.qual_dict
        assert f.snp_pos_to_seq_pos == g.snp_pos_to_seq_pos
        assert f.first_pos_base == g.first_pos_base
        assert f.last_pos_base == g.last_pos_base
        assert f.seq_string[0] == g.seq_string[0]
        assert f.qual_string[0] == g.qual_string[0]


def test_fast_with_realignment(have_native, small_sim):
    cfg, truth, out = small_sim
    from floria_tpu.ingest.fastingest import FastBam

    prof = vcf.read_vcf(out + "/sim.vcf")
    cv = prof.get(cfg.contig_name)
    opts = Options()
    ref_seq = open(out + "/sim.fa", "rb").read().split(b"\n", 1)[1]
    ref_seq = ref_seq.replace(b"\n", b"")

    pure_bam = bamlib.BamFile(out + "/sim.bam")
    fast_bam = FastBam(out + "/sim.bam")
    with_p, _ = get_frags_from_bam(pure_bam, None, cv, opts, ref_seq,
                                   cfg.contig_name)
    with_f, _ = get_frags_from_bam(fast_bam, None, cv, opts, ref_seq,
                                   cfg.contig_name)
    pure_by_id = {f.id: f for f in with_p}
    for f in with_f:
        assert f.seq_dict == pure_by_id[f.id].seq_dict
