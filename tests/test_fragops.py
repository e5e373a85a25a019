"""Tests for fragment preprocessing: monomorphic filtering and hybrid
polish."""

import numpy as np

from floria_tpu.frag import Frag
from floria_tpu.fragops import (get_avg_length, hybrid_correction,
                                remove_monomorphic_allele)


def _frag(counter, sites, paired=False, qual=30):
    f = Frag(f"r{counter}", counter, paired)
    for i, (snp, allele) in enumerate(sites.items()):
        f.add_site(snp, allele, qual, 0, i)
    f.freeze()
    return f


def test_remove_monomorphic():
    # SNP 1: all reads allele 0 (monomorphic) -> dropped.
    # SNP 2: 10 reads allele 0, 1 read allele 1 with minor*1 > ... with
    #   error=0.5: major 10*w, minor w -> 10w*0.5 > w -> dropped.
    # SNP 3: balanced 6/5 -> kept.
    frags = []
    cid = 0
    for k in range(11):
        sites = {1: 0, 2: 0 if k < 10 else 1, 3: k % 2}
        frags.append(_frag(cid, sites))
        cid += 1
    out = remove_monomorphic_allele(frags, error=0.5)
    kept_positions = set()
    for f in out:
        kept_positions.update(int(p) for p in f.snps)
    assert kept_positions == {3}
    # counter ids renumbered contiguously
    assert [f.counter_id for f in out] == list(range(len(out)))


def test_remove_monomorphic_keeps_polymorphic():
    frags = [_frag(0, {1: 0, 2: 1}), _frag(1, {1: 1, 2: 0})]
    out = remove_monomorphic_allele(frags, error=0.1)
    assert len(out) == 2
    for f in out:
        assert set(int(p) for p in f.snps) == {1, 2}


def test_hybrid_correction():
    # Long read with an error at SNP 2; short (paired) reads unanimously
    # carry allele 1 there.
    long_read = _frag(0, {1: 0, 2: 0, 3: 0})
    shorts = [_frag(i + 1, {2: 1}, paired=True) for i in range(3)]
    corrected, short_out = hybrid_correction([long_read] + shorts)
    assert len(corrected) == 1
    assert corrected[0].seq_dict[2] == 1          # polished
    assert corrected[0].seq_dict[1] == 0          # untouched
    assert len(short_out) == 3


def test_hybrid_no_unanimity_no_change():
    long_read = _frag(0, {2: 0})
    shorts = [_frag(1, {2: 1}, paired=True), _frag(2, {2: 0},
                                                   paired=True)]
    corrected, _ = hybrid_correction([long_read] + shorts)
    # Two distinct alleles among covering shorts -> no overwrite.
    assert corrected[0].seq_dict[2] == 0


def test_get_avg_length():
    frags = [_frag(0, {1: 0, 5: 0}), _frag(1, {2: 0, 4: 0}),
             _frag(2, {1: 0, 10: 0})]
    assert get_avg_length(frags, 0.5) == 4  # sorted spans [2, 4, 9]
