"""Phred-0 (zero-weight entry) dedup corner.

A base with phred quality 0 carries weight 1 - 10^0 = 0, so inserting
it creates a (site, allele) entry whose accumulated weight is exactly
0. The reference's dedup equality (global_clustering.rs:122-127)
distinguishes such an explicit 0 entry from an absent one; the kernel's
linear fingerprints provably cannot (presence is not a linear function
of per-read contributions — kernels/beam.py _hash_consts), so the
framework deliberately deduplicates on ZERO-STRIPPED block equality
(tests/oracle.py strip_zero_entries documents the deviation and why it
is semantically safe: scoring treats present-with-0 and absent
identically, utils_frags.rs:696-700).

These tests pin the corner:
  - the deviation is REAL: instances exist where raw-dict dedup and
    zero-stripped dedup produce different beam outcomes;
  - the kernel implements the zero-stripped semantics exactly,
    read-for-read, on those same instances and on a qual-0 fuzz sweep.
"""

import numpy as np
import pytest

import oracle
from floria_tpu.frag import Frag
from floria_tpu.kernels import beam as beam_kernel
from floria_tpu.kernels.blocktensor import pack_block


# Epsilon on the 2^-26 weight grid, exactly as the production path
# feeds both sides (options.py __post_init__): zero-weight bases make
# score TIES pervasive, and only on the grid are both the oracle's and
# the kernel's sums exact, so tie sets coincide bit-for-bit. A raw
# off-grid 0.03 diverged on one fuzz seed via a tie the off-grid f64
# arithmetic broke differently — not a kernel defect.
EPS = round(0.03 * 67108864.0) / 67108864.0


def _mk_frag(counter, sites):
    f = Frag(f"r{counter}", counter, False)
    for snp, (allele, qual) in sites.items():
        f.add_site(snp, allele, qual, 0, 0)
    f.freeze()
    return f


def _gen_qual0_frags(seed):
    """Tiny ploidy-2 instances with a heavy share of phred-0 bases."""
    rng = np.random.default_rng(seed)
    ploidy = 2
    nsnp = 8
    strains = rng.integers(0, 2, (ploidy, nsnp))
    frags = []
    n = int(rng.integers(6, 12))
    for i in range(n):
        k = int(rng.integers(0, ploidy))
        start = int(rng.integers(1, nsnp - 2))
        span = int(rng.integers(2, 5))
        sites = {}
        for snp in range(start, min(nsnp, start + span) + 1):
            allele = int(strains[k, snp - 1])
            if rng.random() < 0.1:
                allele = 1 - allele
            qual = 0 if rng.random() < 0.35 else int(
                rng.integers(10, 40))
            sites[snp] = (allele, qual)
        frags.append(_mk_frag(i, sites))
    frags.sort(key=Frag.sort_key)
    for i, f in enumerate(frags):
        f.counter_id = i
    return frags


def _kernel_assignment(frags, ploidy, beam_width, eps=EPS):
    bt = pack_block(frags, (1, 8))
    res = beam_kernel.beam_search_batch(
        bt.alleles[None], bt.weights[None],
        np.array([bt.num_reads], dtype=np.int32),
        np.array([eps], dtype=np.float32),
        ploidy=ploidy, beam_width=beam_width)
    return list(beam_kernel.traceback(
        tuple(np.asarray(a)[0] for a in res), bt.num_reads, ploidy))


# Seeds found by search where raw-dict dedup (the reference's literal
# equality) and zero-stripped dedup reach DIFFERENT final assignments —
# i.e. the corner genuinely changes observable output under beam-slot
# pressure.
_DIVERGENT = [(1, 1), (33, 1), (63, 2), (64, 3), (71, 1)]


@pytest.mark.parametrize("seed,beam_width", _DIVERGENT)
def test_zero_strip_deviation_is_real_and_kernel_matches(seed,
                                                         beam_width):
    frags = _gen_qual0_frags(seed)
    reads = [oracle.frag_to_read(f) for f in frags]
    assert any(w == 0.0 for r in reads for (_a, w) in r.values())
    want_strip = oracle.beam_search(reads, 2, EPS,
                                    beam_width=beam_width,
                                    zero_strip=True)
    want_raw = oracle.beam_search(reads, 2, EPS,
                                  beam_width=beam_width,
                                  zero_strip=False)
    # The corner has teeth: the two dedup semantics disagree here.
    assert want_strip != want_raw
    # The kernel realizes the zero-stripped semantics read-for-read.
    got = _kernel_assignment(frags, 2, beam_width)
    assert got == want_strip


@pytest.mark.parametrize("seed", list(range(40)))
def test_kernel_matches_strip_oracle_under_qual0_fuzz(seed):
    """Whatever the dedup pressure, the kernel equals the zero-strip
    oracle exactly in the presence of phred-0 bases."""
    frags = _gen_qual0_frags(seed)
    reads = [oracle.frag_to_read(f) for f in frags]
    for bw in (1, 2):
        want = oracle.beam_search(reads, 2, EPS, beam_width=bw,
                                  zero_strip=True)
        got = _kernel_assignment(frags, 2, bw)
        assert got == want, (seed, bw)
