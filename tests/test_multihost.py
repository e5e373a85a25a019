"""Multi-host sharding logic tests (single host: shard assignment and
output merging; actual DCN execution needs a pod)."""

import os

from floria_tpu import constants
from floria_tpu.options import Options
from floria_tpu.parallel.multihost import (_merge_ploidy_tsvs,
                                           contigs_for_process)


def test_contig_sharding_partition():
    contigs = [f"c{i}" for i in range(11)]
    shards = [contigs_for_process(contigs, p, 4) for p in range(4)]
    flat = [c for s in shards for c in s]
    assert sorted(flat) == sorted(contigs)
    assert len(set(flat)) == len(contigs)
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1


def test_merge_ploidy_tsvs(tmp_path):
    opts = Options(out_dir=str(tmp_path))
    rows = {
        0: ["c0\t1.0\n", "c2\t2.0\n"],
        1: ["c1\t1.5\n"],
    }
    for pid, lines in rows.items():
        with open(tmp_path / f"contig_ploidy_info.{pid}.tsv", "w") as f:
            f.write(constants.CONTIG_PLOIDY_HEADER)
            f.writelines(lines)
    _merge_ploidy_tsvs(opts, ["c0", "c1", "c2"])
    merged = (tmp_path / "contig_ploidy_info.tsv").read_text().splitlines()
    assert merged[0].startswith("contig\t")
    assert [l.split("\t")[0] for l in merged[1:]] == ["c0", "c1", "c2"]
