#!/usr/bin/env python3
"""Insert ##contig header lines into a VCF that lacks them (equivalent of
reference scripts/write_contig_headers_vcf.py). Writes
<vcf>.with_header."""

from sys import argv

vcf_file = argv[1]
refs = set()
for line in open(vcf_file):
    if not line or line[0] == "#":
        continue
    refs.add(line.split()[0])
refs = sorted(refs)
print(refs)

with open(vcf_file + ".with_header", "w") as new_vcf:
    count = 0
    for line in open(vcf_file):
        if count == 2:
            for ref in refs:
                new_vcf.write(f"##contig=<ID={ref}>\n")
        new_vcf.write(line)
        count += 1
