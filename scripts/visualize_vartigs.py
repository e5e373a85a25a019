#!/usr/bin/env python3
"""Vartig-coverage plot: each vartig drawn as a horizontal segment over
its BASERANGE at height log2(COV+1), colored by coverage, grey when HAPQ
is below the cutoff (equivalent of reference
scripts/visualize_vartigs.py)."""

import argparse
import re

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from matplotlib import collections as mc

COV_RE = re.compile(r"COV:(\d*\.?\d+)")
BR_RE = re.compile(r"BASERANGE:(\d+)-(\d+)")
HAPQ_RE = re.compile(r"HAPQ:(\d+)")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("vartig_file")
    p.add_argument("-q", "--min-hapq", type=int, default=1)
    p.add_argument("-c", "--min-cov", type=float, default=1.5)
    p.add_argument("-l", "--min-len", type=int, default=1000)
    p.add_argument("-o", "--output", default=None,
                   help="output image (default: <vartigs>.png)")
    args = p.parse_args()

    lines = []
    covs = []
    hapq_ok = []
    for line in open(args.vartig_file):
        if not line.startswith(">"):
            continue
        cov_m = COV_RE.findall(line)
        br_m = BR_RE.findall(line)
        hq_m = HAPQ_RE.findall(line)
        if not cov_m or not br_m:
            continue
        cov = float(cov_m[0])
        x1, x2 = int(br_m[0][0]), int(br_m[0][1])
        hapq = int(hq_m[0]) if hq_m else 0
        if cov < args.min_cov or (x2 - x1) < args.min_len:
            continue
        y = np.log2(cov + 1.0)
        lines.append([(x1, y), (x2, y)])
        covs.append(cov)
        hapq_ok.append(hapq >= args.min_hapq)

    if not lines:
        print("No vartigs passed the filters.")
        return

    cmap = plt.cm.jet
    vmax = max(covs)
    colors = [cmap(c / vmax) if ok else (0.6, 0.6, 0.6, 0.6)
              for c, ok in zip(covs, hapq_ok)]
    fig, ax = plt.subplots(figsize=(18 / 2.54, 8 / 2.54))
    lc = mc.LineCollection(lines, colors=colors, linewidths=2)
    ax.add_collection(lc)
    ax.autoscale()
    ax.set_xlabel("genome position (bp)")
    ax.set_ylabel("log2(coverage + 1)")
    ax.set_title(args.vartig_file)
    out = args.output or args.vartig_file + ".png"
    fig.savefig(out, dpi=200)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
