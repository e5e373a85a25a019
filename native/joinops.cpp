// Host join-stage kernels.
//
// floria_counts_fold: sequential remove/add of reads' allele weights in a
// part's consensus window — the inner walk of the reference's final
// read re-assignment (part_block_manip.rs:195-222 calling
// utils_frags.rs:465-490 add/remove_read_from_block). The walk is
// order-sensitive (subtract clamps at zero), so it stays sequential; the
// win is doing it without a Python frame per read.
//
// floria_link_diffs: per-(read, next-block-node) rounded-diff sums for
// the hap-graph join (graph_processing.rs:22-100 semantics) — replaces
// several [n2, n_sites] numpy temporaries per block pair with one fused
// pass. Addition order per (node, read) is ascending gathered-site
// order, identical to the bincount it replaces, so sums are
// bit-identical.

#include <cstdint>

extern "C" {

// Sequentially fold the sites of the given frags (CSR layout: off[f] ..
// off[f+1] rows of (snps, alleles, weights)) into counts[span, A], a
// window starting at SNP `lo`. mode 1: add. mode 0: subtract, only when
// the cell is nonzero, clamped at zero (utils_frags.rs:476-490).
// Callers guarantee every site falls inside [lo, lo+span).
void floria_counts_fold(const int64_t* snps, const int8_t* alleles,
                        const float* weights, const int64_t* off,
                        const int64_t* fids, int64_t n_fids, int64_t lo,
                        int32_t A, double* counts, int32_t mode) {
    for (int64_t k = 0; k < n_fids; ++k) {
        int64_t f = fids[k];
        for (int64_t j = off[f]; j < off[f + 1]; ++j) {
            double* cell = counts + (snps[j] - lo) * A + alleles[j];
            if (mode) {
                *cell += static_cast<double>(weights[j]);
            } else if (*cell != 0.0) {
                double v = *cell - static_cast<double>(weights[j]);
                *cell = v > 0.0 ? v : 0.0;
            }
        }
    }
}

// sums[n2, F] += w[j] for every gathered site j and next-block node k
// where the read's allele is a "diff" against node k's restricted
// consensus: the site has any existing entry and the read's allele is
// not an existing maximal-count entry (utils_frags.rs:77-108 rounded
// distance, tie adds nothing). counts2 [n2, S2, A] f64, exist2 same
// shape i32, cols/al/w/ridx are the gathered in-range site rows.
void floria_link_diffs(const double* counts2, const int32_t* exist2,
                       int64_t n2, int64_t S2, int32_t A,
                       const int64_t* cols, const int8_t* al,
                       const float* w, const int32_t* ridx, int64_t n,
                       int64_t F, double* sums) {
    for (int64_t k = 0; k < n2; ++k) {
        const double* cnt_base = counts2 + k * S2 * A;
        const int32_t* ex_base = exist2 + k * S2 * A;
        double* srow = sums + k * F;
        for (int64_t j = 0; j < n; ++j) {
            const double* cnt = cnt_base + cols[j] * A;
            const int32_t* ex = ex_base + cols[j] * A;
            bool has_key = false;
            double maxc = cnt[0];
            for (int32_t t = 0; t < A; ++t) {
                if (ex[t]) has_key = true;
                if (cnt[t] > maxc) maxc = cnt[t];
            }
            if (!has_key) continue;
            int32_t a = al[j];
            if (!(ex[a] != 0 && cnt[a] == maxc))
                srow[ridx[j]] += static_cast<double>(w[j]);
        }
    }
}

}  // extern "C"
