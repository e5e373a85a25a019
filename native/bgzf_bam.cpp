// Native BAM ingest accelerator.
//
// The reference leans on htslib (C) for BGZF + BAM decode
// (file_reader.rs:12-16); this is the equivalent native layer for the TPU
// build: a zlib-based BGZF inflater and a BAM record scanner that returns
// flat arrays over ctypes, so the Python ingest layer only does numpy
// slicing. Python keeps a pure fallback (floria_tpu/ingest/bam.py).
//
// Build: make -C native   (produces libfloria_native.so)

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <vector>
#include <zlib.h>

extern "C" {

// Inflate a BGZF/concatenated-gzip stream. Returns total decompressed
// size, or -1 on error. If out == nullptr, only sizes the output.
int64_t floria_bgzf_inflate(const uint8_t* data, int64_t len, uint8_t* out,
                            int64_t out_cap) {
    int64_t pos = 0;
    int64_t total = 0;
    while (pos < len) {
        z_stream zs;
        std::memset(&zs, 0, sizeof(zs));
        if (inflateInit2(&zs, 15 + 16) != Z_OK) return -1;
        zs.next_in = const_cast<uint8_t*>(data + pos);
        zs.avail_in = static_cast<uInt>(len - pos);
        int ret = Z_OK;
        uint8_t sink[1 << 16];
        while (ret != Z_STREAM_END) {
            if (out != nullptr) {
                zs.next_out = out + total;
                zs.avail_out = static_cast<uInt>(out_cap - total);
            } else {
                zs.next_out = sink;
                zs.avail_out = sizeof(sink);
            }
            uLong before = zs.total_out;
            ret = inflate(&zs, Z_NO_FLUSH);
            total += static_cast<int64_t>(zs.total_out - before);
            if (ret != Z_OK && ret != Z_STREAM_END) {
                inflateEnd(&zs);
                return -1;
            }
            if (out != nullptr && total > out_cap) {
                inflateEnd(&zs);
                return -1;
            }
        }
        pos += static_cast<int64_t>(zs.next_in - (data + pos));
        inflateEnd(&zs);
    }
    return total;
}

// Scan decoded BAM records starting at `off` (after header+refs).
// Two-pass interface: first call with null outputs fills counts only.
//
// Outputs (parallel arrays over records):
//   rec_off[i]   byte offset of record i body (after block_size field)
//   tid, pos, mapq, flag, n_cigar, l_seq, l_read_name
// Returns number of records, or -1 on malformed input.
int64_t floria_bam_scan(const uint8_t* data, int64_t len, int64_t off,
                        int64_t* rec_off, int32_t* tid, int32_t* pos,
                        uint8_t* mapq, uint16_t* flag, uint16_t* n_cigar,
                        int32_t* l_seq, uint8_t* l_read_name) {
    int64_t n = 0;
    while (off + 4 <= len) {
        int32_t block_size;
        std::memcpy(&block_size, data + off, 4);
        if (block_size < 32 || off + 4 + block_size > len) {
            if (off + 4 == len || block_size == 0) break;
            return -1;
        }
        const uint8_t* p = data + off + 4;
        if (rec_off != nullptr) {
            rec_off[n] = off + 4;
            std::memcpy(tid + n, p, 4);
            std::memcpy(pos + n, p + 4, 4);
            l_read_name[n] = p[8];
            mapq[n] = p[9];
            std::memcpy(n_cigar + n, p + 12, 2);
            std::memcpy(flag + n, p + 14, 2);
            std::memcpy(l_seq + n, p + 16, 4);
        }
        ++n;
        off += 4 + block_size;
    }
    return n;
}

// Unpack 4-bit encoded bases to ASCII for a batch of records.
// seq_off[i] points at the packed sequence of record i in `data`;
// out_off[i] is the destination offset in `out`.
void floria_unpack_seqs(const uint8_t* data, const int64_t* seq_off,
                        const int32_t* l_seq, const int64_t* out_off,
                        int64_t n, uint8_t* out) {
    static const char codes[17] = "=ACMGRSVTWYHKDBN";
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* src = data + seq_off[i];
        uint8_t* dst = out + out_off[i];
        int32_t L = l_seq[i];
        for (int32_t j = 0; j < L; ++j) {
            uint8_t b = src[j >> 1];
            dst[j] = codes[(j & 1) ? (b & 0xF) : (b >> 4)];
        }
    }
}

}  // extern "C"
