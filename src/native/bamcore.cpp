// bamcore: native I/O core for hifimeth-tpu.
//
// TPU-native replacement for the role htslib's C core plays in the reference
// (BGZF block codec + hot per-base transforms).  Exposed as a plain C ABI
// consumed from Python via ctypes (hifimeth_tpu/io/native.py); the Python
// implementations remain as a fallback when the library is not built.
//
// Functions:
//   hm_bgzf_scan       - find BGZF block boundaries in a compressed buffer
//   hm_bgzf_inflate    - parallel inflate of many blocks
//   hm_bgzf_compress   - parallel deflate of a raw buffer into BGZF blocks
//   hm_seq_unpack      - BAM 4-bit SEQ -> ASCII
//   hm_revcomp         - reverse complement an ASCII sequence
//   hm_encode_codev1   - raw kinetics frames -> codeV1 bytes

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// BGZF scan: returns number of complete blocks found; fills offsets[] (start
// of each block) and sizes[] (compressed block size).  *consumed = bytes of
// complete blocks.  Returns -1 on format error.
int64_t hm_bgzf_scan(const uint8_t* data, int64_t len,
                     int64_t* offsets, int32_t* sizes, int64_t max_blocks,
                     int64_t* consumed) {
    int64_t pos = 0;
    int64_t n = 0;
    while (pos + 18 <= len && n < max_blocks) {
        if (data[pos] != 0x1f || data[pos + 1] != 0x8b) return -1;
        uint16_t xlen;
        std::memcpy(&xlen, data + pos + 10, 2);
        if (pos + 12 + xlen > len) break;
        int64_t sub = pos + 12;
        int64_t end = sub + xlen;
        int32_t bsize = -1;
        while (sub + 4 <= end) {
            uint8_t si1 = data[sub], si2 = data[sub + 1];
            uint16_t slen;
            std::memcpy(&slen, data + sub + 2, 2);
            if (si1 == 66 && si2 == 67 && slen == 2) {
                uint16_t bs;
                std::memcpy(&bs, data + sub + 4, 2);
                bsize = (int32_t)bs + 1;
            }
            sub += 4 + slen;
        }
        if (bsize < 0) return -1;
        if (pos + bsize > len) break;
        offsets[n] = pos;
        sizes[n] = bsize;
        ++n;
        pos += bsize;
    }
    *consumed = pos;
    return n;
}

// Inflate blocks [0, n_blocks) in parallel into out at out_offsets[i];
// out_sizes[i] receives the decompressed size of block i (ISIZE is trusted
// for pre-sizing by the caller; we verify).  Returns 0 on success.
int32_t hm_bgzf_inflate(const uint8_t* data,
                        const int64_t* offsets, const int32_t* sizes,
                        int64_t n_blocks,
                        uint8_t* out, const int64_t* out_offsets,
                        int32_t* out_sizes, int32_t n_threads) {
    std::atomic<int64_t> next(0);
    std::atomic<int32_t> err(0);
    auto worker = [&]() {
        for (;;) {
            int64_t i = next.fetch_add(1);
            if (i >= n_blocks || err.load()) return;
            const uint8_t* blk = data + offsets[i];
            uint16_t xlen;
            std::memcpy(&xlen, blk + 10, 2);
            const uint8_t* comp = blk + 12 + xlen;
            int64_t comp_len = sizes[i] - 12 - xlen - 8;
            uint32_t isize;
            std::memcpy(&isize, blk + sizes[i] - 4, 4);

            z_stream zs;
            std::memset(&zs, 0, sizeof(zs));
            if (inflateInit2(&zs, -15) != Z_OK) { err.store(1); return; }
            zs.next_in = const_cast<uint8_t*>(comp);
            zs.avail_in = (uInt)comp_len;
            zs.next_out = out + out_offsets[i];
            zs.avail_out = isize ? isize : 1;  // empty EOF block
            int r = inflate(&zs, Z_FINISH);
            if (!(r == Z_STREAM_END || (r == Z_BUF_ERROR && isize == 0))) {
                inflateEnd(&zs);
                err.store(2);
                return;
            }
            out_sizes[i] = (int32_t)zs.total_out;
            inflateEnd(&zs);
            if ((uint32_t)zs.total_out != isize) { err.store(3); return; }
        }
    };
    int nt = std::max(1, (int)std::min<int64_t>(n_threads, n_blocks));
    std::vector<std::thread> ts;
    for (int t = 1; t < nt; ++t) ts.emplace_back(worker);
    worker();
    for (auto& t : ts) t.join();
    return err.load();
}

// Compress raw into BGZF blocks of block_size uncompressed bytes each.
// out must have room (worst case ~ len + n_blocks*64 + 128).  Returns total
// output bytes or -1 on error.  Does NOT append the EOF marker.
int64_t hm_bgzf_compress(const uint8_t* raw, int64_t len,
                         uint8_t* out, int64_t out_cap,
                         int32_t level, int32_t block_size,
                         int32_t n_threads) {
    if (block_size <= 0 || block_size > 65280) block_size = 65280;
    int64_t n_blocks = (len + block_size - 1) / block_size;
    if (n_blocks == 0) return 0;
    std::vector<std::vector<uint8_t>> results(n_blocks);
    std::atomic<int64_t> next(0);
    std::atomic<int32_t> err(0);
    auto worker = [&]() {
        for (;;) {
            int64_t i = next.fetch_add(1);
            if (i >= n_blocks || err.load()) return;
            const uint8_t* src = raw + i * block_size;
            int64_t src_len = std::min<int64_t>(block_size, len - i * block_size);
            std::vector<uint8_t>& dst = results[i];
            dst.resize(src_len + 1024);
            z_stream zs;
            std::memset(&zs, 0, sizeof(zs));
            if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8,
                             Z_DEFAULT_STRATEGY) != Z_OK) { err.store(1); return; }
            zs.next_in = const_cast<uint8_t*>(src);
            zs.avail_in = (uInt)src_len;
            zs.next_out = dst.data() + 18;
            zs.avail_out = (uInt)(dst.size() - 26);
            if (deflate(&zs, Z_FINISH) != Z_STREAM_END) {
                deflateEnd(&zs);
                err.store(2);
                return;
            }
            int64_t clen = zs.total_out;
            deflateEnd(&zs);
            int64_t total = clen + 26;
            // gzip header + BC subfield
            uint8_t h[18] = {0x1f, 0x8b, 8, 4, 0, 0, 0, 0, 0, 0xff,
                             6, 0, 66, 67, 2, 0, 0, 0};
            uint16_t bsize = (uint16_t)(total - 1);
            std::memcpy(h + 16, &bsize, 2);
            std::memcpy(dst.data(), h, 18);
            uint32_t crc = crc32(0, src, (uInt)src_len);
            uint32_t isize = (uint32_t)src_len;
            std::memcpy(dst.data() + 18 + clen, &crc, 4);
            std::memcpy(dst.data() + 18 + clen + 4, &isize, 4);
            dst.resize(total);
        }
    };
    int nt = std::max(1, (int)std::min<int64_t>(n_threads, n_blocks));
    std::vector<std::thread> ts;
    for (int t = 1; t < nt; ++t) ts.emplace_back(worker);
    worker();
    for (auto& t : ts) t.join();
    if (err.load()) return -1;
    int64_t total = 0;
    for (auto& r : results) total += (int64_t)r.size();
    if (total > out_cap) return -1;
    int64_t off = 0;
    for (auto& r : results) {
        std::memcpy(out + off, r.data(), r.size());
        off += (int64_t)r.size();
    }
    return total;
}

// ---------------------------------------------------------------------------
static const char kNibbleBase[17] = "=ACMGRSVTWYHKDBN";

void hm_seq_unpack(const uint8_t* nibbles, int64_t l_seq, uint8_t* out) {
    int64_t i = 0;
    for (; i + 1 < l_seq; i += 2) {
        uint8_t b = nibbles[i >> 1];
        out[i] = kNibbleBase[b >> 4];
        out[i + 1] = kNibbleBase[b & 0xF];
    }
    if (i < l_seq) out[i] = kNibbleBase[nibbles[i >> 1] >> 4];
}

// ctypes releases the GIL during calls, so table initialization must be
// thread-safe: C++11 magic statics (constructor-run-once) instead of a
// hand-rolled non-atomic `init` flag.
struct CompTable {
    uint8_t t[256];
    CompTable() {
        std::memset(t, 'N', 256);
        const char* a = "ACGTacgtNn";
        const char* b = "TGCATGCANN";
        for (int i = 0; a[i]; ++i) t[(uint8_t)a[i]] = (uint8_t)b[i];
    }
};

void hm_revcomp(const uint8_t* seq, int64_t len, uint8_t* out) {
    static const CompTable kComp;
    for (int64_t i = 0; i < len; ++i) out[i] = kComp.t[seq[len - 1 - i]];
}

// Single-pass candidate-site scan over a native-forward ASCII read.
// Replicates features/sites.py (itself replicating the reference's scans,
// eval_kmer_features.cpp:67-126, with their asymmetries): CpG and CHG are
// forward-strand only; CHH emits forward C[ACT][ACT] hits at i (strand 0)
// and reverse [AGT][AGT]G hits at the G position i+2 (strand 1), in
// position-sorted order.  Output buffers must hold `len` entries each;
// counts are written to *n_cpg / *n_chg / *n_chh.
struct HDTables {  // H = A/C/T, D = A/G/T (thread-safe magic-static init)
    uint8_t isH[256], isD[256];
    HDTables() {
        std::memset(isH, 0, 256);
        std::memset(isD, 0, 256);
        isH['A'] = isH['C'] = isH['T'] = 1;
        isD['A'] = isD['G'] = isD['T'] = 1;
    }
};

void hm_scan_sites(const uint8_t* seq, int64_t len,
                   int32_t* cpg, int64_t* n_cpg,
                   int32_t* chg, int64_t* n_chg,
                   int32_t* chh, uint8_t* chh_strand, int64_t* n_chh) {
    static const HDTables kT;
    const uint8_t* isH = kT.isH;
    const uint8_t* isD = kT.isD;
    int64_t nc = 0, ng = 0, nh = 0;
    for (int64_t i = 0; i < len; ++i) {
        uint8_t b = seq[i];
        if (b == 'C') {
            if (i + 1 < len && seq[i + 1] == 'G') cpg[nc++] = (int32_t)i;
            if (i + 2 < len && isH[seq[i + 1]]) {
                if (seq[i + 2] == 'G') chg[ng++] = (int32_t)i;
                else if (isH[seq[i + 2]]) {
                    chh[nh] = (int32_t)i;
                    chh_strand[nh++] = 0;
                }
            }
        } else if (b == 'G' && i >= 2 && isD[seq[i - 2]] && isD[seq[i - 1]]) {
            chh[nh] = (int32_t)i;
            chh_strand[nh++] = 1;
        }
    }
    *n_cpg = nc;
    *n_chg = ng;
    *n_chh = nh;
}

// MM-tag skip-delta string for one base series (build_mod_bam.cpp:134-168):
// each delta counts same-base positions skipped since the previous call
// (calls sit ON base positions).  Writes ",d0,d1,..." to out; returns bytes
// written, or -1 if `cap` would overflow.  qoffs must be ascending and sit
// on `base` characters.
int64_t hm_mm_deltas(const uint8_t* seq, int64_t len, uint8_t base,
                     const int32_t* qoffs, int64_t n,
                     char* out, int64_t cap) {
    int64_t k = 0, w = 0;
    int64_t skipped = 0;
    char tmp[24];
    for (int64_t i = 0; i < len && k < n; ++i) {
        if (seq[i] != base) continue;
        if (qoffs[k] == (int32_t)i) {
            // itoa into tmp (reversed), then copy
            int64_t v = skipped, t = 0;
            do { tmp[t++] = (char)('0' + v % 10); v /= 10; } while (v);
            if (w + t + 1 > cap) return -1;
            out[w++] = ',';
            while (t) out[w++] = tmp[--t];
            skipped = 0;
            ++k;
        } else {
            ++skipped;
        }
    }
    return (k == n) ? w : -1;  // -1: some qoff did not sit on `base`
}

// Parse an MM-tag delta body "d0,d1,..." (digits and commas only) into
// int32 values.  Returns the number of deltas, or -1 on any illegal
// character / empty token (bam_mod_parser.cpp:176-195 tolerant-parse
// semantics: the caller turns -1 into a ModTagError).
int64_t hm_parse_deltas(const uint8_t* s, int64_t len, int32_t* out) {
    int64_t n = 0;
    int64_t i = 0;
    while (i < len) {
        if (s[i] < '0' || s[i] > '9') return -1;
        int64_t v = 0;
        while (i < len && s[i] >= '0' && s[i] <= '9') {
            v = v * 10 + (s[i] - '0');
            if (v > INT32_MAX) return -1;
            ++i;
        }
        out[n++] = (int32_t)v;
        if (i < len) {
            if (s[i] != ',') return -1;
            ++i;
            if (i == len) return -1;  // trailing comma
        }
    }
    return n;
}

// Format pileup BED rows "chr\tpos\tpos+1\tfreq\tpcov\tncov\n" for the
// selected positions (pileup.cpp:562-586).  freq = %g of 100*p/cov -
// identical to both the reference's ostream<<double default precision and
// Python's f"{x:g}".  Returns bytes written, or -1 if cap would overflow.
static inline int64_t hm_itoa(char* out, int64_t v) {
    char tmp[24];
    int64_t t = 0;
    do { tmp[t++] = (char)('0' + v % 10); v /= 10; } while (v);
    int64_t w = 0;
    while (t) out[w++] = tmp[--t];
    return w;
}

// Shared 6/7-column row formatter.  motif_id/motif_names NULL -> 6 columns;
// otherwise column 7 is motif_names + motif_id[i]*motif_stride (NUL-
// terminated, fixed stride).
static int64_t hm_bed_rows_impl(const char* chr_name,
                                const int32_t* pos, const int32_t* pcov,
                                const int32_t* cov,
                                const uint8_t* motif_id,
                                const char* motif_names, int32_t motif_stride,
                                int64_t n, char* out, int64_t cap) {
    // freq-string cache for small coverages: %g double formatting is ~90%
    // of snprintf cost and coverage values repeat constantly.  Entry
    // (p, c) with c <= 512 lives at p * 513 + c (p <= c).  thread_local so
    // the cache persists across calls (the mapping is immutable; a fresh
    // ~4.5 MB zeroed vector per call cost ~6 ms).
    static const int kCacheCov = 512;
    struct FreqEntry { char s[16]; uint8_t len; };
    thread_local std::vector<FreqEntry> cache(
        (kCacheCov + 1) * (kCacheCov + 1) + 1);
    thread_local std::vector<uint8_t> have(
        (kCacheCov + 1) * (kCacheCov + 1) + 1, 0);

    int64_t w = 0;
    size_t chr_len = std::strlen(chr_name);
    for (int64_t i = 0; i < n; ++i) {
        if (w + (int64_t)chr_len + 128 > cap) return -1;
        std::memcpy(out + w, chr_name, chr_len);
        w += chr_len;
        int32_t p = pcov[i], c = cov[i];
        out[w++] = '\t';
        w += hm_itoa(out + w, pos[i]);
        out[w++] = '\t';
        w += hm_itoa(out + w, (int64_t)pos[i] + 1);
        out[w++] = '\t';
        if (c == 0) {
            // degenerate 0-coverage row: Python float formatting says
            // "nan" where glibc %g may print "-nan"; keep paths identical
            std::memcpy(out + w, "nan", 3);
            w += 3;
        } else if (c <= kCacheCov && p <= c) {
            size_t idx = (size_t)p * (kCacheCov + 1) + c;
            if (!have[idx]) {
                cache[idx].len = (uint8_t)std::snprintf(
                    cache[idx].s, sizeof cache[idx].s, "%g", 100.0 * p / c);
                have[idx] = 1;
            }
            std::memcpy(out + w, cache[idx].s, cache[idx].len);
            w += cache[idx].len;
        } else {
            w += std::snprintf(out + w, 32, "%g", 100.0 * p / c);
        }
        out[w++] = '\t';
        w += hm_itoa(out + w, p);
        out[w++] = '\t';
        w += hm_itoa(out + w, c - p);
        if (motif_id) {
            out[w++] = '\t';
            const char* m = motif_names + (size_t)motif_id[i] * motif_stride;
            size_t ml = std::strlen(m);
            std::memcpy(out + w, m, ml);
            w += (int64_t)ml;
        }
        out[w++] = '\n';
    }
    return w;
}

int64_t hm_bed_rows(const char* chr_name,
                    const int32_t* pos, const int32_t* pcov,
                    const int32_t* cov, int64_t n,
                    char* out, int64_t cap) {
    return hm_bed_rows_impl(chr_name, pos, pcov, cov, nullptr, nullptr, 0,
                            n, out, cap);
}

// 7-column variant (cov_to_bed.cpp:19-34 output format): appends the motif
// string selected by motif_id from a fixed-stride NUL-terminated name table.
int64_t hm_bed_rows7(const char* chr_name,
                     const int32_t* pos, const int32_t* pcov,
                     const int32_t* cov, const uint8_t* motif_id,
                     const char* motif_names, int32_t motif_stride,
                     int64_t n, char* out, int64_t cap) {
    return hm_bed_rows_impl(chr_name, pos, pcov, cov, motif_id, motif_names,
                            motif_stride, n, out, cap);
}

// Scan 6+-column methylation-BED/Bismark-cov text: per row, parse
// col0 (chr, run-length encoded as a local id), col1 (start), col2 (end),
// col4 (pcov), col5 (ncov); col3 (freq) and any trailing columns are
// skipped.  skip_short=1 silently drops rows with fewer than 6 columns
// (pileup_correlation.cpp:98-104 tolerance); otherwise a short row is an
// error.  Malformed integers are always errors (matching Python int()).
// Returns the number of rows parsed, or -(byte_offset+1) of the offending
// row on error.  name_off/name_len record each NEW chr run (caller decodes
// the names from the buffer).
int64_t hm_scan_bed6(const uint8_t* buf, int64_t len, int32_t skip_short,
                     int64_t* start, int64_t* end_, int64_t* pcov,
                     int64_t* ncov, int32_t* chrid,
                     int64_t* name_off, int32_t* name_len,
                     int64_t max_names, int64_t* n_names_out) {
    int64_t n = 0, n_names = 0;
    int64_t prev_off = -1, prev_len = -1;
    int64_t i = 0;
    while (i < len) {
        int64_t row = i;
        // col0: chr name
        int64_t e = i;
        while (e < len && buf[e] != '\t' && buf[e] != '\n') ++e;
        int64_t next = e;
        while (next < len && buf[next] != '\n') ++next;
        // tolerate \r\n (Python int() strips the \r)
        int64_t line_end = (next > row && buf[next - 1] == '\r') ? next - 1
                                                                 : next;
        if (e >= len || buf[e] != '\t') {  // <2 columns
            if (skip_short) { i = next + 1; continue; }
            return -(row + 1);
        }
        int64_t c0_off = i, c0_len = e - i;
        int64_t vals[4];
        int64_t p = e + 1;
        bool short_row = false, bad = false;
        for (int col = 1; col <= 5 && !short_row && !bad; ++col) {
            int64_t ve = p;
            while (ve < line_end && buf[ve] != '\t') ++ve;
            if (col < 5 && ve >= line_end) { short_row = true; break; }
            if (col == 3) {  // freq: skipped, any content allowed
                p = ve + 1;
                continue;
            }
            if (ve == p) { bad = true; break; }
            int64_t v = 0;
            for (int64_t k = p; k < ve; ++k) {
                if (buf[k] < '0' || buf[k] > '9') { bad = true; break; }
                v = v * 10 + (buf[k] - '0');
            }
            vals[col > 3 ? col - 2 : col - 1] = v;
            p = ve + 1;
        }
        if (short_row) {
            if (skip_short) { i = next + 1; continue; }
            return -(row + 1);
        }
        if (bad) return -(row + 1);
        if (prev_len != c0_len ||
            std::memcmp(buf + prev_off, buf + c0_off, c0_len) != 0) {
            if (n_names >= max_names) return -(row + 1);
            name_off[n_names] = c0_off;
            name_len[n_names] = (int32_t)c0_len;
            ++n_names;
            prev_off = c0_off;
            prev_len = c0_len;
        }
        start[n] = vals[0];
        end_[n] = vals[1];
        pcov[n] = vals[2];
        ncov[n] = vals[3];
        chrid[n] = (int32_t)(n_names - 1);
        ++n;
        i = next + 1;
    }
    *n_names_out = n_names;
    return n;
}

// ---------------------------------------------------------------------------
// Pileup pass-1 kernel: CIGAR expansion + identity + alignment-exact motif
// mapping + spill-record assembly for ONE read, replacing the per-read numpy
// pipeline (quant/alignment.py expand_alignment + quant/mapping.py map_*).
// Semantics replicated from the reference's per-column scans
// (bam_info.cpp:262-439, pileup.cpp:292-347, 5mc_motif_finder.cpp:104-144),
// including:
//   - only a FIRST leading S op sets qb (H just skipped); S/H/P never emit
//     columns (quant/alignment.py _EMIT)
//   - identity pi = matches/cols; effective identity ignores gap runs >= 8
//   - CpG/CHG call-at-C with the rev-CHG CGG column-i genome-position quirk
//   - CHH fwd pass then rev pass (emission order), rev records at col+2
//   - a record is emitted only when the native-forward offset has an 'm'
//     mod (has_prob), with its prob (pileup.cpp:277-284)
// Returns the number of spill records written to soff/prob/motif_out, or
// -1 if cap would overflow, -2 if the alignment walks outside chr/query
// bounds (caller falls back to the Python path, which raises identically).
struct GapCls {     // H = A/C/T (fwd CHH inner), D = A/G/T (rev CHH inner)
    uint8_t isH[256], isD[256];
    GapCls() {
        std::memset(isH, 0, 256);
        std::memset(isD, 0, 256);
        isH['A'] = isH['C'] = isH['T'] = 1;
        isD['A'] = isD['G'] = isD['T'] = 1;
    }
};

int64_t hm_map_mod_sites(const uint8_t* query, int64_t qsize, int32_t qdir,
                         const uint8_t* chr_seq, int64_t chr_len, int64_t pos,
                         const uint8_t* ops, const int32_t* lens,
                         int64_t n_cigar,
                         const uint8_t* has_prob, const uint8_t* prob_at,
                         double* pi_out, double* epi_out,
                         int32_t* soff_out, uint8_t* prob_out,
                         uint8_t* motif_out, int64_t cap) {
    static const GapCls kT;
    enum { OP_M = 0, OP_I = 1, OP_D = 2, OP_N = 3, OP_S = 4, OP_H = 5,
           OP_P = 6, OP_EQ = 7, OP_X = 8 };
    const uint8_t GAP = '-';

    int64_t qb = 0, start_op = 0;
    if (n_cigar && ops[0] == OP_S) { qb = lens[0]; start_op = 1; }
    else if (n_cigar && ops[0] == OP_H) { start_op = 1; }

    int64_t n_cols = 0;
    for (int64_t k = start_op; k < n_cigar; ++k) {
        uint8_t op = ops[k];
        if (op == OP_M || op == OP_I || op == OP_D || op == OP_N ||
            op == OP_EQ || op == OP_X)
            n_cols += lens[k];
    }
    std::vector<uint8_t> qas(n_cols), sas(n_cols);
    std::vector<int64_t> qpos(n_cols), spos(n_cols);

    int64_t qi = qb, si = pos, w = 0;
    for (int64_t k = start_op; k < n_cigar; ++k) {
        uint8_t op = ops[k];
        int64_t L = lens[k];
        bool cq = (op == OP_M || op == OP_I || op == OP_EQ || op == OP_X);
        bool cs = (op == OP_M || op == OP_D || op == OP_N || op == OP_EQ ||
                   op == OP_X);
        if (!cq && !cs) continue;            // S/H/P: no columns
        if (cq && qi + L > qsize) return -2;
        if (cs && si + L > chr_len) return -2;
        for (int64_t j = 0; j < L; ++j) {
            qas[w] = cq ? query[qi] : GAP;
            sas[w] = cs ? chr_seq[si] : GAP;
            if (cq) ++qi;
            qpos[w] = qi - 1;                // last consumed query offset
            if (cs) ++si;
            spos[w] = si - 1;
            ++w;
        }
    }

    // Runtime column self-check (reference parity: bam_info.cpp:399-416
    // hbn_asserts every alignment column against the raw sequences).  Off
    // by default; enabled with HIFIMETH_DEBUG_ALIGN=1 for real-data runs
    // where CIGAR corner cases the synthetic tests never exercise could
    // surface.  Returns -3 so the Python wrapper raises a clear error
    // instead of silently spilling corrupt sites.
    static const int debug_align = [] {
        const char* e = getenv("HIFIMETH_DEBUG_ALIGN");
        return (e && e[0] && e[0] != '0') ? 1 : 0;
    }();
    if (debug_align) {
        if (qi > qsize || si > chr_len) return -3;
        for (int64_t i = 0; i < n_cols; ++i) {
            bool qg = qas[i] == GAP, sg = sas[i] == GAP;
            if (qg && sg) return -3;
            if (!qg && (qpos[i] < 0 || qpos[i] >= qsize ||
                        qas[i] != query[qpos[i]])) return -3;
            if (!sg && (spos[i] < pos || spos[i] >= chr_len ||
                        sas[i] != chr_seq[spos[i]])) return -3;
            if (i && qpos[i] < qpos[i - 1]) return -3;
            if (i && spos[i] < spos[i - 1]) return -3;
        }
    }

    // identities (bam_info.cpp:11-98 semantics via quant/alignment.py)
    int64_t match = 0;
    for (int64_t i = 0; i < n_cols; ++i) match += (qas[i] == sas[i]);
    *pi_out = n_cols ? 100.0 * (double)match / (double)n_cols : 0.0;
    int64_t eff_len = 0, eff_mat = 0;
    for (int64_t i = 0; i < n_cols;) {
        bool qg = qas[i] == GAP, sg = sas[i] == GAP;
        if (!qg && !sg) {
            eff_mat += (qas[i] == sas[i]);
            ++eff_len;
            ++i;
            continue;
        }
        if (qg && sg) { ++i; continue; }
        bool qside = qg;
        int64_t j = i + 1;
        while (j < n_cols) {
            bool qgj = qas[j] == GAP, sgj = sas[j] == GAP;
            if (qgj && sgj) { ++j; continue; }
            if (qside ? qgj : sgj) { ++j; continue; }
            break;
        }
        if (j - i < 8) {
            for (int64_t k = i; k < j; ++k) {
                bool qgk = qas[k] == GAP, sgk = sas[k] == GAP;
                if (qgk && sgk) continue;
                eff_mat += (qas[k] == sas[k]);
                ++eff_len;
            }
        }
        i = j;
    }
    *epi_out = eff_len ? 100.0 * (double)eff_mat / (double)eff_len : 0.0;

    // motif passes, in spill emission order (CpG, CHG, CHH-fwd, CHH-rev)
    int64_t n = 0;
    auto emit = [&](int64_t qoff, int64_t soff, uint8_t motif) -> bool {
        if (qoff < 0 || qoff >= qsize) return true;   // cannot happen on match
        if (!has_prob[qoff]) return true;
        if (n >= cap) return false;
        soff_out[n] = (int32_t)soff;
        prob_out[n] = prob_at[qoff];
        motif_out[n] = motif;
        ++n;
        return true;
    };
    for (int64_t i = 0; i + 1 < n_cols; ++i) {       // CpG
        if (qas[i] == 'C' && qas[i + 1] == 'G' &&
            sas[i] == 'C' && sas[i + 1] == 'G') {
            int64_t qoff = qdir ? qsize - 1 - (qpos[i] + 1) : qpos[i];
            if (!emit(qoff, spos[i], 0)) return -1;
        }
    }
    for (int64_t i = 0; i + 2 < n_cols; ++i) {       // CHG
        uint8_t q0 = qas[i], q1 = qas[i + 1], q2 = qas[i + 2];
        if (q0 != sas[i] || q1 != sas[i + 1] || q2 != sas[i + 2]) continue;
        bool hit = qdir == 0
            ? (q0 == 'C' && q2 == 'G' &&
               (q1 == 'C' || q1 == 'A' || q1 == 'T'))
            : (q0 == 'C' && q2 == 'G' &&
               (q1 == 'G' || q1 == 'A' || q1 == 'T'));
        if (!hit) continue;
        int64_t qoff = qdir ? qsize - 1 - (qpos[i] + 2) : qpos[i];
        if (!emit(qoff, spos[i], 1)) return -1;      // genome pos at col i
    }
    for (int64_t i = 0; i + 2 < n_cols; ++i) {       // CHH fwd
        uint8_t q0 = qas[i], q1 = qas[i + 1], q2 = qas[i + 2];
        if (q0 != sas[i] || q1 != sas[i + 1] || q2 != sas[i + 2]) continue;
        if (!(q0 == 'C' && kT.isH[q1] && kT.isH[q2])) continue;
        int64_t qoff = qdir ? qsize - 1 - qpos[i] : qpos[i];
        if (!emit(qoff, spos[i], 2)) return -1;
    }
    for (int64_t i = 0; i + 2 < n_cols; ++i) {       // CHH rev (at the G)
        uint8_t q0 = qas[i], q1 = qas[i + 1], q2 = qas[i + 2];
        if (q0 != sas[i] || q1 != sas[i + 1] || q2 != sas[i + 2]) continue;
        if (!(kT.isD[q0] && kT.isD[q1] && q2 == 'G')) continue;
        int64_t qoff = qdir ? qsize - 1 - (qpos[i] + 2) : qpos[i] + 2;
        if (!emit(qoff, spos[i] + 2, 2)) return -1;
    }
    return n;
}

// Pileup pass-1 histogram update for one read: classify each mod call by
// its read-local sequence context (pileup.cpp:237-271 semantics, matching
// quant/pileup.classify_read_mods: 'C' sites by the forward 3-mer with
// CpG > CHG > CHH precedence; 'G' sites count as CHH only when preceded by
// a reverse CHH motif) and bump bins[cls * 256 + prob].  qoffs/probs may
// contain non-C/G sites (skipped, like the keep mask).
void hm_hist_mods(const uint8_t* seq, int64_t len,
                  const int64_t* qoffs, const uint8_t* probs, int64_t n,
                  int64_t* bins) {
    static const HDTables kT;
    for (int64_t k = 0; k < n; ++k) {
        int64_t q = qoffs[k];
        uint8_t b = seq[q];
        int cls = -1;
        if (b == 'C') {
            uint8_t n1 = q + 1 < len ? seq[q + 1] : 0;
            uint8_t n2 = q + 2 < len ? seq[q + 2] : 0;
            if (q + 1 < len && n1 == 'G') cls = 0;
            else if (q + 2 < len && kT.isH[n1]) {
                if (n2 == 'G') cls = 1;
                else if (kT.isH[n2]) cls = 2;
            }
        } else if (b == 'G') {
            if (q - 2 >= 0 && kT.isD[seq[q - 2]] && kT.isD[seq[q - 1]])
                cls = 2;
        } else {
            continue;
        }
        if (cls >= 0) ++bins[cls * 256 + probs[k]];
    }
}

// Pileup pass-2 accumulation for one spill chunk (pileup.cpp:513-560
// semantics, matching quant/pileup.accumulate_counts + the motif_map
// last-write-wins merge): prob >= thresholds[motif] counts into pcov else
// ncov, and motif_map records the chunk's last motif per position.
// Arrays are chr_size-long and updated IN PLACE.
void hm_accum_counts(const int32_t* soff, const uint8_t* prob,
                     const uint8_t* motif, int64_t n,
                     const uint8_t* thresholds,
                     int32_t* pcov, int32_t* ncov, uint8_t* motif_map) {
    for (int64_t i = 0; i < n; ++i) {
        int32_t p = soff[i];
        uint8_t m = motif[i];
        if (prob[i] >= thresholds[m]) ++pcov[p];
        else ++ncov[p];
        motif_map[p] = m;
    }
}

// Group-fetch planning (ops/gather.plan_groups + the b128 adjustment in
// engine/call._call_context_pallas, fast AND greedy-split paths): pack
// position-sorted window starts into groups of up to `group` sites whose
// span fits one block (cap = block_rows - extent); a group whose span
// would exceed the cap is cut at the last site within cap of its first
// (>= 1 site), exactly the numpy greedy splitter.  bases are 128-lane
// aligned; rels = start - base128; idx maps each slot back to its input
// position (pad slots repeat the group's first site/index - their probs
// are dropped/overwritten with identical values at emit).  *trivial_out
// is 1 when no split occurred (slot order == input order, so the caller
// can skip the idx scatter).  bases/rels/idx must hold max_groups groups;
// returns ng, or -1 if max_groups would be exceeded (caller re-allocates
// up to the true worst case of n groups and retries).
int64_t hm_plan_groups(const int32_t* starts, int64_t n, int32_t group,
                       int32_t block_rows, int32_t extent, int64_t n_rows,
                       int64_t max_groups,
                       int32_t* bases, int32_t* rels, int64_t* idx,
                       int32_t* trivial_out) {
    const int64_t cap = (int64_t)block_rows - extent;
    const int64_t maxbase = n_rows - block_rows;
    int64_t ng = 0;
    int32_t trivial = 1;
    int64_t i = 0;
    while (i < n) {
        int64_t j = std::min(i + group, n);
        int32_t first = starts[i];
        if (starts[j - 1] - first > cap) {
            int64_t k = i + 1;
            while (k < j && starts[k] <= first + cap) ++k;
            j = k;                       // >= i + 1 by construction
            trivial = 0;
        }
        if (ng >= max_groups) return -1;     // caller re-allocates, retries
        int64_t base = first < maxbase ? first : maxbase;
        int32_t b128 = (int32_t)((base / 128) * 128);
        bases[ng] = b128;
        int32_t* r = rels + ng * group;
        int64_t* x = idx + ng * group;
        int64_t s = i;
        for (; s < j; ++s) { r[s - i] = starts[s] - b128; x[s - i] = s; }
        for (; s < i + group; ++s) { r[s - i] = first - b128; x[s - i] = i; }
        ++ng;
        i = j;
    }
    *trivial_out = trivial;
    return ng;
}

void hm_encode_codev1(const uint16_t* frames, int64_t len, uint8_t* out) {
    for (int64_t i = 0; i < len; ++i) {
        int32_t s = frames[i];
        if (s > 952) s = 952;
        uint8_t t;
        if (s >= 448) t = (uint8_t)((s - 448) / 8 + 192);
        else if (s >= 192) t = (uint8_t)((s - 192) / 4 + 128);
        else if (s >= 64) t = (uint8_t)((s - 64) / 2 + 64);
        else t = (uint8_t)s;
        out[i] = t;
    }
}

}  // extern "C"
