// Native hot loop for out-of-core MatrixMarket minibatching.
//
// A fresh C++17 implementation of the BGZF virtual-offset reader plus
// the triplet-parse/scatter inner loop.  This is the TPU-host analog of
// the reference's only hand-optimized native code path: the tabix BGZF
// reader (reference: src/ext/tabix/bgzf.c) combined with the strbuf
// tokenizer (reference: include/utils/strbuf.hh:72-131) driven by
// visit_bgzf_block (reference: include/mmutil_bgzf_util.hh:53-151) and
// the _mem_reader_t scatter (reference: include/mmvae_io.hh:102-140).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the
// image).  The surface is intentionally tiny: header peek, full-scan
// column indexing, block-range triplet reads, and the fused
// read-blocks-and-scatter-into-dense-batch call used per minibatch.
//
// Build: g++ -O3 -std=c++17 -fPIC -shared mmvae_io.cc -lz -o _native.so

#include <zlib.h>

#include <atomic>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int64_t LAST_POS = 0;

// ---------------------------------------------------------------------
// BGZF reader: sequence of independent gzip members, each carrying its
// compressed size in a 'BC' extra subfield.  Virtual offset =
// (compressed_block_start << 16) | within_block_offset.
// ---------------------------------------------------------------------
struct BgzfIn {
    FILE *f = nullptr;
    int64_t block_coffset = 0;  // compressed offset of the cached block
    int64_t next_coffset = 0;   // compressed offset of the next block
    std::vector<uint8_t> ubuf;  // inflated payload of the cached block
    size_t within = 0;          // cursor within ubuf
    std::vector<uint8_t> cbuf;  // compressed scratch
    z_stream zs;                // persistent raw-inflate stream
    bool zs_ready = false;      // inflateInit2 done (Reset per block)

    ~BgzfIn() {
        if (zs_ready) inflateEnd(&zs);
        if (f) fclose(f);
    }

    bool open(const char *path) {
        f = fopen(path, "rb");
        if (!f) return false;
        return load_block(0);
    }

    // Inflate the block at compressed offset `co`; empty ubuf at EOF.
    bool load_block(int64_t co) {
        block_coffset = co;
        next_coffset = co;
        within = 0;
        ubuf.clear();
        if (fseeko(f, co, SEEK_SET) != 0) return false;
        uint8_t hdr[18];
        size_t got = fread(hdr, 1, sizeof(hdr), f);
        if (got < sizeof(hdr)) return false;  // EOF / truncated
        if (hdr[0] != 0x1f || hdr[1] != 0x8b || !(hdr[3] & 0x04)) return false;
        uint16_t xlen = (uint16_t)hdr[10] | ((uint16_t)hdr[11] << 8);
        // scan extra subfields for 'BC'
        std::vector<uint8_t> extra(xlen);
        // first 6 extra bytes already consumed as hdr[12..17]
        size_t pre = xlen < 6 ? xlen : 6;
        memcpy(extra.data(), hdr + 12, pre);
        if (xlen > 6 &&
            fread(extra.data() + 6, 1, xlen - 6, f) != (size_t)(xlen - 6))
            return false;
        int64_t bsize = -1;
        for (size_t p = 0; p + 4 <= extra.size();) {
            uint8_t si1 = extra[p], si2 = extra[p + 1];
            uint16_t slen = (uint16_t)extra[p + 2] | ((uint16_t)extra[p + 3] << 8);
            if (si1 == 'B' && si2 == 'C' && slen == 2 && p + 6 <= extra.size()) {
                bsize = ((int64_t)extra[p + 4] | ((int64_t)extra[p + 5] << 8)) + 1;
                break;
            }
            p += 4 + slen;
        }
        if (bsize < 0) return false;
        int64_t data_len = bsize - 12 - xlen - 8;  // minus fixed hdr + extra + footer
        if (data_len < 0) return false;
        cbuf.resize((size_t)data_len + 8);
        if (fread(cbuf.data(), 1, (size_t)data_len + 8, f) !=
            (size_t)data_len + 8)
            return false;
        uint32_t isize;
        memcpy(&isize, cbuf.data() + data_len + 4, 4);
        ubuf.resize(isize);
        if (isize > 0) {
            // one persistent z_stream per reader: inflateReset instead
            // of a full init/end cycle per 64KB block
            if (!zs_ready) {
                memset(&zs, 0, sizeof(zs));
                if (inflateInit2(&zs, -15) != Z_OK) return false;
                zs_ready = true;
            } else if (inflateReset(&zs) != Z_OK) {
                return false;
            }
            zs.next_in = cbuf.data();
            zs.avail_in = (uInt)data_len;
            zs.next_out = ubuf.data();
            zs.avail_out = isize;
            int r = inflate(&zs, Z_FINISH);
            if (r != Z_STREAM_END) return false;
        }
        next_coffset = co + bsize;
        return true;
    }

    bool advance_block() { return load_block(next_coffset) && !ubuf.empty(); }

    void seek_voffset(int64_t vo) {
        int64_t co = vo >> 16;
        size_t uo = (size_t)(vo & 0xffff);
        if (co != block_coffset || ubuf.empty()) load_block(co);
        within = uo;
    }

    int64_t tell_voffset() const {
        if (within >= ubuf.size()) return next_coffset << 16;
        return (block_coffset << 16) | (int64_t)within;
    }

    // One line without the trailing '\n'; false at EOF with line empty.
    bool getline(std::string &line) {
        line.clear();
        for (;;) {
            if (within < ubuf.size()) {
                const uint8_t *base = ubuf.data();
                const uint8_t *nl = (const uint8_t *)memchr(
                    base + within, '\n', ubuf.size() - within);
                if (nl) {
                    line.append((const char *)base + within,
                                (size_t)(nl - base) - within);
                    within = (size_t)(nl - base) + 1;
                    return true;
                }
                line.append((const char *)base + within, ubuf.size() - within);
                within = ubuf.size();
            }
            if (!advance_block()) return !line.empty();
        }
    }
};

// Fast in-place triplet tokenizer: "row col value" whitespace-separated.
// Returns true when all three fields parsed.
inline bool parse_triplet(const char *s, const char *end, int64_t &row,
                          int64_t &col, double &val) {
    auto skip_ws = [&](const char *p) {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
        return p;
    };
    auto parse_u = [&](const char *p, int64_t &out) {
        int64_t v = 0;
        const char *q = p;
        while (q < end && *q >= '0' && *q <= '9') v = v * 10 + (*q++ - '0');
        out = v;
        return q == p ? nullptr : q;
    };
    const char *p = skip_ws(s);
    p = parse_u(p, row);
    if (!p) return false;
    p = skip_ws(p);
    p = parse_u(p, col);
    if (!p) return false;
    p = skip_ws(p);
    if (p >= end) return false;
    char *q = nullptr;
    val = strtod(p, &q);
    return q != p;
}

// Skip comment lines and the "rows cols nnz" header; dims filled in.
// Leaves the reader positioned at the first data line.
bool read_header(BgzfIn &in, int64_t dims[3]) {
    std::string line;
    while (in.getline(line)) {
        if (line.empty() || line[0] == '%') continue;
        int64_t r, c;
        double n;
        if (parse_triplet(line.c_str(), line.c_str() + line.size(), r, c, n)) {
            dims[0] = r;
            dims[1] = c;
            dims[2] = (int64_t)n;
            return true;
        }
    }
    return false;
}

}  // namespace

extern "C" {

void mmvae_free(void *p) { free(p); }

// dims[3] <- rows, cols, nnz.  Returns 0 on success.
int mmvae_peek_header(const char *path, int64_t *dims) {
    BgzfIn in;
    if (!in.open(path)) return -1;
    return read_header(in, dims) ? 0 : -1;
}

// Full-scan column index (reference: mm_column_indexer_t,
// include/mmutil_index.hh:38-107).  On success *cols_out / *voffs_out
// are malloc'd arrays of length <return value>; caller frees with
// mmvae_free.  Returns -1 on I/O error, -2 if columns are not sorted.
int64_t mmvae_build_index(const char *path, int64_t **cols_out,
                          int64_t **voffs_out) {
    BgzfIn in;
    if (!in.open(path)) return -1;
    int64_t dims[3];
    if (!read_header(in, dims)) return -1;

    std::vector<int64_t> cols, voffs;
    cols.reserve((size_t)dims[1]);
    voffs.reserve((size_t)dims[1]);

    std::string line;
    int64_t last_col = -1;
    int64_t line_start = in.tell_voffset();
    while (true) {
        line_start = in.tell_voffset();
        if (!in.getline(line)) break;
        if (line.empty() || line[0] == '%') continue;
        int64_t r, c;
        double w;
        if (!parse_triplet(line.c_str(), line.c_str() + line.size(), r, c, w))
            continue;
        --c;  // 1-based -> 0-based
        if (c != last_col) {
            if (c < last_col) return -2;  // must be column-sorted
            cols.push_back(c);
            voffs.push_back(line_start);
            last_col = c;
        }
    }

    int64_t n = (int64_t)cols.size();
    *cols_out = (int64_t *)malloc(sizeof(int64_t) * (size_t)n);
    *voffs_out = (int64_t *)malloc(sizeof(int64_t) * (size_t)n);
    memcpy(*cols_out, cols.data(), sizeof(int64_t) * (size_t)n);
    memcpy(*voffs_out, voffs.data(), sizeof(int64_t) * (size_t)n);
    return n;
}

// Triplets in virtual-offset range [beg, end); end == 0 reads to EOF.
// Matches visit_bgzf_block (include/mmutil_bgzf_util.hh:53-151): stop
// after the first line whose post-read offset reaches `end`.
// Outputs are malloc'd; caller frees each with mmvae_free.
int64_t mmvae_read_block(const char *path, int64_t beg, int64_t end,
                         int64_t **rows_out, int64_t **cols_out,
                         float **vals_out) {
    BgzfIn in;
    if (!in.open(path)) return -1;
    in.seek_voffset(beg);

    std::vector<int64_t> rows, cols;
    std::vector<float> vals;
    std::string line;
    while (in.getline(line)) {
        if (!line.empty() && line[0] != '%') {
            int64_t r, c;
            double w;
            if (parse_triplet(line.c_str(), line.c_str() + line.size(), r, c,
                              w)) {
                rows.push_back(r - 1);
                cols.push_back(c - 1);
                vals.push_back((float)w);
            }
        }
        if (end != LAST_POS && in.tell_voffset() >= end) break;
    }

    int64_t n = (int64_t)rows.size();
    *rows_out = (int64_t *)malloc(sizeof(int64_t) * (size_t)n);
    *cols_out = (int64_t *)malloc(sizeof(int64_t) * (size_t)n);
    *vals_out = (float *)malloc(sizeof(float) * (size_t)n);
    memcpy(*rows_out, rows.data(), sizeof(int64_t) * (size_t)n);
    memcpy(*cols_out, cols.data(), sizeof(int64_t) * (size_t)n);
    memcpy(*vals_out, vals.data(), sizeof(float) * (size_t)n);
    return n;
}

// Whole-file CSC read for column-sorted matrices: one pass builds the
// row/value arrays in file order plus the per-column indptr, and
// gathers the value statistics (integrality, min/max, k_max) that the
// Python side would otherwise need several 100M-element numpy passes
// for.  Returns nnz; -1 on I/O error; -2 if columns are NOT sorted
// (caller falls back to the triplet path + lexsort).
//
// stats[0] = 1.0 if all values are non-negative integers
// stats[1] = max value, stats[2] = min value
// stats[3] = largest per-column count (padded-ELL row width)
int64_t mmvae_read_csc(const char *path, int64_t ncols,
                       int32_t **rows_out, float **vals_out,
                       int64_t **indptr_out, double *stats) {
    BgzfIn in;
    if (!in.open(path)) return -1;
    int64_t dims[3];
    if (!read_header(in, dims)) return -1;
    if (ncols <= 0) ncols = dims[1];

    std::vector<int32_t> rows;
    std::vector<float> vals;
    rows.reserve((size_t)dims[2]);
    vals.reserve((size_t)dims[2]);
    int64_t *indptr = (int64_t *)calloc((size_t)ncols + 1, sizeof(int64_t));

    std::string line;
    int64_t last_col = -1;
    int64_t run = 0, kmax = 0;
    bool integral = true;
    double vmax = 0.0, vmin = 0.0;
    bool first_val = true;
    int64_t meter = 0;  // progress meter (reference: io_alg.hh:149-158)
    while (in.getline(line)) {
        if (line.empty() || line[0] == '%') continue;
        if (++meter % 10000000 == 0) {
            fprintf(stderr, "\rread %lldM nonzeros",
                    (long long)(meter / 1000000));
            fflush(stderr);
        }
        int64_t r, c;
        double w;
        if (!parse_triplet(line.c_str(), line.c_str() + line.size(), r, c, w))
            continue;
        --r;
        --c;
        // bounds-validate BOTH indices: downstream dense/ELL fills
        // write at rows[j] unchecked, so an out-of-range row in a
        // corrupt file must never enter the arrays (the reference
        // validates 1-based bounds too, io_alg.hh:137-147)
        if (c < 0 || c >= ncols) continue;
        if (r < 0 || r >= dims[0]) continue;
        if (c < last_col) {
            free(indptr);
            return -2;  // not column-sorted
        }
        if (c != last_col) {
            if (run > kmax) kmax = run;
            run = 0;
            last_col = c;
        }
        ++run;
        ++indptr[c + 1];
        rows.push_back((int32_t)r);
        vals.push_back((float)w);
        if (first_val) {
            vmax = vmin = w;
            first_val = false;
        } else {
            if (w > vmax) vmax = w;
            if (w < vmin) vmin = w;
        }
        if (integral && (w < 0.0 || w != (double)(int64_t)w)) integral = false;
    }
    if (run > kmax) kmax = run;
    if (meter >= 10000000) fprintf(stderr, "\n");
    for (int64_t c = 0; c < ncols; ++c) indptr[c + 1] += indptr[c];

    int64_t n = (int64_t)rows.size();
    *rows_out = (int32_t *)malloc(sizeof(int32_t) * (size_t)n);
    *vals_out = (float *)malloc(sizeof(float) * (size_t)n);
    memcpy(*rows_out, rows.data(), sizeof(int32_t) * (size_t)n);
    memcpy(*vals_out, vals.data(), sizeof(float) * (size_t)n);
    *indptr_out = indptr;
    stats[0] = integral ? 1.0 : 0.0;
    stats[1] = vmax;
    stats[2] = vmin;
    stats[3] = (double)kmax;
    return n;
}

namespace {

// One thread's share of the threaded CSC read: the file-order
// subsequence of nonzeros whose columns fall in [col_lo, col_hi).
struct CscPart {
    std::vector<int32_t> rows;
    std::vector<float> vals;
    std::vector<int64_t> counts;  // per column of the window
    double vmax = 0.0, vmin = 0.0;
    bool integral = true;
    bool any = false;
    int rc = 0;  // 0 ok, -1 io error, -2 unsorted/out-of-window
};

// Parse one voffset range [beg, end) of a column-sorted mtx into `part`.
// `end == LAST_POS` means EOF.  Range boundaries are line starts taken
// from the column index, so checking tell() BEFORE each line is exact.
static void scan_csc_range(const char *path, int64_t beg, int64_t end,
                           int64_t col_lo, int64_t col_hi, int64_t nrows,
                           CscPart &part, std::atomic<int64_t> &meter) {
    BgzfIn in;
    if (!in.open(path)) {
        part.rc = -1;
        return;
    }
    in.seek_voffset(beg);
    part.counts.assign((size_t)(col_hi - col_lo), 0);
    std::string line;
    int64_t last_col = col_lo - 1;
    int64_t local = 0;
    while (end == LAST_POS || in.tell_voffset() < end) {
        if (!in.getline(line)) break;
        if (line.empty() || line[0] == '%') continue;
        if (++local % 1000000 == 0) {
            int64_t tot = meter.fetch_add(1000000) + 1000000;
            if (tot % 10000000 == 0) {
                fprintf(stderr, "\rread %lldM nonzeros",
                        (long long)(tot / 1000000));
                fflush(stderr);
            }
        }
        int64_t r, c;
        double w;
        if (!parse_triplet(line.c_str(), line.c_str() + line.size(), r, c, w))
            continue;
        --r;
        --c;
        if (r < 0 || r >= nrows) continue;
        // a column outside this range's window means the index and the
        // file disagree — bail out so the caller falls back to the
        // serial reader rather than silently mis-merging
        if (c < col_lo || c >= col_hi || c < last_col) {
            part.rc = -2;
            return;
        }
        last_col = c;
        ++part.counts[(size_t)(c - col_lo)];
        part.rows.push_back((int32_t)r);
        part.vals.push_back((float)w);
        if (!part.any) {
            part.vmax = part.vmin = w;
            part.any = true;
        } else {
            if (w > part.vmax) part.vmax = w;
            if (w < part.vmin) part.vmin = w;
        }
        if (part.integral && (w < 0.0 || w != (double)(int64_t)w))
            part.integral = false;
    }
}

}  // namespace

// Threaded whole-file CSC read.  The column index partitions the file
// into `nranges` column-disjoint voffset ranges: range k starts at the
// line-start voffset `begs[k]` (ends at begs[k+1]; the last range runs
// to EOF) and owns columns [col_lo[k], col_lo[k+1]) (the last up to
// ncols).  Each range parses through a private BgzfIn, and because the
// ranges tile the file in order, concatenating the per-range arrays
// reproduces the serial reader's file-order output BITWISE — same
// rows/vals/indptr/stats as mmvae_read_csc.  Returns nnz; -1 on I/O
// error; -2 when any range sees an out-of-window or unsorted column
// (caller falls back to the serial reader).
int64_t mmvae_read_csc_mt(const char *path, int64_t ncols, int64_t nrows,
                          const int64_t *begs, const int64_t *col_lo,
                          int64_t nranges,
                          int32_t **rows_out, float **vals_out,
                          int64_t **indptr_out, double *stats) {
    std::vector<CscPart> parts((size_t)nranges);
    std::atomic<int64_t> meter{0};
    std::vector<std::thread> pool;
    pool.reserve((size_t)nranges);
    for (int64_t k = 0; k < nranges; ++k) {
        int64_t end = (k + 1 < nranges) ? begs[k + 1] : LAST_POS;
        int64_t hi = (k + 1 < nranges) ? col_lo[k + 1] : ncols;
        pool.emplace_back([&, k, end, hi] {
            scan_csc_range(path, begs[k], end, col_lo[k], hi, nrows,
                           parts[(size_t)k], meter);
        });
    }
    for (auto &t : pool) t.join();
    if (meter.load() >= 10000000) fprintf(stderr, "\n");
    int64_t n = 0;
    for (auto &p : parts) {
        if (p.rc != 0) return p.rc;
        n += (int64_t)p.rows.size();
    }

    int64_t *indptr = (int64_t *)calloc((size_t)ncols + 1, sizeof(int64_t));
    int32_t *rows = (int32_t *)malloc(sizeof(int32_t) * (size_t)n);
    float *vals = (float *)malloc(sizeof(float) * (size_t)n);
    int64_t off = 0;
    int64_t kmax = 0;
    bool integral = true, any = false;
    double vmax = 0.0, vmin = 0.0;
    for (int64_t k = 0; k < nranges; ++k) {
        CscPart &p = parts[(size_t)k];
        memcpy(rows + off, p.rows.data(), sizeof(int32_t) * p.rows.size());
        memcpy(vals + off, p.vals.data(), sizeof(float) * p.vals.size());
        off += (int64_t)p.rows.size();
        for (size_t j = 0; j < p.counts.size(); ++j) {
            int64_t cnt = p.counts[j];
            indptr[col_lo[k] + (int64_t)j + 1] += cnt;
            if (cnt > kmax) kmax = cnt;
        }
        if (p.any) {
            if (!any) {
                vmax = p.vmax;
                vmin = p.vmin;
                any = true;
            } else {
                if (p.vmax > vmax) vmax = p.vmax;
                if (p.vmin < vmin) vmin = p.vmin;
            }
        }
        integral = integral && p.integral;
    }
    for (int64_t c = 0; c < ncols; ++c) indptr[c + 1] += indptr[c];
    *rows_out = rows;
    *vals_out = vals;
    *indptr_out = indptr;
    stats[0] = integral ? 1.0 : 0.0;
    stats[1] = vmax;
    stats[2] = vmin;
    stats[3] = (double)kmax;
    return n;
}

// Padded-ELL fill from CSC arrays in ONE pass, writing rows (int32,
// -1 padding) and values in the requested dtype (0=f32, 1=i16, 2=i8)
// directly — replaces ~5 numpy passes over the nonzeros.  Buffers are
// caller-allocated (ncols x kmax), written fully including padding.
void mmvae_ell_fill(const int32_t *rows, const float *vals,
                    const int64_t *indptr, int64_t ncols, int64_t kmax,
                    int32_t *ell_rows, void *ell_vals, int vdtype) {
    for (int64_t c = 0; c < ncols; ++c) {
        int64_t lo = indptr[c], hi = indptr[c + 1];
        int64_t cnt = hi - lo;
        int32_t *rrow = ell_rows + c * kmax;
        for (int64_t j = 0; j < cnt; ++j) rrow[j] = rows[lo + j];
        for (int64_t j = cnt; j < kmax; ++j) rrow[j] = -1;
        if (vdtype == 0) {
            float *vrow = (float *)ell_vals + c * kmax;
            for (int64_t j = 0; j < cnt; ++j) vrow[j] = vals[lo + j];
            for (int64_t j = cnt; j < kmax; ++j) vrow[j] = 0.0f;
        } else if (vdtype == 1) {
            int16_t *vrow = (int16_t *)ell_vals + c * kmax;
            for (int64_t j = 0; j < cnt; ++j)
                vrow[j] = (int16_t)vals[lo + j];
            for (int64_t j = cnt; j < kmax; ++j) vrow[j] = 0;
        } else {
            int8_t *vrow = (int8_t *)ell_vals + c * kmax;
            for (int64_t j = 0; j < cnt; ++j) vrow[j] = (int8_t)vals[lo + j];
            for (int64_t j = cnt; j < kmax; ++j) vrow[j] = 0;
        }
    }
}

// Whole-matrix densify from CSC arrays into a caller-ZEROED row-major
// (nrows_out, D) buffer — one pass over the nonzeros.  ``order`` (may
// be NULL) maps output row i to matrix column order[i]; used to lay
// the data out in the data-parallel (device, batch, slot) row order.
void mmvae_dense_fill(const int32_t *rows, const float *vals,
                      const int64_t *indptr, int64_t D,
                      const int64_t *order, int64_t nrows_out, void *out,
                      int vdtype) {
    for (int64_t i = 0; i < nrows_out; ++i) {
        int64_t c = order ? order[i] : i;
        int64_t lo = indptr[c], hi = indptr[c + 1];
        if (vdtype == 0) {
            float *row = (float *)out + i * D;
            for (int64_t j = lo; j < hi; ++j) row[rows[j]] = vals[j];
        } else if (vdtype == 1) {
            int16_t *row = (int16_t *)out + i * D;
            for (int64_t j = lo; j < hi; ++j)
                row[rows[j]] = (int16_t)vals[j];
        } else {
            int8_t *row = (int8_t *)out + i * D;
            for (int64_t j = lo; j < hi; ++j)
                row[rows[j]] = (int8_t)vals[j];
        }
    }
}

// Batch-packed CSR shard fill (the rotation tier's smallest layout,
// data/shards.py): for each of ``nids`` schedule cells (CSC column
// ids[i]), append its nonzeros to its batch's packed
// (row-in-batch, gene, value) triplet row, padded to ``nnz_pad`` with
// row sentinel B (dropped by the out-of-bounds scatter on device).
// One pass over the shard's nonzeros; the numpy fallback needs ~8.
void mmvae_csr_fill(const int32_t *rows, const float *vals,
                    const int64_t *indptr, const int64_t *ids,
                    int64_t nids, int64_t B, int64_t nnz_pad,
                    void *rows_b, int rb_code, /* 0=int8 1=int16 */
                    void *cols, int cid_code,  /* 0=int16 1=int32 */
                    void *vout, int vdtype) {  /* 0=f32 1=i16 2=i8 */
    int64_t nb = nids / B;
    for (int64_t b = 0; b < nb; ++b) {
        int64_t cur = 0;
        int64_t base = b * nnz_pad;
        for (int64_t k = 0; k < B; ++k) {
            int64_t c = ids[b * B + k];
            int64_t lo = indptr[c], hi = indptr[c + 1];
            for (int64_t j = lo; j < hi; ++j, ++cur) {
                int64_t d = base + cur;
                if (rb_code == 0)
                    ((int8_t *)rows_b)[d] = (int8_t)k;
                else
                    ((int16_t *)rows_b)[d] = (int16_t)k;
                if (cid_code == 0)
                    ((int16_t *)cols)[d] = (int16_t)rows[j];
                else
                    ((int32_t *)cols)[d] = rows[j];
                if (vdtype == 0)
                    ((float *)vout)[d] = vals[j];
                else if (vdtype == 1)
                    ((int16_t *)vout)[d] = (int16_t)vals[j];
                else
                    ((int8_t *)vout)[d] = (int8_t)vals[j];
            }
        }
        for (; cur < nnz_pad; ++cur) {
            int64_t d = base + cur;
            if (rb_code == 0)
                ((int8_t *)rows_b)[d] = (int8_t)B;
            else
                ((int16_t *)rows_b)[d] = (int16_t)B;
            if (cid_code == 0)
                ((int16_t *)cols)[d] = 0;
            else
                ((int32_t *)cols)[d] = 0;
            if (vdtype == 0)
                ((float *)vout)[d] = 0.0f;
            else if (vdtype == 1)
                ((int16_t *)vout)[d] = 0;
            else
                ((int8_t *)vout)[d] = 0;
        }
    }
}

// Fast triplet scan over a contiguous byte range (one or more whole
// lines).  Parses "row col value" with a hand-rolled number reader
// (integer fast path, simple decimals; strtod only for exponents),
// looks the column up, and scatters.  Returns scatter count.
struct BatchScatter {
    const int64_t *ucols;
    int64_t nu;
    const int64_t *dup_start;
    const int64_t *dup_flat;
    int64_t D;
    float *out;
    int64_t cmin, cmax;
    bool contiguous;  // ucols == [cmin..cmax] -> direct indexing
    int64_t nwritten = 0;

    inline void init() {
        cmin = nu > 0 ? ucols[0] : 0;
        cmax = nu > 0 ? ucols[nu - 1] : -1;
        contiguous = nu > 0 && (cmax - cmin + 1 == nu);
    }

    inline void emit(int64_t r, int64_t c, float w) {
        if (r < 0 || r >= D) return;  // corrupt rows must not scatter OOB
        if (c < cmin || c > cmax) return;
        int64_t k;
        if (contiguous) {
            k = c - cmin;
        } else {
            int64_t lo = 0, hi = nu;
            while (lo < hi) {
                int64_t mid = (lo + hi) >> 1;
                if (ucols[mid] < c)
                    lo = mid + 1;
                else
                    hi = mid;
            }
            if (lo >= nu || ucols[lo] != c) return;
            k = lo;
        }
        for (int64_t t = dup_start[k]; t < dup_start[k + 1]; ++t) {
            out[dup_flat[t] * D + r] = w;
            ++nwritten;
        }
    }

    // scan complete lines in [p, end); returns pointer past the last
    // complete line consumed ('\n' inclusive)
    const char *scan(const char *p, const char *end) {
        while (p < end) {
            const char *nl =
                (const char *)memchr(p, '\n', (size_t)(end - p));
            if (!nl) break;
            parse_line(p, nl);
            p = nl + 1;
        }
        return p;
    }

    inline void parse_line(const char *p, const char *end) {
        if (p >= end || *p == '%') return;
        int64_t r = 0, c = 0;
        // row
        while (p < end && (*p == ' ' || *p == '\t')) ++p;
        const char *q = p;
        while (p < end && *p >= '0' && *p <= '9') r = r * 10 + (*p++ - '0');
        if (p == q) return;
        // col
        while (p < end && (*p == ' ' || *p == '\t')) ++p;
        q = p;
        while (p < end && *p >= '0' && *p <= '9') c = c * 10 + (*p++ - '0');
        if (p == q) return;
        // value: integer fast path, then ".ddd", strtod for the rest
        while (p < end && (*p == ' ' || *p == '\t')) ++p;
        if (p >= end) return;
        bool neg = false;
        if (*p == '-') { neg = true; ++p; }
        double w = 0.0;
        q = p;
        while (p < end && *p >= '0' && *p <= '9') w = w * 10.0 + (*p++ - '0');
        if (p < end && *p == '.') {
            ++p;
            double frac = 0.0, scale = 1.0;
            while (p < end && *p >= '0' && *p <= '9') {
                frac = frac * 10.0 + (*p - '0');
                scale *= 10.0;
                ++p;
            }
            w += frac / scale;
        }
        if (p < end && (*p == 'e' || *p == 'E')) {
            // rare path: re-parse with strtod from q
            char *qq = nullptr;
            w = strtod(q, &qq);
        } else if (p == q) {
            return;
        }
        if (neg) w = -w;
        emit(r - 1, c - 1, (float)w);
    }
};

// The fused per-minibatch hot loop: read every [beg, end) block range,
// and for each triplet (r, c, w) whose column is requested, scatter w
// into out[j * D + r] for every batch slot j owning column c
// (duplicate-aware, mirroring _mem_reader_t + dup lists,
// include/mmvae_io.hh:102-140, 208-245).  The scan runs IN PLACE over
// each inflated BGZF block (no per-line copy), with a small carry
// buffer for lines straddling block boundaries.
//
//   ucols[nu]      : sorted unique requested columns
//   dup_start[nu+1]: CSR offsets into dup_flat
//   dup_flat[...]  : batch slots per unique column
//   out[B * D]     : row-major (B, D) dense batch, pre-zeroed by caller
//
// Returns number of scattered values, or -1 on error.
// Decode block ranges [b0, b1) of the batch through one private reader,
// scattering via `sc`.  Returns false on I/O error.  Thread-safe: every
// call owns its BgzfIn (FILE* + z_stream) and the scatter targets are
// disjoint across ranges — each requested column lives in exactly ONE
// coalesced range (data/block.py builds them from the sorted unique
// columns), and a column's duplicate slots are all written by the range
// that owns the column.
static bool scan_ranges(const char *path, const int64_t *begs,
                        const int64_t *ends, int64_t b0, int64_t b1,
                        BatchScatter &sc) {
    BgzfIn in;
    if (!in.open(path)) return false;

    std::string carry;
    for (int64_t b = b0; b < b1; ++b) {
        in.seek_voffset(begs[b]);
        const int64_t end_vo = ends[b];
        carry.clear();
        for (;;) {
            if (in.within >= in.ubuf.size()) {
                if (!in.advance_block() || in.ubuf.empty()) break;
            }
            const char *base = (const char *)in.ubuf.data();
            const char *bb = base + in.within;
            const char *be = base + in.ubuf.size();
            // bound the scan inside this block when the end voffset
            // lands in it (end semantics: stop after the line whose
            // post-read offset reaches end; a line straddling end is
            // included via the carry path)
            bool last_block = false;
            if (end_vo != LAST_POS) {
                int64_t end_co = end_vo >> 16;
                int64_t end_uo = end_vo & 0xffff;
                if (in.block_coffset == end_co) {
                    const char *lim = base + (size_t)end_uo;
                    if (lim <= be) {
                        be = lim;
                        last_block = true;
                    }
                }
                else if (in.block_coffset > end_co) {
                    last_block = true;
                    // finish any carried partial line then stop
                }
            }
            if (!carry.empty()) {
                const char *nl = (const char *)memchr(bb, '\n',
                                                      (size_t)(be - bb));
                if (nl) {
                    carry.append(bb, (size_t)(nl - bb));
                    sc.parse_line(carry.c_str(),
                                  carry.c_str() + carry.size());
                    carry.clear();
                    bb = nl + 1;
                } else {
                    carry.append(bb, (size_t)(be - bb));
                    in.within = (size_t)(be - base);
                    if (last_block) {
                        // partial line straddles the end offset: the
                        // reference includes it, so finish it
                        std::string rest;
                        if (in.getline(rest)) {
                            carry += rest;
                            sc.parse_line(carry.c_str(),
                                          carry.c_str() + carry.size());
                        }
                        carry.clear();
                        break;
                    }
                    in.within = in.ubuf.size();
                    continue;
                }
            }
            const char *done = sc.scan(bb, be);
            if (done < be) carry.assign(done, (size_t)(be - done));
            in.within = (size_t)(be - base);
            if (last_block) {
                if (!carry.empty()) {
                    // the line straddles the end offset: finish it from
                    // the remainder of the stream (reference includes it)
                    in.within = (size_t)(be - base);
                    std::string rest;
                    if (in.getline(rest)) {
                        carry += rest;
                        sc.parse_line(carry.c_str(),
                                      carry.c_str() + carry.size());
                    }
                    carry.clear();
                }
                break;
            }
            if (in.within >= in.ubuf.size()) in.within = in.ubuf.size();
        }
        if (!carry.empty()) {
            sc.parse_line(carry.c_str(), carry.c_str() + carry.size());
            carry.clear();
        }
    }
    return true;
}

int64_t mmvae_read_batch(const char *path, const int64_t *begs,
                         const int64_t *ends, int64_t nblocks,
                         const int64_t *ucols, int64_t nu,
                         const int64_t *dup_start, const int64_t *dup_flat,
                         int64_t D, float *out) {
    BatchScatter sc{ucols, nu, dup_start, dup_flat, D, out};
    sc.init();
    if (!scan_ranges(path, begs, ends, 0, nblocks, sc)) return -1;
    return sc.nwritten;
}

// Threaded variant: the batch's block ranges split across `nthreads`
// decoder threads, each with its own BgzfIn + z_stream, all scattering
// into the shared pre-zeroed `out`.  Output is thread-count-invariant
// (disjoint ranges => disjoint output rows; see scan_ranges).  Designed
// for multi-core TPU hosts feeding several chips; on a 1-core host it
// degrades to the serial path.
int64_t mmvae_read_batch_mt(const char *path, const int64_t *begs,
                            const int64_t *ends, int64_t nblocks,
                            const int64_t *ucols, int64_t nu,
                            const int64_t *dup_start,
                            const int64_t *dup_flat, int64_t D, float *out,
                            int nthreads) {
    if ((int64_t)nthreads > nblocks) nthreads = (int)nblocks;
    if (nthreads <= 1)
        return mmvae_read_batch(path, begs, ends, nblocks, ucols, nu,
                                dup_start, dup_flat, D, out);

    std::vector<BatchScatter> scs(
        (size_t)nthreads, BatchScatter{ucols, nu, dup_start, dup_flat, D, out});
    std::vector<char> ok((size_t)nthreads, 1);
    std::vector<std::thread> pool;
    pool.reserve((size_t)nthreads);
    // contiguous block partition: ranges are column-sorted, so chunks
    // keep each thread's file reads roughly sequential
    for (int t = 0; t < nthreads; ++t) {
        int64_t b0 = nblocks * t / nthreads;
        int64_t b1 = nblocks * (t + 1) / nthreads;
        scs[(size_t)t].init();
        pool.emplace_back([&, t, b0, b1] {
            if (!scan_ranges(path, begs, ends, b0, b1, scs[(size_t)t]))
                ok[(size_t)t] = 0;
        });
    }
    int64_t total = 0;
    bool all_ok = true;
    for (int t = 0; t < nthreads; ++t) {
        pool[(size_t)t].join();
        total += scs[(size_t)t].nwritten;
        if (!ok[(size_t)t]) all_ok = false;
    }
    return all_ok ? total : -1;
}

}  // extern "C"
