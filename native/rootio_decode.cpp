// Native fast path for decoding STL-vector TBranchElement baskets.
//
// Mirrors the per-entry layout parsed by the pure-Python decoder in
// atlasvae/etl/rootio.py (Tree._stl_array): each entry is
//   [bytecount:4][version:2 (| kStreamedMemberWise -> +2 inner version)]
//   [outer count n:4]
//   depth 1: n * isz element bytes
//   depth 2: n times ([inner count m:4][m * isz element bytes])
// All integers big-endian.  Element bytes are byteswapped to native
// little-endian while copying, so the Python side views them with the
// native dtype and never pays a byteswapping concatenate.
//
// The Python loop costs ~12 us/entry (struct.unpack per header); this
// loop costs ~30 ns/entry, turning the ETL's basket decode from the
// conversion bottleneck into noise (measured in docs/PERF.md).  The
// reference gets the same job done inside uproot's compiled interpreters
// (ref tools/root_utils.py:16-28); this is the framework-native analog.
//
// Built on demand by atlasvae/etl/rootnative.py with g++ (no pybind11 in
// this environment; plain C ABI over ctypes).

#include <cstdint>
#include <cstring>

static inline uint32_t be32(const unsigned char* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16)
         | (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}
static inline uint16_t be16(const unsigned char* p) {
    return uint16_t((uint16_t(p[0]) << 8) | uint16_t(p[1]));
}

// Copy n big-endian elements of size isz, swapping to little-endian.
// (The elements land native-endian so the Python side never pays a
// byteswapping concatenate over the whole branch.)
static inline void copy_swapped(unsigned char* dst, const unsigned char* src,
                                long long n, int isz) {
    switch (isz) {
    case 1:
        memcpy(dst, src, (size_t) n);
        break;
    case 2:
        for (long long i = 0; i < n; ++i) {
            dst[2 * i] = src[2 * i + 1];
            dst[2 * i + 1] = src[2 * i];
        }
        break;
    case 4:
        for (long long i = 0; i < n; ++i) {
            dst[4 * i] = src[4 * i + 3];
            dst[4 * i + 1] = src[4 * i + 2];
            dst[4 * i + 2] = src[4 * i + 1];
            dst[4 * i + 3] = src[4 * i];
        }
        break;
    default:  // 8
        for (long long i = 0; i < n; ++i)
            for (int b = 0; b < 8; ++b)
                dst[8 * i + b] = src[8 * i + 7 - b];
    }
}

extern "C" {

// Decode the STL entries of one decompressed basket payload.
//
//   payload / plen   decompressed basket bytes
//   starts[n_entries] byte offset of each entry's bytecount word
//   depth            1 (vector<T>) or 2 (vector<vector<T>>)
//   isz              element size in bytes
//   flat / flat_cap  output element bytes (caller-allocated)
//   outer[n_entries] outer count per entry
//   inner / inner_cap inner count per inner vector (depth 2 only)
//
// Returns 0 on success and fills flat_len / n_inner.  On malformed
// input returns a negative code (err_entry = offending entry index):
//   -1 entry header reaches past the payload
//   -2 negative element count
//   -3 element data reaches past the payload
//   -4 output bound exceeded (overlapping/duplicated entry offsets)
long long rio_decode_stl(const unsigned char* payload, long long plen,
                         const long long* starts, long long n_entries,
                         int depth, int isz,
                         unsigned char* flat, long long flat_cap,
                         long long* flat_len,
                         long long* outer,
                         long long* inner, long long inner_cap,
                         long long* n_inner, long long* err_entry)
{
    const uint16_t kMemberWise = 0x4000;  // kStreamedMemberWise
    long long fl = 0, ni = 0;
    *err_entry = -1;
    for (long long e = 0; e < n_entries; ++e) {
        long long pos = starts[e];
        if (pos < 0 || pos + 6 > plen) { *err_entry = e; return -1; }
        pos += 4;                          // skip the bytecount word
        uint16_t ver = be16(payload + pos);
        pos += 2;
        if (ver & kMemberWise) {           // inner-class version word
            if (pos + 2 > plen) { *err_entry = e; return -1; }
            pos += 2;
        }
        if (pos + 4 > plen) { *err_entry = e; return -1; }
        int32_t n = (int32_t) be32(payload + pos);
        pos += 4;
        if (n < 0) { *err_entry = e; return -2; }
        outer[e] = n;
        if (depth == 1) {
            long long nbytes = (long long) n * isz;
            if (pos + nbytes > plen) { *err_entry = e; return -3; }
            if (fl + nbytes > flat_cap) { *err_entry = e; return -4; }
            copy_swapped(flat + fl, payload + pos, n, isz);
            fl += nbytes;
            continue;
        }
        for (int32_t j = 0; j < n; ++j) {
            if (pos + 4 > plen) { *err_entry = e; return -1; }
            int32_t m = (int32_t) be32(payload + pos);
            pos += 4;
            if (m < 0) { *err_entry = e; return -2; }
            long long nbytes = (long long) m * isz;
            if (pos + nbytes > plen) { *err_entry = e; return -3; }
            if (fl + nbytes > flat_cap || ni >= inner_cap) {
                *err_entry = e; return -4;
            }
            copy_swapped(flat + fl, payload + pos, m, isz);
            fl += nbytes;
            pos += nbytes;
            inner[ni++] = m;
        }
    }
    *flat_len = fl;
    *n_inner = ni;
    return 0;
}

}  // extern "C"
