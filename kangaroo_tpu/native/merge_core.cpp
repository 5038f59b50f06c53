// Native merge core for kangaroo-tpu work files.
//
// Streamed 2-way sorted merge of distinguished-point buckets, the hot
// path of offline work-file merging (the reference's record runs merged
// hundreds of GB through this loop; C++ keeps the TPU rebuild's merge
// throughput at parity with the reference's native Merge.cpp /
// PartMerge.cpp).  Bucket format per hash slot, little-endian:
//     u32 nbItem, u32 maxItem, nbItem * 32-byte entries {x:16B, d:16B}
// Entries are sorted by x (unsigned 128-bit, little-endian).  Semantics
// mirror HashTable::MergeH (HashTable.cpp:106-219): equal x + equal d
// counts a duplicate, equal x + different d reports a collision (the
// file-1 entry is kept either way).
//
// Exposed via a tiny C ABI consumed with ctypes -- no pybind11 needed.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Entry {
    uint8_t x[16];
    uint8_t d[16];
};

// unsigned little-endian 128-bit compare
inline int cmp128(const uint8_t* a, const uint8_t* b) {
    for (int i = 15; i >= 0; --i) {
        if (a[i] != b[i]) return a[i] < b[i] ? -1 : 1;
    }
    return 0;
}

inline uint32_t round4(uint32_t n) { return (n % 4 == 0) ? n : ((n / 4) + 1) * 4; }

bool read_u32(FILE* f, uint32_t* v) { return fread(v, 4, 1, f) == 1; }

}  // namespace

extern "C" {

// Merge `n_buckets` consecutive buckets from (f1 at off1) and (f2 at
// off2) into dest (appended at dest_off).  Returns total merged DPs or
// -1 on IO error.  dup_out accumulates duplicate count; collisions are
// reported as (d1,d2) 32-byte pairs, up to max_coll of them.
// coll_total_out counts EVERY collision seen (it can exceed max_coll;
// the caller detects buffer overflow by coll_total > n_coll and re-runs
// with a larger buffer -- no collision may ever be silently dropped,
// a dropped tame/wild pair could be the solving one).
long long kt_merge_buckets(const char* f1_path, long long off1,
                           const char* f2_path, long long off2,
                           const char* dest_path, long long dest_off,
                           uint32_t n_buckets,
                           unsigned long long* dup_out,
                           uint8_t* collisions, uint32_t* n_coll,
                           uint32_t max_coll,
                           unsigned long long* coll_total_out) {
    FILE* f1 = fopen(f1_path, "rb");
    FILE* f2 = fopen(f2_path, "rb");
    FILE* fd = fopen(dest_path, "rb+");
    if (!fd) fd = fopen(dest_path, "wb");
    long long total = -1;
    std::vector<Entry> b1, b2, out;
    if (f1 && f2 && fd && fseek(f1, (long)off1, SEEK_SET) == 0 &&
        fseek(f2, (long)off2, SEEK_SET) == 0 &&
        fseek(fd, (long)dest_off, SEEK_SET) == 0) {
        total = 0;
        *dup_out = 0;
        *n_coll = 0;
        *coll_total_out = 0;
        for (uint32_t h = 0; h < n_buckets; ++h) {
            uint32_t n1, m1, n2, m2;
            if (!read_u32(f1, &n1) || !read_u32(f1, &m1) ||
                !read_u32(f2, &n2) || !read_u32(f2, &m2)) {
                total = -1;
                break;
            }
            b1.resize(n1);
            b2.resize(n2);
            if (n1 && fread(b1.data(), 32, n1, f1) != n1) { total = -1; break; }
            if (n2 && fread(b2.data(), 32, n2, f2) != n2) { total = -1; break; }
            out.clear();
            out.reserve(n1 + n2);
            uint32_t i = 0, j = 0, dup = 0;
            while (i < n1 && j < n2) {
                int c = cmp128(b1[i].x, b2[j].x);
                if (c < 0) {
                    out.push_back(b1[i++]);
                } else if (c > 0) {
                    out.push_back(b2[j++]);
                } else {
                    if (memcmp(b1[i].d, b2[j].d, 16) == 0) {
                        ++dup;
                    } else {
                        ++(*coll_total_out);
                        if (*n_coll < max_coll) {
                            memcpy(collisions + 32ull * (*n_coll), b1[i].d, 16);
                            memcpy(collisions + 32ull * (*n_coll) + 16, b2[j].d,
                                   16);
                            ++(*n_coll);
                        }
                    }
                    out.push_back(b1[i]);  // keep the file-1 entry
                    ++i;
                    ++j;
                }
            }
            for (; i < n1; ++i) out.push_back(b1[i]);
            for (; j < n2; ++j) out.push_back(b2[j]);
            uint32_t nbd = (uint32_t)out.size();
            uint32_t md = round4(nbd);
            if (fwrite(&nbd, 4, 1, fd) != 1 || fwrite(&md, 4, 1, fd) != 1) {
                total = -1;
                break;
            }
            if (nbd && fwrite(out.data(), 32, nbd, fd) != nbd) {
                total = -1;
                break;
            }
            total += nbd;
            *dup_out += dup;
        }
    }
    if (f1) fclose(f1);
    if (f2) fclose(f2);
    if (fd) fclose(fd);
    return total;
}

// Per-bucket scan: fill nb_out[i] / max_out[i] with each bucket's
// nbItem / maxItem without reading entries (hashtable stats for
// -winfo on large files; the reference's SeekNbItem analog,
// HashTable.cpp:418-441).  Returns total DPs or -1 on IO error.
long long kt_scan_buckets(const char* path, long long off, uint32_t n_buckets,
                          uint32_t* nb_out, uint32_t* max_out) {
    FILE* f = fopen(path, "rb");
    if (!f || fseek(f, (long)off, SEEK_SET) != 0) {
        if (f) fclose(f);
        return -1;
    }
    long long total = 0;
    for (uint32_t h = 0; h < n_buckets; ++h) {
        uint32_t nb, mx;
        if (!read_u32(f, &nb) || !read_u32(f, &mx)) {
            total = -1;
            break;
        }
        nb_out[h] = nb;
        max_out[h] = mx;
        if (fseek(f, 32L * nb, SEEK_CUR) != 0) {
            total = -1;
            break;
        }
        total += nb;
    }
    fclose(f);
    return total;
}

// Re-count helper: scan n_buckets from a file, returning the DP total
// (used by -winfo style tooling on big files without Python loops).
long long kt_count_buckets(const char* path, long long off, uint32_t n_buckets) {
    FILE* f = fopen(path, "rb");
    if (!f || fseek(f, (long)off, SEEK_SET) != 0) {
        if (f) fclose(f);
        return -1;
    }
    long long total = 0;
    for (uint32_t h = 0; h < n_buckets; ++h) {
        uint32_t nb, mx;
        if (!read_u32(f, &nb) || !read_u32(f, &mx)) {
            total = -1;
            break;
        }
        if (fseek(f, 32L * nb, SEEK_CUR) != 0) {
            total = -1;
            break;
        }
        total += nb;
    }
    fclose(f);
    return total;
}

}  // extern "C"
