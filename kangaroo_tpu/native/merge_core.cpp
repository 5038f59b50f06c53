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

// ---------------------------------------------------------------------
// Native DP hash table (reference layout: 2^18 buckets of sorted
// 32-byte entries, HashTable.{h,cpp}).  The Python dict table costs
// ~1.3 us per insert plus per-item ctypes/bignum overhead; this table
// takes whole drained batches in one call and serializes/loads the
// HEADW bucket region directly, making 10^7+-DP tables practical.
// ---------------------------------------------------------------------

namespace {

constexpr uint32_t KT_HASH_SIZE = 1u << 18;

struct HtBucket {
    std::vector<Entry> v;  // sorted by x (cmp128)
};

struct KtHashTable {
    std::vector<HtBucket> b;
    uint64_t n = 0;
    KtHashTable() : b(KT_HASH_SIZE) {}
};

inline uint32_t ref_max_item_c(uint32_t nb) {
    if (nb == 0) return 0;
    if (nb <= 15) return 16;
    return 4 * ((nb + 4) / 4);
}

}  // namespace

extern "C" {

void* kt_ht_new() { return new KtHashTable(); }

void kt_ht_free(void* h) { delete static_cast<KtHashTable*>(h); }

void kt_ht_reset(void* h) {
    auto* t = static_cast<KtHashTable*>(h);
    for (auto& bk : t->b) bk.v.clear();
    t->n = 0;
}

unsigned long long kt_ht_nitems(void* h) {
    return static_cast<KtHashTable*>(h)->n;
}

// Insert a batch of records (each 36 B: u32 bucket, x128, d128, all
// little-endian).  Semantics of HashTable::Add (HashTable.cpp:262-307):
// new x -> insert sorted; same x same d -> duplicate; same x diff d ->
// collision, existing entry kept.  Duplicate record indices go to
// dup_idx (u32 each, up to max_dup; total always in *dup_total);
// collisions emit 52-byte records {x128, d_new128, d_old128, u32 idx}
// up to max_coll with the true total in *coll_total.  Returns the
// number of newly inserted entries, or -1 on a malformed bucket id.
long long kt_ht_add_batch(void* h, const uint8_t* recs, uint32_t n,
                          uint32_t* dup_idx, uint32_t* n_dup,
                          uint32_t max_dup,
                          unsigned long long* dup_total,
                          uint8_t* coll, uint32_t* n_coll,
                          uint32_t max_coll,
                          unsigned long long* coll_total) {
    auto* t = static_cast<KtHashTable*>(h);
    *n_dup = 0;
    *dup_total = 0;
    *n_coll = 0;
    *coll_total = 0;
    long long added = 0;
    for (uint32_t i = 0; i < n; ++i) {
        const uint8_t* r = recs + 36ull * i;
        uint32_t hb;
        memcpy(&hb, r, 4);
        if (hb >= KT_HASH_SIZE) return -1;
        Entry e;
        memcpy(e.x, r + 4, 16);
        memcpy(e.d, r + 20, 16);
        auto& v = t->b[hb].v;
        size_t lo = 0, hi = v.size();
        while (lo < hi) {
            size_t mid = (lo + hi) / 2;
            if (cmp128(v[mid].x, e.x) < 0)
                lo = mid + 1;
            else
                hi = mid;
        }
        if (lo < v.size() && cmp128(v[lo].x, e.x) == 0) {
            if (memcmp(v[lo].d, e.d, 16) == 0) {
                ++(*dup_total);
                if (*n_dup < max_dup) dup_idx[(*n_dup)++] = i;
            } else {
                ++(*coll_total);
                if (*n_coll < max_coll) {
                    uint8_t* c = coll + 52ull * (*n_coll);
                    memcpy(c, e.x, 16);
                    memcpy(c + 16, e.d, 16);
                    memcpy(c + 32, v[lo].d, 16);
                    memcpy(c + 48, &i, 4);
                    ++(*n_coll);
                }
            }
        } else {
            v.insert(v.begin() + lo, e);
            ++t->n;
            ++added;
        }
    }
    return added;
}

// Serialize the bucket region in HEADW layout at `off` (the file is
// created/extended as needed).  max_item_style: 0 = solver allocator
// growth pattern (ref_max_item), 1 = merge round-up-to-4.  Returns
// bytes written or -1.
// Span variant: serialize buckets [hb0, hb1) only, so a background
// save can release the table lock between spans (bounded stall).
long long kt_ht_write_span(void* h, const char* path, long long off,
                           int max_item_style, uint32_t hb0, uint32_t hb1) {
    auto* t = static_cast<KtHashTable*>(h);
    if (hb1 > KT_HASH_SIZE || hb0 > hb1) return -1;
    FILE* f = fopen(path, "rb+");
    if (!f) f = fopen(path, "wb");
    if (!f) return -1;
    if (fseek(f, (long)off, SEEK_SET) != 0) {
        fclose(f);
        return -1;
    }
    long long written = 0;
    for (uint32_t hb = hb0; hb < hb1; ++hb) {
        auto& v = t->b[hb].v;
        uint32_t nb = (uint32_t)v.size();
        uint32_t mx = max_item_style ? round4(nb) : ref_max_item_c(nb);
        if (fwrite(&nb, 4, 1, f) != 1 || fwrite(&mx, 4, 1, f) != 1) {
            fclose(f);
            return -1;
        }
        if (nb && fwrite(v.data(), 32, nb, f) != nb) {
            fclose(f);
            return -1;
        }
        written += 8 + 32ll * nb;
    }
    fclose(f);
    return written;
}

long long kt_ht_write(void* h, const char* path, long long off,
                      int max_item_style) {
    return kt_ht_write_span(h, path, off, max_item_style, 0, KT_HASH_SIZE);
}

// Load a HEADW bucket region from `off`, REPLACING the table contents.
// Returns bytes consumed or -1.
long long kt_ht_read(void* h, const char* path, long long off) {
    auto* t = static_cast<KtHashTable*>(h);
    FILE* f = fopen(path, "rb");
    if (!f || fseek(f, (long)off, SEEK_SET) != 0) {
        if (f) fclose(f);
        return -1;
    }
    kt_ht_reset(h);
    long long consumed = 0;
    for (uint32_t hb = 0; hb < KT_HASH_SIZE; ++hb) {
        uint32_t nb, mx;
        if (!read_u32(f, &nb) || !read_u32(f, &mx)) {
            fclose(f);
            return -1;
        }
        auto& v = t->b[hb].v;
        v.resize(nb);
        if (nb && fread(v.data(), 32, nb, f) != nb) {
            fclose(f);
            return -1;
        }
        t->n += nb;
        consumed += 8 + 32ll * nb;
    }
    fclose(f);
    return consumed;
}

// Per-bucket counts for stats; returns the item total.
long long kt_ht_stats(void* h, uint32_t* nb_out) {
    auto* t = static_cast<KtHashTable*>(h);
    long long total = 0;
    for (uint32_t hb = 0; hb < KT_HASH_SIZE; ++hb) {
        nb_out[hb] = (uint32_t)t->b[hb].v.size();
        total += nb_out[hb];
    }
    return total;
}

// Export all entries in file order (bucket asc, x asc) as 36-byte
// records {u32 bucket, x128, d128} into `out` (caller sizes it from
// kt_ht_nitems).  Returns the record count.
long long kt_ht_export(void* h, uint8_t* out) {
    auto* t = static_cast<KtHashTable*>(h);
    long long k = 0;
    for (uint32_t hb = 0; hb < KT_HASH_SIZE; ++hb) {
        for (const Entry& e : t->b[hb].v) {
            uint8_t* r = out + 36ull * k;
            memcpy(r, &hb, 4);
            memcpy(r + 4, e.x, 16);
            memcpy(r + 20, e.d, 16);
            ++k;
        }
    }
    return k;
}

}  // extern "C"
