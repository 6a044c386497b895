// Native host kernels for analiticcl-tpu: batch greedy alphabet
// normalization and prime-product anagram values.
//
// The reference's only "native" role is Rust host code; here the host hot
// paths (lexicon ingestion at million-entry scale, SURVEY.md §7 stage 1) are
// C++ with a plain C ABI consumed via ctypes (analiticcl_tpu/utils/native.py).
//
// Semantics mirror /root/reference/src/anahash.rs:14-81: at every byte
// position, alphabet elements are tried in file order (first match wins, even
// if a later element would match longer); unknown input advances one UTF-8
// codepoint and records the UNK class.

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Element {
    std::string text;
    int32_t cls;
    int32_t order;  // global order of appearance
};

struct Matcher {
    int32_t n_classes = 0;
    // elements bucketed by first byte, each bucket in global order
    std::vector<Element> buckets[256];
    bool single_byte_only = true;
    int32_t bytemap[256];  // fast path when all elements are single ASCII bytes
};

inline int utf8_len(unsigned char c) {
    if (c < 0x80) return 1;
    if ((c >> 5) == 0x6) return 2;
    if ((c >> 4) == 0xe) return 3;
    if ((c >> 3) == 0x1e) return 4;
    return 1;  // invalid byte: treat as single
}

}  // namespace

extern "C" {

// Build a matcher. elements: concatenated UTF-8 bytes; elem_offsets has
// n_elements+1 entries; elem_class maps each element to its alphabet class.
void* ananorm_build(const char* elements, const int64_t* elem_offsets,
                    const int32_t* elem_class, int32_t n_elements,
                    int32_t n_classes) {
    Matcher* m = new Matcher();
    m->n_classes = n_classes;
    for (int i = 0; i < 256; i++) m->bytemap[i] = -1;
    for (int32_t e = 0; e < n_elements; e++) {
        int64_t start = elem_offsets[e], end = elem_offsets[e + 1];
        if (end <= start) continue;
        Element el;
        el.text.assign(elements + start, elements + end);
        el.cls = elem_class[e];
        el.order = e;
        unsigned char first = (unsigned char)el.text[0];
        if (el.text.size() != 1 || first >= 0x80) m->single_byte_only = false;
        if (el.text.size() == 1 && first < 0x80 && m->bytemap[first] < 0)
            m->bytemap[first] = el.cls;
        m->buckets[first].push_back(std::move(el));
    }
    return m;
}

void ananorm_free(void* handle) { delete static_cast<Matcher*>(handle); }

// Normalize a batch of texts. texts: concatenated UTF-8; text_offsets has
// n_texts+1 entries. Outputs: out_norms [n_texts, max_len] int32 (0-padded),
// out_lens [n_texts] int32 (true length, possibly > max_len, in which case the
// norm is truncated). UNK class index = n_classes + 1 (anahash.rs:76).
void ananorm_normalize_batch(void* handle, const char* texts,
                             const int64_t* text_offsets, int32_t n_texts,
                             int32_t max_len, int32_t* out_norms,
                             int32_t* out_lens) {
    Matcher* m = static_cast<Matcher*>(handle);
    const int32_t unk = m->n_classes + 1;
    for (int32_t t = 0; t < n_texts; t++) {
        const char* s = texts + text_offsets[t];
        int64_t n = text_offsets[t + 1] - text_offsets[t];
        int32_t* out = out_norms + (int64_t)t * max_len;
        int32_t len = 0;
        int64_t i = 0;
        while (i < n) {
            unsigned char c = (unsigned char)s[i];
            int32_t cls = -1;
            int64_t adv = 0;
            if (m->single_byte_only && c < 0x80) {
                cls = m->bytemap[c];
                adv = 1;
            } else {
                const std::vector<Element>& bucket = m->buckets[c];
                // first element (in global order) that matches here wins;
                // buckets are per-first-byte, but global order must be
                // respected across buckets only for same start byte, which
                // bucket order preserves
                for (const Element& el : bucket) {
                    int64_t blen = (int64_t)el.text.size();
                    if (blen <= n - i && memcmp(el.text.data(), s + i, blen) == 0) {
                        cls = el.cls;
                        adv = blen;
                        break;
                    }
                }
            }
            if (cls < 0) {
                cls = unk;
                adv = utf8_len(c);
                if (adv > n - i) adv = n - i;
            }
            if (len < max_len) out[len] = cls;
            len++;
            i += adv;
        }
        out_lens[t] = len;
    }
}

// Count vectors from normalized strings: out_counts [n_texts, n_slots] uint8
// (saturating at 255). Norm entries >= unk_norm_index (or out of range) land
// in the UNK slot n_slots-1 (anahash.rs:42 convention).
void ananorm_counts_batch(const int32_t* norms, const int32_t* lens,
                          int32_t n_texts, int32_t max_len, int32_t n_slots,
                          uint8_t* out_counts) {
    for (int32_t t = 0; t < n_texts; t++) {
        const int32_t* nm = norms + (int64_t)t * max_len;
        uint8_t* out = out_counts + (int64_t)t * n_slots;
        memset(out, 0, n_slots);
        int32_t len = lens[t] < max_len ? lens[t] : max_len;
        for (int32_t k = 0; k < len; k++) {
            int32_t cls = nm[k];
            if (cls < 0 || cls >= n_slots) cls = n_slots - 1;
            if (out[cls] != 255) out[cls]++;
        }
    }
}

// Prime-product anagram values as 64-byte big-endian integers (for exact
// canonical sorting; reference sorts anagram values numerically,
// lib.rs:222-245 / BTreeSet). norms/lens as produced above; primes has
// n_classes+1 entries (last = UNK prime, anahash.rs:42). Values overflowing
// 512 bits saturate to all-0xFF (sorts last; such words are >160 chars).
void ananorm_anavalue_batch(const int32_t* norms, const int32_t* lens,
                            int32_t n_texts, int32_t max_len,
                            const uint32_t* primes, int32_t n_primes,
                            int32_t unk_norm_index, uint8_t* out_bytes) {
    const int NB = 64;  // bytes per value
    const int NW = 16;  // 32-bit words
    std::vector<uint32_t> acc(NW);
    for (int32_t t = 0; t < n_texts; t++) {
        std::fill(acc.begin(), acc.end(), 0u);
        acc[0] = 1u;
        bool overflow = false;
        const int32_t* nm = norms + (int64_t)t * max_len;
        int32_t len = lens[t] < max_len ? lens[t] : max_len;
        for (int32_t k = 0; k < len && !overflow; k++) {
            int32_t cls = nm[k];
            if (cls == unk_norm_index) cls = n_primes - 1;  // UNK slot
            if (cls < 0 || cls >= n_primes) cls = n_primes - 1;
            uint64_t p = primes[cls];
            uint64_t carry = 0;
            for (int w = 0; w < NW; w++) {
                uint64_t v = (uint64_t)acc[w] * p + carry;
                acc[w] = (uint32_t)v;
                carry = v >> 32;
            }
            if (carry) overflow = true;
        }
        uint8_t* out = out_bytes + (int64_t)t * NB;
        if (overflow) {
            memset(out, 0xFF, NB);
        } else {
            // big-endian for lexicographic = numeric comparison
            for (int w = 0; w < NW; w++) {
                uint32_t v = acc[NW - 1 - w];
                out[w * 4 + 0] = (uint8_t)(v >> 24);
                out[w * 4 + 1] = (uint8_t)(v >> 16);
                out[w * 4 + 2] = (uint8_t)(v >> 8);
                out[w * 4 + 3] = (uint8_t)v;
            }
        }
    }
}

}  // extern "C"
