// COCO run-length-encoded mask codec + batched mask ops (C ABI).
//
// Fresh implementation of the public COCO RLE format (column-major runs of
// alternating 0/1, compressed-string form = 6-bit groups offset by 48 with
// a continuation bit, counts >= index 2 delta-encoded against counts[i-2]).
// Capability parity with the reference's vendored maskApi
// (pyutils/refer/external/maskApi.c): decode/encode/merge/area/iou, plus a
// batched decode+nearest-resize used by the input pipeline (the loader's
// per-ref "decode RLE then resize to blob" step,
// lib/loaders/gt_mrcn_loader.py:199-211) fused into one parallel C++ pass.
//
// Build: make -C csrc   (produces liblang2seg_rle.so; Python side falls
// back to a NumPy implementation when the .so is absent.)

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// ---------- string codec ----------

// Decode compressed RLE string -> uint32 counts. Returns number of counts,
// or -1 if out_cap insufficient (call again with bigger buffer).
int rle_str_decode(const char* s, int slen, uint32_t* out, int out_cap) {
    int n = 0;
    long prev2 = 0, prev1 = 0;
    int i = 0;
    while (i < slen) {
        long x = 0;
        int k = 0;
        bool more = true;
        while (more && i < slen) {
            long c = (long)(s[i]) - 48;
            x |= (c & 0x1f) << (5 * k);
            more = (c & 0x20) != 0;
            i++;
            k++;
            if (!more && (c & 0x10)) x |= -1L << (5 * k);  // sign extend
        }
        if (n > 1) x += prev2;
        if (n >= out_cap) return -1;
        out[n] = (uint32_t)x;
        prev2 = prev1;
        prev1 = x;
        n++;
    }
    return n;
}

// Encode uint32 counts -> compressed string. Returns string length, or -1
// if out_cap insufficient.
int rle_str_encode(const uint32_t* counts, int n, char* out, int out_cap) {
    int p = 0;
    for (int i = 0; i < n; i++) {
        long x = (long)counts[i];
        if (i > 1) x -= (long)counts[i - 2];
        bool more = true;
        while (more) {
            long c = x & 0x1f;
            x >>= 5;
            more = (c & 0x10) ? (x != -1) : (x != 0);
            if (more) c |= 0x20;
            c += 48;
            if (p >= out_cap) return -1;
            out[p++] = (char)c;
        }
    }
    return p;
}

// ---------- pixel codec ----------

// counts -> column-major binary mask of h*w entries.
void rle_decode(const uint32_t* counts, int n, uint8_t* mask, int64_t total) {
    int64_t pos = 0;
    uint8_t v = 0;
    for (int i = 0; i < n && pos < total; i++) {
        int64_t run = counts[i];
        if (run > total - pos) run = total - pos;
        memset(mask + pos, v, (size_t)run);
        pos += run;
        v = 1 - v;
    }
    if (pos < total) memset(mask + pos, 0, (size_t)(total - pos));
}

// column-major mask -> counts. Returns count length or -1 on overflow.
int rle_encode(const uint8_t* mask, int64_t total, uint32_t* out, int cap) {
    int n = 0;
    uint8_t cur = 0;
    int64_t run = 0;
    for (int64_t i = 0; i < total; i++) {
        uint8_t v = mask[i] ? 1 : 0;
        if (v != cur) {
            if (n >= cap) return -1;
            out[n++] = (uint32_t)run;
            run = 0;
            cur = v;
        }
        run++;
    }
    if (n >= cap) return -1;
    out[n++] = (uint32_t)run;
    return n;
}

// ---------- run-space ops (no pixel materialization) ----------

uint64_t rle_area(const uint32_t* counts, int n) {
    uint64_t a = 0;
    for (int i = 1; i < n; i += 2) a += counts[i];
    return a;
}

// merge (union if intersect=0, intersection if 1) two RLEs over the same
// h*w grid, in run space. Returns merged count length or -1.
int rle_merge(const uint32_t* a, int na, const uint32_t* b, int nb,
              int intersect, uint32_t* out, int cap) {
    int ia = 0, ib = 0, n = 0;
    uint64_t ra = na > 0 ? a[0] : 0, rb = nb > 0 ? b[0] : 0;
    uint8_t va = 0, vb = 0, vprev = 0;
    uint64_t run = 0;
    bool first = true;
    while (ia < na && ib < nb) {
        if (ra == 0) { ia++; if (ia < na) { va ^= 1; ra = a[ia]; } continue; }
        if (rb == 0) { ib++; if (ib < nb) { vb ^= 1; rb = b[ib]; } continue; }
        uint64_t step = std::min(ra, rb);
        uint8_t v = intersect ? (va & vb) : (va | vb);
        if (first) {
            if (v == 1) { if (n >= cap) return -1; out[n++] = 0; }
            vprev = v; run = step; first = false;
        } else if (v == vprev) {
            run += step;
        } else {
            if (n >= cap) return -1;
            out[n++] = (uint32_t)run;
            vprev = v; run = step;
        }
        ra -= step; rb -= step;
    }
    if (!first) { if (n >= cap) return -1; out[n++] = (uint32_t)run; }
    return n;
}

// IoU of two RLEs via run-space area computations.
double rle_iou(const uint32_t* a, int na, const uint32_t* b, int nb) {
    std::vector<uint32_t> tmp((size_t)(na + nb + 2));
    int ni = rle_merge(a, na, b, nb, 1, tmp.data(), (int)tmp.size());
    if (ni < 0) return -1.0;
    uint64_t inter = rle_area(tmp.data(), ni);
    uint64_t uni = rle_area(a, na) + rle_area(b, nb) - inter;
    return uni ? (double)inter / (double)uni : 0.0;
}

// ---------- batched input-pipeline op ----------

// Decode N RLE masks (concatenated counts, offsets) of size (h, w) each and
// nearest-resize into (out_h, out_w) uint8 canvases (row-major), using the
// exact-rational PIL-NEAREST mapping src = floor((d+0.5)*in/out). Output is
// written into out[N, out_h, out_w]; the region beyond (res_h, res_w) —
// the true resized extent within a padded canvas — is zeroed.
void rle_decode_resize_batch(
    const uint32_t* counts, const int64_t* offsets, const int* lens, int num,
    int h, int w, int out_h, int out_w, int res_h, int res_w, uint8_t* out) {
    std::vector<int> ys((size_t)res_h), xs((size_t)res_w);
    for (int i = 0; i < res_h; i++)
        ys[(size_t)i] = (int)(((2LL * i + 1) * h) / (2LL * res_h));
    for (int j = 0; j < res_w; j++)
        xs[(size_t)j] = (int)(((2LL * j + 1) * w) / (2LL * res_w));

    int64_t total = (int64_t)h * w;
    #pragma omp parallel
    {
        std::vector<uint8_t> buf((size_t)total);
        #pragma omp for schedule(dynamic)
        for (int m = 0; m < num; m++) {
            rle_decode(counts + offsets[m], lens[m], buf.data(), total);
            uint8_t* dst = out + (int64_t)m * out_h * out_w;
            memset(dst, 0, (size_t)out_h * out_w);
            for (int i = 0; i < res_h; i++) {
                const int sy = ys[(size_t)i];
                uint8_t* row = dst + (int64_t)i * out_w;
                for (int j = 0; j < res_w; j++) {
                    // column-major source: index = x * h + y
                    row[j] = buf[(size_t)xs[(size_t)j] * h + sy];
                }
            }
        }
    }
}

}  // extern "C"
