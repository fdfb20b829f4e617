/* COCO RLE codec — C fast path (pycocotools-compatible string format).
 *
 * The reference stack uses pycocotools' C codec for mask export/IoU
 * (reference: predictor.py RLE encode/decode paths). This library provides the
 * same hot primitives for the TPU framework's host-side export pipeline:
 *   - rle_from_mask: Fortran-order binary mask -> run counts
 *   - rle_to_mask:   run counts -> Fortran-order binary mask
 *   - rle_encode_string / rle_decode_string: base-32 delta varint charset
 *
 * Called via ctypes from rgbdseg_tpu.native.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* mask (h*w bytes, Fortran order flattened by caller) -> counts.
 * Returns number of counts written; counts buffer must hold h*w+1 entries. */
long rle_from_mask(const uint8_t *mask, long n, int64_t *counts) {
    long nc = 0;
    uint8_t prev = 0; /* runs start with zeros */
    long run = 0;
    for (long i = 0; i < n; i++) {
        if (mask[i] != prev) {
            counts[nc++] = run;
            run = 0;
            prev = mask[i];
        }
        run++;
    }
    counts[nc++] = run;
    return nc;
}

/* counts -> mask (n bytes). Returns 0 on success, -1 on size mismatch. */
int rle_to_mask(const int64_t *counts, long nc, uint8_t *mask, long n) {
    long pos = 0;
    uint8_t val = 0;
    for (long i = 0; i < nc; i++) {
        long c = counts[i];
        if (pos + c > n) return -1;
        memset(mask + pos, val, (size_t)c);
        pos += c;
        val = !val;
    }
    return pos == n ? 0 : -1;
}

/* counts -> compressed string. out must hold 7 * nc + 1 bytes.
 * Returns string length. */
long rle_encode_string(const int64_t *counts, long nc, char *out) {
    long p = 0;
    for (long i = 0; i < nc; i++) {
        int64_t x = counts[i];
        if (i > 2) x -= counts[i - 2];
        int more = 1;
        while (more) {
            int c = (int)(x & 0x1f);
            x >>= 5;
            more = (c & 0x10) ? (x != -1) : (x != 0);
            if (more) c |= 0x20;
            out[p++] = (char)(c + 48);
        }
    }
    out[p] = 0;
    return p;
}

/* string -> counts. counts must hold strlen(s) entries. Returns count. */
long rle_decode_string(const char *s, long slen, int64_t *counts) {
    long nc = 0;
    long i = 0;
    while (i < slen) {
        int64_t x = 0;
        int k = 0;
        int more = 1;
        int c = 0;
        while (more) {
            c = s[i] - 48;
            x |= ((int64_t)(c & 0x1f)) << (5 * k);
            more = c & 0x20;
            i++;
            k++;
            if (!more && (c & 0x10)) x |= ((int64_t)-1) << (5 * k);
        }
        if (nc > 2) x += counts[nc - 2];
        counts[nc++] = x;
    }
    return nc;
}

/* Pairwise mask IoU from pre-decoded run-length areas: intersection of two
 * RLEs without materializing masks (pycocotools rleIou equivalent). */
double rle_iou(const int64_t *ca, long na, const int64_t *cb, long nb) {
    /* walk both run lists */
    long ia = 0, ib = 0;
    int64_t pa = ca[0], pb = cb[0];
    uint8_t va = 0, vb = 0;
    double inter = 0, area_a = 0, area_b = 0;
    for (long i = 0; i < na; i++) if (i & 1) area_a += (double)ca[i];
    for (long i = 0; i < nb; i++) if (i & 1) area_b += (double)cb[i];
    while (ia < na && ib < nb) {
        int64_t step = pa < pb ? pa : pb;
        if (va && vb) inter += (double)step;
        pa -= step;
        pb -= step;
        if (pa == 0 && ++ia < na) { pa = ca[ia]; va = !va; }
        if (pb == 0 && ++ib < nb) { pb = cb[ib]; vb = !vb; }
    }
    double uni = area_a + area_b - inter;
    return uni > 0 ? inter / uni : 0.0;
}
