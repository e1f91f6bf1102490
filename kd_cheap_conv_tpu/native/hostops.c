/* Native host-side data-path kernels for the input pipeline.
 *
 * The reference's host path is per-worker Python/PIL (SURVEY.md §2.5 notes
 * the reference has no native code of its own — its native surface is stock
 * libtorch). Here the loader's per-sample hot ops are C with OpenMP:
 *
 *  - remap_u8:        256-entry LUT label remap (Cityscapes 34->19 train ids)
 *  - normalize_u8_f32: fused (x/255 - mean)/std uint8 HWC -> float32 HWC
 *  - hflip_u8:        joint horizontal flip (image HWC + label HW)
 *
 * Built by native/build.py with gcc -O3; loaded via ctypes; the numpy
 * fallbacks in data/transforms.py stay as the portable reference
 * implementation (and the parity oracle in tests/test_native.py).
 */

#include <stddef.h>
#include <stdint.h>

void remap_u8(const uint8_t *in, uint8_t *out, const uint8_t *table,
              size_t n) {
#pragma omp parallel for schedule(static)
  for (size_t i = 0; i < n; ++i) {
    out[i] = table[in[i]];
  }
}

/* img: HWC uint8 with C==3; out: HWC float32.
 * scale[c] = 1 / (255 * std[c]); bias[c] = -mean[c] / std[c].
 * out = in * scale + bias  ==  (in/255 - mean) / std, precomputed on host. */
void normalize_u8_f32(const uint8_t *in, float *out, const float *scale,
                      const float *bias, size_t npix) {
#pragma omp parallel for schedule(static)
  for (size_t i = 0; i < npix; ++i) {
    const uint8_t *p = in + 3 * i;
    float *q = out + 3 * i;
    q[0] = p[0] * scale[0] + bias[0];
    q[1] = p[1] * scale[1] + bias[1];
    q[2] = p[2] * scale[2] + bias[2];
  }
}

/* horizontal flip, row-major HWC (c = 1 or 3) */
void hflip_u8(const uint8_t *in, uint8_t *out, size_t h, size_t w, size_t c) {
#pragma omp parallel for schedule(static)
  for (size_t y = 0; y < h; ++y) {
    const uint8_t *row = in + y * w * c;
    uint8_t *orow = out + y * w * c;
    for (size_t x = 0; x < w; ++x) {
      const uint8_t *src = row + (w - 1 - x) * c;
      uint8_t *dst = orow + x * c;
      for (size_t k = 0; k < c; ++k) dst[k] = src[k];
    }
  }
}
