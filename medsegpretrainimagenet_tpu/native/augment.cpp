// Native batched augmentation kernels (OpenMP over the batch axis).
//
// The reference feeds its GPUs through torch DataLoader worker *processes*
// running per-item cv2/albumentations ops; these kernels batch the
// standard segmentation augmentations into one C call with OpenMP over
// the batch axis — no Python in the loop.  Product call sites: the
// readers' whole-stack u8->f32 conversion (u8_to_f32_scale, threaded vs
// numpy's single-core astype) — the geometric kernels are
// cv2-parity-validated (tests/test_native.py) and available to host
// pipelines on multi-core machines; the default augmentation path runs
// on-device (ops/augment.py) or per-item cv2.
//
// Semantics match cv2.warpAffine with getRotationMatrix2D((w/2-.5,h/2-.5),
// angle, 1.0): bilinear for images, nearest for masks, constant border.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC augment.cpp -o augment.so

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// (n, h, w, c) float32 images, per-sample angles in degrees.
void rotate_bilinear_f32(const float* in, float* out, int n, int h, int w,
                         int c, const float* angles_deg, float fill) {
#pragma omp parallel for schedule(static)
    for (int i = 0; i < n; ++i) {
        const float* img = in + (size_t)i * h * w * c;
        float* dst = out + (size_t)i * h * w * c;
        const double a = angles_deg[i] * M_PI / 180.0;
        const double ca = std::cos(a), sa = std::sin(a);
        const double cx = w / 2.0 - 0.5, cy = h / 2.0 - 0.5;
        for (int y = 0; y < h; ++y) {
            for (int x = 0; x < w; ++x) {
                // inverse map: dst(x,y) <- src(sx,sy)
                const double dx = x - cx, dy = y - cy;
                const double sx = ca * dx - sa * dy + cx;
                const double sy = sa * dx + ca * dy + cy;
                float* px = dst + ((size_t)y * w + x) * c;
                const int x0 = (int)std::floor(sx), y0 = (int)std::floor(sy);
                if (x0 < -1 || x0 >= w || y0 < -1 || y0 >= h) {
                    for (int k = 0; k < c; ++k) px[k] = fill;
                    continue;
                }
                const float fx = (float)(sx - x0), fy = (float)(sy - y0);
                const int x1 = x0 + 1, y1 = y0 + 1;
                const bool in00 = x0 >= 0 && y0 >= 0;
                const bool in01 = x1 < w && y0 >= 0;
                const bool in10 = x0 >= 0 && y1 < h;
                const bool in11 = x1 < w && y1 < h;
                for (int k = 0; k < c; ++k) {
                    const float v00 = in00 ? img[((size_t)y0 * w + x0) * c + k] : fill;
                    const float v01 = in01 ? img[((size_t)y0 * w + x1) * c + k] : fill;
                    const float v10 = in10 ? img[((size_t)y1 * w + x0) * c + k] : fill;
                    const float v11 = in11 ? img[((size_t)y1 * w + x1) * c + k] : fill;
                    px[k] = (1 - fy) * ((1 - fx) * v00 + fx * v01)
                          + fy * ((1 - fx) * v10 + fx * v11);
                }
            }
        }
    }
}

// (n, h, w, c) int32 masks, nearest-neighbour sampling.
void rotate_nearest_i32(const int32_t* in, int32_t* out, int n, int h, int w,
                        int c, const float* angles_deg, int32_t fill) {
#pragma omp parallel for schedule(static)
    for (int i = 0; i < n; ++i) {
        const int32_t* img = in + (size_t)i * h * w * c;
        int32_t* dst = out + (size_t)i * h * w * c;
        const double a = angles_deg[i] * M_PI / 180.0;
        const double ca = std::cos(a), sa = std::sin(a);
        const double cx = w / 2.0 - 0.5, cy = h / 2.0 - 0.5;
        for (int y = 0; y < h; ++y) {
            for (int x = 0; x < w; ++x) {
                const double dx = x - cx, dy = y - cy;
                const int sx = (int)std::lround(ca * dx - sa * dy + cx);
                const int sy = (int)std::lround(sa * dx + ca * dy + cy);
                int32_t* px = dst + ((size_t)y * w + x) * c;
                if (sx < 0 || sx >= w || sy < 0 || sy >= h) {
                    for (int k = 0; k < c; ++k) px[k] = fill;
                } else {
                    const int32_t* sp = img + ((size_t)sy * w + sx) * c;
                    for (int k = 0; k < c; ++k) px[k] = sp[k];
                }
            }
        }
    }
}

// Per-sample vertical/horizontal flips, any 4-byte element type.
void flip_batch_4(const void* in_, void* out_, int n, int h, int w, int c,
                  const uint8_t* flip_v, const uint8_t* flip_h) {
    const uint32_t* in = (const uint32_t*)in_;
    uint32_t* out = (uint32_t*)out_;
#pragma omp parallel for schedule(static)
    for (int i = 0; i < n; ++i) {
        const uint32_t* img = in + (size_t)i * h * w * c;
        uint32_t* dst = out + (size_t)i * h * w * c;
        const bool fv = flip_v[i], fh = flip_h[i];
        for (int y = 0; y < h; ++y) {
            const int sy = fv ? h - 1 - y : y;
            if (!fh) {
                std::memcpy(dst + (size_t)y * w * c,
                            img + (size_t)sy * w * c,
                            (size_t)w * c * sizeof(uint32_t));
            } else {
                for (int x = 0; x < w; ++x) {
                    const int sx = w - 1 - x;
                    std::memcpy(dst + ((size_t)y * w + x) * c,
                                img + ((size_t)sy * w + sx) * c,
                                (size_t)c * sizeof(uint32_t));
                }
            }
        }
    }
}

// uint8 -> float32 with /255 scaling (npy image ingestion).
void u8_to_f32_scale(const uint8_t* in, float* out, int64_t count) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < count; ++i) {
        out[i] = in[i] * (1.0f / 255.0f);
    }
}

}  // extern "C"
