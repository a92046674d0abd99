// Host-side warp interpolation kernels (C++).
//
// Native replacement for the reference's Numba gufuncs
// (elektronn3/data/coord_transforms.py:27-130): fused coordinate-offset
// + gather + trilinear blend in one pass over the output patch, instead
// of numpy's multi-temporary fancy indexing. Used by the host data
// pipeline (prefetch workers) via ctypes; see
// elektronn3_tpu/ops/native.py.
//
// Like the reference kernels, these do NO bounds checking — callers
// guarantee that every (coords - lo) [+1 for linear] lies within src.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libwarp_kernels.so \
//        warp_kernels.cpp

#include <cmath>
#include <cstdint>
#include <cstddef>

extern "C" {

// src: (D, H, W) row-major float32
// coords: (N, 3) float32 (z, y, x) absolute source coordinates
// lo: (3,) float32 offset subtracted from coords
// dest: (N,) float32 output
void map_coordinates_nearest_f32(
    const float* __restrict src,
    int64_t D, int64_t H, int64_t W,
    const float* __restrict coords,
    int64_t n,
    const float* __restrict lo,
    float* __restrict dest)
{
    const float lz = lo[0], ly = lo[1], lx = lo[2];
    const int64_t sHW = H * W;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t u = (int64_t)std::lround(coords[3 * i + 0] - lz);
        const int64_t v = (int64_t)std::lround(coords[3 * i + 1] - ly);
        const int64_t w = (int64_t)std::lround(coords[3 * i + 2] - lx);
        dest[i] = src[u * sHW + v * W + w];
    }
}

void map_coordinates_linear_f32(
    const float* __restrict src,
    int64_t D, int64_t H, int64_t W,
    const float* __restrict coords,
    int64_t n,
    const float* __restrict lo,
    float* __restrict dest)
{
    const float lz = lo[0], ly = lo[1], lx = lo[2];
    const int64_t sHW = H * W;
    for (int64_t i = 0; i < n; ++i) {
        const float u = coords[3 * i + 0] - lz;
        const float v = coords[3 * i + 1] - ly;
        const float w = coords[3 * i + 2] - lx;
        const int64_t u0 = (int64_t)u, v0 = (int64_t)v, w0 = (int64_t)w;
        const float du = u - (float)u0;
        const float dv = v - (float)v0;
        const float dw = w - (float)w0;
        const float* p000 = src + u0 * sHW + v0 * W + w0;
        const float* p100 = p000 + sHW;
        const float c000 = p000[0],     c001 = p000[1];
        const float c010 = p000[W],     c011 = p000[W + 1];
        const float c100 = p100[0],     c101 = p100[1];
        const float c110 = p100[W],     c111 = p100[W + 1];
        const float c00 = c000 * (1.f - dw) + c001 * dw;
        const float c01 = c010 * (1.f - dw) + c011 * dw;
        const float c10 = c100 * (1.f - dw) + c101 * dw;
        const float c11 = c110 * (1.f - dw) + c111 * dw;
        const float c0 = c00 * (1.f - dv) + c01 * dv;
        const float c1 = c10 * (1.f - dv) + c11 * dv;
        dest[i] = c0 * (1.f - du) + c1 * du;
    }
}

// Fused matrix transform + interpolation: computes
// src_coord = M_inv @ (z, y, x, 1) per output voxel and interpolates
// directly — no (N, 3) coordinate array materialization at all.
// M_inv: (4, 4) row-major. Homogeneous divide applied when
// perspective != 0.
void warp_interp_linear_f32(
    const float* __restrict src,
    int64_t D, int64_t H, int64_t W,
    const float* __restrict M_inv,
    int64_t PD, int64_t PH, int64_t PW,
    const float* __restrict lo,
    int perspective,
    float* __restrict dest)
{
    const float lz = lo[0], ly = lo[1], lx = lo[2];
    const int64_t sHW = H * W;
    const float m00 = M_inv[0], m01 = M_inv[1], m02 = M_inv[2], m03 = M_inv[3];
    const float m10 = M_inv[4], m11 = M_inv[5], m12 = M_inv[6], m13 = M_inv[7];
    const float m20 = M_inv[8], m21 = M_inv[9], m22 = M_inv[10], m23 = M_inv[11];
    const float m30 = M_inv[12], m31 = M_inv[13], m32 = M_inv[14], m33 = M_inv[15];
    int64_t idx = 0;
    for (int64_t z = 0; z < PD; ++z) {
        for (int64_t y = 0; y < PH; ++y) {
            for (int64_t x = 0; x < PW; ++x, ++idx) {
                const float fz = (float)z, fy = (float)y, fx = (float)x;
                float u = m00 * fz + m01 * fy + m02 * fx + m03;
                float v = m10 * fz + m11 * fy + m12 * fx + m13;
                float w = m20 * fz + m21 * fy + m22 * fx + m23;
                if (perspective) {
                    const float hdiv =
                        m30 * fz + m31 * fy + m32 * fx + m33;
                    const float inv = 1.f / hdiv;
                    u *= inv; v *= inv; w *= inv;
                }
                u -= lz; v -= ly; w -= lx;
                const int64_t u0 = (int64_t)u, v0 = (int64_t)v,
                              w0 = (int64_t)w;
                const float du = u - (float)u0;
                const float dv = v - (float)v0;
                const float dw = w - (float)w0;
                const float* p000 = src + u0 * sHW + v0 * W + w0;
                const float* p100 = p000 + sHW;
                const float c000 = p000[0],     c001 = p000[1];
                const float c010 = p000[W],     c011 = p000[W + 1];
                const float c100 = p100[0],     c101 = p100[1];
                const float c110 = p100[W],     c111 = p100[W + 1];
                const float c00 = c000 * (1.f - dw) + c001 * dw;
                const float c01 = c010 * (1.f - dw) + c011 * dw;
                const float c10 = c100 * (1.f - dw) + c101 * dw;
                const float c11 = c110 * (1.f - dw) + c111 * dw;
                const float c0 = c00 * (1.f - dv) + c01 * dv;
                const float c1 = c10 * (1.f - dv) + c11 * dv;
                dest[idx] = c0 * (1.f - du) + c1 * du;
            }
        }
    }
}

void warp_interp_nearest_f32(
    const float* __restrict src,
    int64_t D, int64_t H, int64_t W,
    const float* __restrict M_inv,
    int64_t PD, int64_t PH, int64_t PW,
    const float* __restrict lo,
    int perspective,
    float* __restrict dest)
{
    const float lz = lo[0], ly = lo[1], lx = lo[2];
    const int64_t sHW = H * W;
    const float m00 = M_inv[0], m01 = M_inv[1], m02 = M_inv[2], m03 = M_inv[3];
    const float m10 = M_inv[4], m11 = M_inv[5], m12 = M_inv[6], m13 = M_inv[7];
    const float m20 = M_inv[8], m21 = M_inv[9], m22 = M_inv[10], m23 = M_inv[11];
    const float m30 = M_inv[12], m31 = M_inv[13], m32 = M_inv[14], m33 = M_inv[15];
    int64_t idx = 0;
    for (int64_t z = 0; z < PD; ++z) {
        for (int64_t y = 0; y < PH; ++y) {
            for (int64_t x = 0; x < PW; ++x, ++idx) {
                const float fz = (float)z, fy = (float)y, fx = (float)x;
                float u = m00 * fz + m01 * fy + m02 * fx + m03;
                float v = m10 * fz + m11 * fy + m12 * fx + m13;
                float w = m20 * fz + m21 * fy + m22 * fx + m23;
                if (perspective) {
                    const float hdiv =
                        m30 * fz + m31 * fy + m32 * fx + m33;
                    const float inv = 1.f / hdiv;
                    u *= inv; v *= inv; w *= inv;
                }
                const int64_t ui = (int64_t)std::lround(u - lz);
                const int64_t vi = (int64_t)std::lround(v - ly);
                const int64_t wi = (int64_t)std::lround(w - lx);
                dest[idx] = src[ui * sHW + vi * W + wi];
            }
        }
    }
}

}  // extern "C"
