// Native CPU backend for ssim_tpu.
//
// Role parity with the reference's CPU engine (the whole of
// /root/reference/src/ssim.cpp + its SIMD backends): a fast host-side
// SSIM for deployments without a TPU. The design is NOT a port of the
// reference's scatter-style blur; it is the same gather-style separable
// formulation as our TPU kernel (ops/ssim_pallas.py):
//
//   - clamp-to-edge borders (reference semantics, src/ssim.cpp:515-583)
//   - 11-tap separable Gaussian, radius 5, sigma 1.5, taps normalized in
//     double then rounded to float (windows.py parity)
//   - four blurred signals a, b, (a+b)^2, (a-b)^2; the sigma terms are
//     recovered by linearity (see ops/ssim_pallas.py vpass_all)
//   - f32 pixel math, f64 row accumulation (reference contract,
//     src/ssim.cpp:594)
//   - OpenMP parallelism over rows; compiler autovectorization does the
//     SIMD (no per-ISA intrinsics: that is the reference's approach, not
//     ours).
//
// Built as libssim_host.so (see Makefile), loaded via ctypes by
// ssim_tpu/ops/host.py.

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int kRadius = 5;
constexpr int kTaps = 2 * kRadius + 1;

void make_taps(float taps[kTaps]) {
    double g[kTaps];
    double sum = 0.0;
    for (int i = 0; i < kTaps; ++i) {
        const double d = i - kRadius;
        g[i] = std::exp(-(d * d) / (2.0 * 1.5 * 1.5));
        sum += g[i];
    }
    for (int i = 0; i < kTaps; ++i) taps[i] = static_cast<float>(g[i] / sum);
}

inline int clampi(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

}  // namespace

extern "C" int ssim_host_compute(const uint8_t* a, const uint8_t* b,
                                 int width, int height, double data_range,
                                 double* out_ssim, float* out_map) {
    if (a == nullptr || b == nullptr || out_ssim == nullptr || width < 1 ||
        height < 1) {
        return 22;  // EINVAL, reference errno convention
    }
    float taps[kTaps];
    make_taps(taps);
    const float c1 = static_cast<float>((0.01 * data_range) * (0.01 * data_range));
    const float c2 = static_cast<float>((0.03 * data_range) * (0.03 * data_range));

    const size_t plane = static_cast<size_t>(width) * height;
    // Horizontally blurred signals: mu_a, mu_b, (a+b)^2, (a-b)^2.
    std::vector<float> h_mu_a(plane), h_mu_b(plane), h_ss(plane), h_dd(plane);
    std::vector<double> row_sums(height, 0.0);

    // Pass 1: horizontal 11-tap blur of each input row, clamped columns.
#pragma omp parallel for schedule(static)
    for (int y = 0; y < height; ++y) {
        const uint8_t* ra = a + static_cast<size_t>(y) * width;
        const uint8_t* rb = b + static_cast<size_t>(y) * width;
        float* oa = h_mu_a.data() + static_cast<size_t>(y) * width;
        float* ob = h_mu_b.data() + static_cast<size_t>(y) * width;
        float* os = h_ss.data() + static_cast<size_t>(y) * width;
        float* od = h_dd.data() + static_cast<size_t>(y) * width;
        for (int x = 0; x < width; ++x) {
            float sa = 0.f, sb = 0.f, ss = 0.f, sd = 0.f;
            const bool interior = (x >= kRadius) && (x < width - kRadius);
            if (interior) {
#pragma omp simd reduction(+ : sa, sb, ss, sd)
                for (int k = 0; k < kTaps; ++k) {
                    const float va = ra[x - kRadius + k];
                    const float vb = rb[x - kRadius + k];
                    const float t = taps[k];
                    const float s = va + vb;
                    const float d = va - vb;
                    sa += t * va;
                    sb += t * vb;
                    ss += t * s * s;
                    sd += t * d * d;
                }
            } else {
                for (int k = 0; k < kTaps; ++k) {
                    const int xi = clampi(x - kRadius + k, 0, width - 1);
                    const float va = ra[xi];
                    const float vb = rb[xi];
                    const float t = taps[k];
                    const float s = va + vb;
                    const float d = va - vb;
                    sa += t * va;
                    sb += t * vb;
                    ss += t * s * s;
                    sd += t * d * d;
                }
            }
            oa[x] = sa;
            ob[x] = sb;
            os[x] = ss;
            od[x] = sd;
        }
    }

    // Pass 2: vertical 11-tap blur (clamped rows) + SSIM formula.
#pragma omp parallel for schedule(static)
    for (int y = 0; y < height; ++y) {
        const float* rows_a[kTaps];
        const float* rows_b[kTaps];
        const float* rows_s[kTaps];
        const float* rows_d[kTaps];
        for (int k = 0; k < kTaps; ++k) {
            const size_t yi = static_cast<size_t>(clampi(y - kRadius + k, 0, height - 1));
            rows_a[k] = h_mu_a.data() + yi * width;
            rows_b[k] = h_mu_b.data() + yi * width;
            rows_s[k] = h_ss.data() + yi * width;
            rows_d[k] = h_dd.data() + yi * width;
        }
        float* map_row = out_map ? out_map + static_cast<size_t>(y) * width : nullptr;
        double acc = 0.0;
#pragma omp simd reduction(+ : acc)
        for (int x = 0; x < width; ++x) {
            float mu_a = 0.f, mu_b = 0.f, s_ss = 0.f, s_dd = 0.f;
            for (int k = 0; k < kTaps; ++k) {
                const float t = taps[k];
                mu_a += t * rows_a[k][x];
                mu_b += t * rows_b[k][x];
                s_ss += t * rows_s[k][x];
                s_dd += t * rows_d[k][x];
            }
            const float mu_a2 = mu_a * mu_a;
            const float mu_b2 = mu_b * mu_b;
            const float mu_ab = mu_a * mu_b;
            const float sigma_ab_x4 = (s_ss - s_dd) - 4.f * mu_ab;
            const float sigma_sum_x2 = (s_ss + s_dd) - 2.f * (mu_a2 + mu_b2);
            const float num = (2.f * mu_ab + c1) * (0.5f * sigma_ab_x4 + c2);
            const float den = (mu_a2 + mu_b2 + c1) * (0.5f * sigma_sum_x2 + c2);
            const float v = num / den;
            if (map_row) map_row[x] = v;
            acc += static_cast<double>(v);
        }
        row_sums[y] = acc;
    }

    double total = 0.0;
    for (int y = 0; y < height; ++y) total += row_sums[y];
    *out_ssim = total / (static_cast<double>(width) * height);
    return 0;
}

extern "C" int ssim_host_thread_count(void) {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}
