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
    // Vectorization shape: build clamp-padded f32 rows of the four
    // signals, then run x-contiguous loops whose 11 shifted loads the
    // compiler turns into vector loads (the tap loop as the INNER
    // reduction vectorizes horizontally and ~4x slower — measured).
    // Symmetric taps pair as t[d]*(row[x-d] + row[x+d]), the same 6-mul
    // factorization as the reference (src/ssim.cpp:366-449) and our TPU
    // hpass.
#pragma omp parallel
    {
        std::vector<float> fa(width + 2 * kRadius), fb(width + 2 * kRadius),
            fs(width + 2 * kRadius), fd(width + 2 * kRadius);
#pragma omp for schedule(static)
        for (int y = 0; y < height; ++y) {
            const uint8_t* ra = a + static_cast<size_t>(y) * width;
            const uint8_t* rb = b + static_cast<size_t>(y) * width;
            for (int x = -kRadius; x < width + kRadius; ++x) {
                const int xi = clampi(x, 0, width - 1);
                const float va = ra[xi];
                const float vb = rb[xi];
                const float s = va + vb;
                const float d = va - vb;
                fa[x + kRadius] = va;
                fb[x + kRadius] = vb;
                fs[x + kRadius] = s * s;
                fd[x + kRadius] = d * d;
            }
            float* oa = h_mu_a.data() + static_cast<size_t>(y) * width;
            float* ob = h_mu_b.data() + static_cast<size_t>(y) * width;
            float* os = h_ss.data() + static_cast<size_t>(y) * width;
            float* od = h_dd.data() + static_cast<size_t>(y) * width;
            const float* pa = fa.data() + kRadius;
            const float* pb = fb.data() + kRadius;
            const float* ps = fs.data() + kRadius;
            const float* pd = fd.data() + kRadius;
#pragma omp simd
            for (int x = 0; x < width; ++x) {
                float sa = taps[kRadius] * pa[x];
                float sb = taps[kRadius] * pb[x];
                float ss = taps[kRadius] * ps[x];
                float sd = taps[kRadius] * pd[x];
                for (int d = kRadius; d > 0; --d) {  // smallest taps first
                    const float t = taps[kRadius - d];
                    sa += t * (pa[x - d] + pa[x + d]);
                    sb += t * (pb[x - d] + pb[x + d]);
                    ss += t * (ps[x - d] + ps[x + d]);
                    sd += t * (pd[x - d] + pd[x + d]);
                }
                oa[x] = sa;
                ob[x] = sb;
                os[x] = ss;
                od[x] = sd;
            }
        }
    }

    // Pass 2: vertical 11-tap blur (clamped rows) + SSIM formula. The
    // per-pixel values land in a scratch row first: a conditional map
    // write inside the loop is "control flow in loop" to the
    // vectorizer and blocks it entirely (compiler vec report).
#pragma omp parallel
    {
        std::vector<float> vrow(width);
#pragma omp for schedule(static)
        for (int y = 0; y < height; ++y) {
            const float* rows_a[kTaps];
            const float* rows_b[kTaps];
            const float* rows_s[kTaps];
            const float* rows_d[kTaps];
            for (int k = 0; k < kTaps; ++k) {
                const size_t yi =
                    static_cast<size_t>(clampi(y - kRadius + k, 0, height - 1));
                rows_a[k] = h_mu_a.data() + yi * width;
                rows_b[k] = h_mu_b.data() + yi * width;
                rows_s[k] = h_ss.data() + yi * width;
                rows_d[k] = h_dd.data() + yi * width;
            }
            float* vr = vrow.data();
#pragma omp simd
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
                vr[x] = num / den;
            }
            if (out_map) {
                std::memcpy(out_map + static_cast<size_t>(y) * width, vr,
                            static_cast<size_t>(width) * sizeof(float));
            }
            double acc = 0.0;
#pragma omp simd reduction(+ : acc)
            for (int x = 0; x < width; ++x) acc += static_cast<double>(vr[x]);
            row_sums[y] = acc;
        }
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
