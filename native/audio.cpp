// Host-side audio kernels (SURVEY.md C-N6: the reference leans on
// torchaudio's C++/sox and pydub/ffmpeg; these are the framework's native
// equivalents for the host paths that matter at serving scale).
//
// Exposed C ABI (ctypes):
//   resample_poly(in, n_in, taps, n_taps, up, down, out, n_out)
//       polyphase rational resampler; taps are the kaiser-sinc filter at
//       the upsampled rate (designed in Python, audio/resample.py),
//       center-aligned (group delay (n_taps-1)/2 compensated).
//   apply_fade(buf, n, fade_in_n, fade_out_n)      linear amplitude ramps
//   f32_to_i16(in, n, out)                          saturating conversion
//   i16_to_f32(in, n, out)
//   peak_normalize(buf, n, peak)

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// y[j] = sum_k taps[k] * x_up[j*down + delay - k] / up-stuffing collapsed:
// only every up-th x_up sample is nonzero -> per-output dot over ~n_taps/up
// input samples.
void resample_poly(const float* in, int64_t n_in, const float* taps,
                   int64_t n_taps, int64_t up, int64_t down, float* out,
                   int64_t n_out) {
    const int64_t delay = (n_taps - 1) / 2;
    for (int64_t j = 0; j < n_out; ++j) {
        // position of output j on the upsampled grid, filter centered
        const int64_t center = j * down + delay;
        double acc = 0.0;
        // x_up[m] nonzero iff m % up == 0, value in[m / up]
        // k = center - m with 0 <= k < n_taps
        int64_t m_lo = center - (n_taps - 1);
        if (m_lo < 0) m_lo = 0;
        // round m_lo up to a multiple of up
        int64_t m = ((m_lo + up - 1) / up) * up;
        for (; m <= center && m < n_in * up; m += up) {
            const int64_t k = center - m;
            acc += static_cast<double>(taps[k]) * in[m / up];
        }
        out[j] = static_cast<float>(acc);
    }
}

// Sample-exact match of AudioClip.fade_in/fade_out (audio/segment.py):
// np.linspace(0, 1, n) hits BOTH endpoints (gain i/(n-1)), unlike i/n.
void apply_fade(float* buf, int64_t n, int64_t fade_in_n, int64_t fade_out_n) {
    if (fade_in_n > n) fade_in_n = n;
    if (fade_out_n > n) fade_out_n = n;
    if (fade_in_n == 1) buf[0] = 0.0f;
    else
        for (int64_t i = 0; i < fade_in_n; ++i)
            buf[i] *= static_cast<float>(i) / static_cast<float>(fade_in_n - 1);
    if (fade_out_n == 1) { /* np.linspace(1,0,1) == [1.0]: no-op */ }
    else
        for (int64_t i = 0; i < fade_out_n; ++i)
            buf[n - 1 - i] *= static_cast<float>(i) / static_cast<float>(fade_out_n - 1);
}

// Sample-exact match of AudioClip.to_int16 (audio/segment.py):
// clip to [-1, 1], scale by 32767, TRUNCATE toward zero like
// ndarray.astype(int16) — lrintf rounding differed by 1 LSB.
void f32_to_i16(const float* in, int64_t n, int16_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        float v = in[i];
        if (v > 1.0f) v = 1.0f;
        if (v < -1.0f) v = -1.0f;
        out[i] = static_cast<int16_t>(v * 32767.0f);
    }
}

void i16_to_f32(const int16_t* in, int64_t n, float* out) {
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] / 32768.0f;
}

void peak_normalize(float* buf, int64_t n, float peak) {
    float m = 1e-6f;
    for (int64_t i = 0; i < n; ++i) {
        float a = fabsf(buf[i]);
        if (a > m) m = a;
    }
    const float g = peak / m;
    for (int64_t i = 0; i < n; ++i) buf[i] *= g;
}

}  // extern "C"
