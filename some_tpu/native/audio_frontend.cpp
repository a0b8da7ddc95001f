// Native host audio frontend: RMS envelope + silence-slicer scan.
//
// The waveform->chunks step runs on host before every inference call; at
// multi-thousand-x real-time the Python frame loop becomes a measurable
// fraction of wall clock. This implements the same envelope + state machine
// as some_tpu/audio/slicer.py (behavioral spec: reference utils/slicer2.py)
// in O(n) C++ with double accumulators.
//
// Build: g++ -O3 -march=native -shared -fPIC audio_frontend.cpp -o libsome_audio.so
// ABI: plain C, driven via ctypes (no pybind11 in the image).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Centered RMS per frame over a cumulative-sum-of-squares scan.
// y: [n] mono float32; out: [num_frames] float64 (caller-allocated,
// num_frames = (n + 2*(frame/2) - frame) / hop + 1).
void rms_envelope(const float* y, int64_t n, int64_t frame, int64_t hop,
                  double* out, int64_t num_frames) {
    const int64_t pad = frame / 2;
    const int64_t padded = n + 2 * pad;
    std::vector<double> csum(static_cast<size_t>(padded) + 1, 0.0);
    for (int64_t i = 0; i < padded; ++i) {
        const int64_t src = i - pad;
        const double v = (src >= 0 && src < n) ? static_cast<double>(y[src]) : 0.0;
        csum[i + 1] = csum[i] + v * v;
    }
    for (int64_t f = 0; f < num_frames; ++f) {
        const int64_t start = f * hop;
        out[f] = std::sqrt((csum[start + frame] - csum[start]) / frame);
    }
}

static int64_t argmin_range(const double* rms, int64_t lo, int64_t hi_incl,
                            int64_t total) {
    if (hi_incl >= total) hi_incl = total - 1;
    int64_t best = lo;
    for (int64_t i = lo + 1; i <= hi_incl; ++i)
        if (rms[i] < rms[best]) best = i;
    return best;
}

// Silence-slicer scan over an RMS envelope. Writes (start, end) frame pairs
// into tags (caller-allocated, capacity*2 entries); returns tag count.
// Mirrors some_tpu/audio/slicer.py::SilenceSlicer.slice state machine.
int64_t slicer_scan(const double* rms, int64_t total_frames, double threshold,
                    int64_t min_interval, int64_t min_length,
                    int64_t max_sil_kept, int64_t* tags, int64_t capacity) {
    int64_t count = 0;
    int64_t silence_start = -1;
    int64_t clip_start = 0;

    auto push = [&](int64_t a, int64_t b) {
        if (count < capacity) {
            tags[count * 2] = a;
            tags[count * 2 + 1] = b;
            ++count;
        }
    };

    for (int64_t i = 0; i < total_frames; ++i) {
        if (rms[i] < threshold) {
            if (silence_start < 0) silence_start = i;
            continue;
        }
        if (silence_start < 0) continue;

        const bool leading = (silence_start == 0) && (i > max_sil_kept);
        const bool middle = (i - silence_start >= min_interval) &&
                            (i - clip_start >= min_length);
        if (!leading && !middle) {
            silence_start = -1;
            continue;
        }
        if (i - silence_start <= max_sil_kept) {
            const int64_t pos = argmin_range(rms, silence_start, i, total_frames);
            if (silence_start == 0) push(0, pos); else push(pos, pos);
            clip_start = pos;
        } else if (i - silence_start <= max_sil_kept * 2) {
            const int64_t pos = argmin_range(
                rms, i - max_sil_kept, silence_start + max_sil_kept, total_frames);
            const int64_t pos_l = argmin_range(
                rms, silence_start, silence_start + max_sil_kept, total_frames);
            const int64_t pos_r = argmin_range(
                rms, i - max_sil_kept, i, total_frames);
            if (silence_start == 0) {
                push(0, pos_r);
                clip_start = pos_r;
            } else {
                const int64_t a = pos_l < pos ? pos_l : pos;
                const int64_t b = pos_r > pos ? pos_r : pos;
                push(a, b);
                clip_start = b;
            }
        } else {
            const int64_t pos_l = argmin_range(
                rms, silence_start, silence_start + max_sil_kept, total_frames);
            const int64_t pos_r = argmin_range(
                rms, i - max_sil_kept, i, total_frames);
            if (silence_start == 0) push(0, pos_r); else push(pos_l, pos_r);
            clip_start = pos_r;
        }
        silence_start = -1;
    }

    if (silence_start >= 0 && total_frames - silence_start >= min_interval) {
        int64_t silence_end = silence_start + max_sil_kept;
        if (silence_end > total_frames) silence_end = total_frames;
        const int64_t pos = argmin_range(rms, silence_start, silence_end,
                                         total_frames);
        push(pos, total_frames + 1);
    }
    return count;
}

}  // extern "C"
