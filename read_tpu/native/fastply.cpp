// Native host-side helpers for scene IO.
//
// The reference's native code is its CUDA rasterizer (MyRender/
// CloudProjection); the TPU build's device-native equivalent is the XLA
// sort z-buffer + Pallas kernel. THIS module is the host-native runtime
// piece: multi-million-point PLY files parse at memory bandwidth instead
// of through Python loops (np.loadtxt on a 10M-line ascii PLY takes
// minutes; strtof streams at >100 MB/s).
//
// Exposed via ctypes (no pybind11 in this image; see
// read_tpu/native/__init__.py for the build-and-load shim).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Parse whitespace-separated floats from buf[0..len) into out[0..n).
// Returns the number of values parsed (== n on success).
int64_t parse_ascii_floats(const char* buf, int64_t len, float* out,
                           int64_t n) {
    const char* p = buf;
    const char* end = buf + len;
    int64_t i = 0;
    while (i < n && p < end) {
        char* next = nullptr;
        float v = strtof(p, &next);
        if (next == p) {  // not a number: skip one char
            ++p;
            continue;
        }
        out[i++] = v;
        p = next;
    }
    return i;
}

// Gather a strided binary property (e.g. one float column of an
// interleaved vertex record) into a contiguous array, multithreaded.
//   src: base of the first record, stride bytes apart, item_size bytes
//   per item, count records.
void unpack_strided(const char* src, int64_t count, int64_t stride,
                    int64_t item_size, char* dst) {
    int n_threads = (int)std::min<int64_t>(
        std::max(1u, std::thread::hardware_concurrency()), 16);
    if (count < 1 << 18) n_threads = 1;
    std::vector<std::thread> threads;
    int64_t chunk = (count + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t lo = t * chunk;
        int64_t hi = std::min(count, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back([=] {
            const char* s = src + lo * stride;
            char* d = dst + lo * item_size;
            for (int64_t i = lo; i < hi; ++i) {
                memcpy(d, s, item_size);
                s += stride;
                d += item_size;
            }
        });
    }
    for (auto& th : threads) th.join();
}

// Count whitespace-separated tokens (for validating ascii headers).
int64_t count_tokens(const char* buf, int64_t len) {
    int64_t n = 0;
    bool in_tok = false;
    for (int64_t i = 0; i < len; ++i) {
        bool ws = buf[i] == ' ' || buf[i] == '\n' || buf[i] == '\r' ||
                  buf[i] == '\t';
        if (!ws && !in_tok) ++n;
        in_tok = !ws;
    }
    return n;
}

}  // extern "C"
