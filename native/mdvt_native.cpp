// mdvt_native: host-side runtime kernels for the TPU pipeline.
//
// The reference delegates its host-side hot loops to OpenCV/Open3D C++
// (SURVEY.md §2.4). This library provides the TPU framework's native
// equivalents for the paths that stay on the host:
//
//   - depth codec pack/unpack (uint16 code plane <-> RGB24 interleave):
//     the per-frame transform between device output and FFV1 encoder
//     input. SIMD-friendly single pass, ~10x numpy's stack/astype chain.
//   - binary PLY serialization (vertices+colors) without intermediate
//     copies.
//   - a lock-free SPSC byte ring buffer used by the async video
//     decode -> device feed pipeline.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <new>

extern "C" {

// --- depth codec ----------------------------------------------------------

// Pack 16-bit depth codes into RGB24: R = G = high byte, B = low byte
// (the bit16 video contract; low byte is the *second most significant*
// byte of the 32-bit code, i.e. code16 = code32 >> 16).
void pack_code16_rgb(const uint16_t* code, uint8_t* rgb, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        uint16_t c = code[i];
        uint8_t hi = (uint8_t)(c >> 8);
        uint8_t lo = (uint8_t)(c & 0xFF);
        rgb[i * 3 + 0] = hi;
        rgb[i * 3 + 1] = hi;
        rgb[i * 3 + 2] = lo;
    }
}

// Unpack RGB24 -> 16-bit codes; average_rg reconstructs the high byte as
// floor((R+G)/2) for chroma-noise robustness.
void unpack_rgb_code16(const uint8_t* rgb, uint16_t* code, int64_t n,
                       int average_rg) {
    if (average_rg) {
        for (int64_t i = 0; i < n; ++i) {
            uint16_t hi = (uint16_t)((rgb[i * 3 + 0] + rgb[i * 3 + 1]) / 2);
            code[i] = (uint16_t)((hi << 8) | rgb[i * 3 + 2]);
        }
    } else {
        for (int64_t i = 0; i < n; ++i) {
            code[i] = (uint16_t)(((uint16_t)rgb[i * 3 + 0] << 8)
                                 | rgb[i * 3 + 2]);
        }
    }
}

// Fused float-depth -> RGB24 (encode path: clip, quantize, pack).
void encode_depth_rgb(const float* depth, uint8_t* rgb, int64_t n,
                      float max_depth) {
    // code16 = floor(depth * 255^4 / (max_depth * 2^16))
    const double scale = 4228250625.0 / ((double)max_depth * 65536.0);
    for (int64_t i = 0; i < n; ++i) {
        double d = depth[i];
        if (d < 0.0) d = 0.0;
        if (d > max_depth) d = max_depth;
        uint32_t c = (uint32_t)(d * scale);
        if (c > 65535u) c = 65535u;
        uint8_t hi = (uint8_t)(c >> 8);
        rgb[i * 3 + 0] = hi;
        rgb[i * 3 + 1] = hi;
        rgb[i * 3 + 2] = (uint8_t)(c & 0xFF);
    }
}

// Fused RGB24 -> float depth (decode path).
void decode_rgb_depth(const uint8_t* rgb, float* depth, int64_t n,
                      float max_depth, int average_rg) {
    const double scale = ((double)max_depth * 65536.0) / 4228250625.0;
    for (int64_t i = 0; i < n; ++i) {
        uint32_t hi = average_rg
            ? (uint32_t)((rgb[i * 3 + 0] + rgb[i * 3 + 1]) / 2)
            : (uint32_t)rgb[i * 3 + 0];
        uint32_t c = (hi << 8) | rgb[i * 3 + 2];
        depth[i] = (float)((double)c * scale);
    }
}

// --- binary PLY ------------------------------------------------------------

// Serialize N xyz float32 vertices (+ optional rgb uint8) into `out`
// (caller allocates header_len + N*stride bytes). Returns bytes written.
int64_t ply_serialize(const float* xyz, const uint8_t* rgb, int64_t n,
                      uint8_t* out, int64_t out_cap) {
    char header[256];
    int hl = snprintf(header, sizeof(header),
                      "ply\nformat binary_little_endian 1.0\n"
                      "element vertex %lld\n"
                      "property float x\nproperty float y\nproperty float z\n"
                      "%s"
                      "end_header\n",
                      (long long)n,
                      rgb ? "property uchar red\nproperty uchar green\n"
                            "property uchar blue\n" : "");
    int64_t stride = 12 + (rgb ? 3 : 0);
    int64_t total = hl + n * stride;
    if (total > out_cap) return -1;
    memcpy(out, header, hl);
    uint8_t* p = out + hl;
    for (int64_t i = 0; i < n; ++i) {
        memcpy(p, xyz + i * 3, 12);
        p += 12;
        if (rgb) {
            memcpy(p, rgb + i * 3, 3);
            p += 3;
        }
    }
    return total;
}

// --- SPSC ring buffer -------------------------------------------------------

struct Ring {
    uint8_t* data;
    int64_t cap;
    std::atomic<int64_t> head;  // producer writes
    std::atomic<int64_t> tail;  // consumer reads
};

void* ring_create(int64_t capacity) {
    Ring* r = new (std::nothrow) Ring();
    if (!r) return nullptr;
    r->data = new (std::nothrow) uint8_t[capacity];
    if (!r->data) { delete r; return nullptr; }
    r->cap = capacity;
    r->head.store(0);
    r->tail.store(0);
    return r;
}

void ring_destroy(void* rp) {
    Ring* r = (Ring*)rp;
    delete[] r->data;
    delete r;
}

int64_t ring_free_space(void* rp) {
    Ring* r = (Ring*)rp;
    int64_t h = r->head.load(std::memory_order_acquire);
    int64_t t = r->tail.load(std::memory_order_acquire);
    return r->cap - (h - t) - 1;
}

int64_t ring_used(void* rp) {
    Ring* r = (Ring*)rp;
    return r->head.load(std::memory_order_acquire)
         - r->tail.load(std::memory_order_acquire);
}

// Push up to n bytes; returns bytes actually pushed (0 if full).
int64_t ring_push(void* rp, const uint8_t* src, int64_t n) {
    Ring* r = (Ring*)rp;
    int64_t h = r->head.load(std::memory_order_relaxed);
    int64_t t = r->tail.load(std::memory_order_acquire);
    int64_t space = r->cap - (h - t) - 1;
    if (n > space) n = space;
    for (int64_t i = 0; i < n; ++i)
        r->data[(h + i) % r->cap] = src[i];
    r->head.store(h + n, std::memory_order_release);
    return n;
}

// Pop up to n bytes; returns bytes actually popped.
int64_t ring_pop(void* rp, uint8_t* dst, int64_t n) {
    Ring* r = (Ring*)rp;
    int64_t h = r->head.load(std::memory_order_acquire);
    int64_t t = r->tail.load(std::memory_order_relaxed);
    int64_t avail = h - t;
    if (n > avail) n = avail;
    for (int64_t i = 0; i < n; ++i)
        dst[i] = r->data[(t + i) % r->cap];
    r->tail.store(t + n, std::memory_order_release);
    return n;
}

}  // extern "C"

// --- tilepack row transform ------------------------------------------------
// Host half of the device->host tile-bitpack transfer codec
// (ops/tilepack.py): rows of zigzag residuals -> original bytes.
// Per element: d = unzigzag(z); acc += d (mod 256). The serial
// dependence is per row only, and the scalar loop runs ~1 GB/s -- far
// above the tunnel D2H it feeds.
extern "C" void tilepack_rows(uint8_t* z, int64_t rows, int64_t width) {
    for (int64_t r = 0; r < rows; ++r) {
        uint8_t* p = z + r * width;
        uint8_t acc = 0;
        for (int64_t i = 0; i < width; ++i) {
            uint8_t v = p[i];
            uint8_t d = (uint8_t)((v >> 1) ^ (uint8_t)(-(int8_t)(v & 1)));
            acc = (uint8_t)(acc + d);
            p[i] = acc;
        }
    }
}
