// vmio — native host-side streaming runtime for .vmc frame stores.
//
// TPU-native rebuild of the reference's OpenCV VideoCapture feed thread
// (SURVEY.md section 3 "Video I/O"): the device never waits on the host if
// decode runs ahead of it. This library mmaps a raw .vmc frame store and
// runs a producer thread that converts uint8 HWC frames to normalized
// float32 blocks into a ring buffer; the Python consumer (ctypes, see
// videomorphing_tpu/utils/native.py) hands blocks straight to
// jax.device_put. The uint8->float32 conversion is the host-side hot loop
// for 4K streaming (BASELINE.json config 5) and is parallelized over rows.
//
// Build: `make -C native` -> native/libvmio.so
//
// File format (videomorphing_tpu/io/clips.py):
//   16-byte header: magic "VMC1", uint32 T, H, W, C   (little endian)
//   followed by T contiguous uint8 HWC frames.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x31434D56;  // "VMC1" little-endian
constexpr int kRingSlots = 4;

struct Header {
    uint32_t magic, t, h, w, c;
} __attribute__((packed));

struct Slot {
    std::vector<float> data;
    int start = -1;
    int count = 0;
    bool full = false;
};

struct Stream {
    int fd = -1;
    const uint8_t* map = nullptr;
    size_t map_size = 0;
    uint32_t t = 0, h = 0, w = 0, c = 0;
    int block = 0;
    size_t frame_bytes = 0;

    Slot ring[kRingSlots];
    std::mutex mu;
    std::condition_variable cv_produce, cv_consume;
    int next_produce = 0;   // block index the producer works on next
    int next_consume = 0;   // block index the consumer expects next
    std::atomic<bool> stop{false};
    std::thread producer;
    int n_threads = 2;
};

// row-parallel uint8 -> float32 [0,1]
void convert_block(const uint8_t* src, float* dst, size_t n, int n_threads) {
    const float s = 1.0f / 255.0f;
    if (n_threads <= 1 || n < (1u << 20)) {
        for (size_t i = 0; i < n; ++i) dst[i] = s * src[i];
        return;
    }
    std::vector<std::thread> ts;
    size_t chunk = (n + n_threads - 1) / n_threads;
    for (int k = 0; k < n_threads; ++k) {
        size_t lo = k * chunk, hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back([=]() {
            for (size_t i = lo; i < hi; ++i) dst[i] = s * src[i];
        });
    }
    for (auto& th : ts) th.join();
}

void producer_loop(Stream* st) {
    const int n_blocks = (st->t + st->block - 1) / st->block;
    while (!st->stop.load()) {
        int blk;
        Slot* slot;
        {
            std::unique_lock<std::mutex> lk(st->mu);
            st->cv_produce.wait(lk, [&] {
                if (st->stop.load()) return true;
                if (st->next_produce >= n_blocks) return false;
                return !st->ring[st->next_produce % kRingSlots].full;
            });
            if (st->stop.load() || st->next_produce >= n_blocks) {
                if (st->next_produce >= n_blocks) return;
                continue;
            }
            blk = st->next_produce++;
            slot = &st->ring[blk % kRingSlots];
        }
        int start = blk * st->block;
        int count = std::min<int>(st->block, st->t - start);
        size_t n = (size_t)count * st->frame_bytes;
        slot->data.resize(n);
        const uint8_t* src = st->map + sizeof(Header) + (size_t)start * st->frame_bytes;
        convert_block(src, slot->data.data(), n, st->n_threads);
        {
            std::lock_guard<std::mutex> lk(st->mu);
            slot->start = start;
            slot->count = count;
            slot->full = true;
        }
        st->cv_consume.notify_all();
    }
}

}  // namespace

extern "C" {

void* vmio_open(const char* path, int block, int n_threads) {
    int fd = ::open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    struct stat sb;
    if (fstat(fd, &sb) != 0 || (size_t)sb.st_size < sizeof(Header)) {
        ::close(fd);
        return nullptr;
    }
    const uint8_t* map = (const uint8_t*)mmap(nullptr, sb.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (map == MAP_FAILED) {
        ::close(fd);
        return nullptr;
    }
    Header hd;
    std::memcpy(&hd, map, sizeof(hd));
    if (hd.magic != kMagic) {
        munmap((void*)map, sb.st_size);
        ::close(fd);
        return nullptr;
    }
    auto* st = new Stream();
    st->fd = fd;
    st->map = map;
    st->map_size = sb.st_size;
    st->t = hd.t;
    st->h = hd.h;
    st->w = hd.w;
    st->c = hd.c;
    st->block = block > 0 ? block : 8;
    st->frame_bytes = (size_t)hd.h * hd.w * hd.c;
    st->n_threads = n_threads > 0 ? n_threads : 2;
    madvise((void*)map, sb.st_size, MADV_SEQUENTIAL);
    st->producer = std::thread(producer_loop, st);
    return st;
}

void vmio_info(void* handle, int* t, int* h, int* w, int* c, int* block) {
    auto* st = (Stream*)handle;
    *t = st->t;
    *h = st->h;
    *w = st->w;
    *c = st->c;
    *block = st->block;
}

// Copy the next ready block into `out` (caller-allocated, block*frame floats).
// Returns the frame count of the block (0 at end of stream), and writes the
// block's first frame index to *start.
int vmio_next(void* handle, float* out, int* start) {
    auto* st = (Stream*)handle;
    const int n_blocks = (st->t + st->block - 1) / st->block;
    if (st->next_consume >= n_blocks) return 0;
    Slot* slot = &st->ring[st->next_consume % kRingSlots];
    {
        std::unique_lock<std::mutex> lk(st->mu);
        st->cv_consume.wait(lk, [&] { return slot->full || st->stop.load(); });
        if (st->stop.load() && !slot->full) return 0;
    }
    int count = slot->count;
    *start = slot->start;
    std::memcpy(out, slot->data.data(), (size_t)count * st->frame_bytes * sizeof(float));
    {
        std::lock_guard<std::mutex> lk(st->mu);
        slot->full = false;
        st->next_consume++;
    }
    st->cv_produce.notify_all();
    return count;
}

void vmio_close(void* handle) {
    auto* st = (Stream*)handle;
    st->stop.store(true);
    st->cv_produce.notify_all();
    st->cv_consume.notify_all();
    if (st->producer.joinable()) st->producer.join();
    if (st->map) munmap((void*)st->map, st->map_size);
    if (st->fd >= 0) ::close(st->fd);
    delete st;
}

// Convenience writer so C++ pipelines can emit stores too.
int vmio_write(const char* path, const uint8_t* frames, int t, int h, int w, int c) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    Header hd{kMagic, (uint32_t)t, (uint32_t)h, (uint32_t)w, (uint32_t)c};
    fwrite(&hd, sizeof(hd), 1, f);
    size_t n = (size_t)t * h * w * c;
    size_t written = fwrite(frames, 1, n, f);
    fclose(f);
    return written == n ? 0 : -1;
}

// Standalone row-parallel uint8->float conversion (reusable fast path).
void vmio_u8_to_f32(const uint8_t* src, float* dst, int64_t n, int n_threads) {
    convert_block(src, dst, (size_t)n, n_threads);
}

}  // extern "C"
