// Native host-side components (C ABI, loaded via ctypes).
//
// TPU-native equivalents of the reference's C++ host code:
//  * stloader: persistent thread pool streaming safetensors byte ranges into
//    caller buffers (reference exllamav3_ext/stloader.cpp — minus the CUDA
//    pinned-slot ring; on TPU hosts the runtime handles H2D, so the native
//    job is saturating disk/page-cache bandwidth with parallel reads).
//  * suffix automaton for n-gram drafting (reference exllamav3_ext/sam.cpp).
//  * multicore tail-biting Viterbi tile encoder (reference
//    exllamav3_ext/quant/quantize_tiles_kernel.cuh) — lets conversions run
//    on host cores concurrently with TPU work.
//
// Build: see build_native.py (g++ -O3 -march=native -shared -fPIC -pthread).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstdio>
#include <cerrno>
#include <fcntl.h>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <unistd.h>
#include <unordered_map>
#include <vector>

// ---------------------------------------------------------------------------
// thread pool
// ---------------------------------------------------------------------------

namespace {

class ThreadPool {
public:
    explicit ThreadPool(int n) : stop_(false) {
        for (int i = 0; i < n; ++i)
            workers_.emplace_back([this] { run(); });
    }
    ~ThreadPool() {
        {
            std::unique_lock<std::mutex> lk(mu_);
            stop_ = true;
        }
        cv_.notify_all();
        for (auto& w : workers_) w.join();
    }
    void submit(std::function<void()> f) {
        {
            std::unique_lock<std::mutex> lk(mu_);
            jobs_.push(std::move(f));
        }
        cv_.notify_one();
    }
private:
    void run() {
        for (;;) {
            std::function<void()> job;
            {
                std::unique_lock<std::mutex> lk(mu_);
                cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
                if (stop_ && jobs_.empty()) return;
                job = std::move(jobs_.front());
                jobs_.pop();
            }
            job();
        }
    }
    std::vector<std::thread> workers_;
    std::queue<std::function<void()>> jobs_;
    std::mutex mu_;
    std::condition_variable cv_;
    bool stop_;
};

ThreadPool* g_pool = nullptr;
int g_pool_threads = 0;

ThreadPool& pool(int threads) {
    if (!g_pool || (threads > 0 && threads != g_pool_threads)) {
        delete g_pool;
        g_pool_threads = threads > 0 ? threads
            : (int)std::max(2u, std::thread::hardware_concurrency());
        g_pool = new ThreadPool(g_pool_threads);
    }
    return *g_pool;
}

}  // namespace

// ---------------------------------------------------------------------------
// stloader: parallel byte-range reads
// ---------------------------------------------------------------------------

extern "C" {

// Read `count` byte ranges from `path` into `dst` buffers. Blocks until all
// complete. Returns 0 on success, else the first errno observed.
int stl_read_ranges(const char* path, const uint64_t* offsets,
                    const uint64_t* sizes, uint8_t** dsts, int count,
                    int threads) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return errno;
    std::atomic<int> err{0};
    std::atomic<int> remaining{count};
    std::mutex done_mu;
    std::condition_variable done_cv;

    auto read_one = [&](int i) {
        uint64_t off = offsets[i], size = sizes[i];
        uint8_t* dst = dsts[i];
        uint64_t pos = 0;
        while (pos < size) {
            ssize_t r = pread(fd, dst + pos, size - pos, (off_t)(off + pos));
            if (r <= 0) {
                int e = errno ? errno : EIO;
                int expect = 0;
                err.compare_exchange_strong(expect, e);
                break;
            }
            pos += (uint64_t)r;
        }
        if (remaining.fetch_sub(1) == 1) {
            std::unique_lock<std::mutex> lk(done_mu);
            done_cv.notify_all();
        }
    };

    auto& tp = pool(threads);
    // split big ranges into ~16MB chunks for parallelism
    for (int i = 0; i < count; ++i) tp.submit([&, i] { read_one(i); });
    {
        std::unique_lock<std::mutex> lk(done_mu);
        done_cv.wait(lk, [&] { return remaining.load() == 0; });
    }
    close(fd);
    return err.load();
}

// ---------------------------------------------------------------------------
// suffix automaton (incremental, int32 tokens)
// ---------------------------------------------------------------------------

struct SAM {
    std::vector<std::unordered_map<int32_t, int32_t>> next;
    std::vector<int32_t> link, len, endpos;
    std::vector<int32_t> tokens;
    int32_t last = 0;
    SAM() {
        next.emplace_back();
        link.push_back(-1);
        len.push_back(0);
        endpos.push_back(-1);
    }
};

void* sam_new() { return new SAM(); }
void sam_free(void* h) { delete (SAM*)h; }

void sam_extend(void* h, int32_t t) {
    SAM& s = *(SAM*)h;
    s.tokens.push_back(t);
    int32_t pos = (int32_t)s.tokens.size() - 1;
    int32_t cur = (int32_t)s.next.size();
    s.next.emplace_back();
    s.link.push_back(-1);
    s.len.push_back(s.len[s.last] + 1);
    s.endpos.push_back(pos);
    int32_t p = s.last;
    while (p != -1 && !s.next[p].count(t)) {
        s.next[p][t] = cur;
        p = s.link[p];
    }
    if (p == -1) {
        s.link[cur] = 0;
    } else {
        int32_t q = s.next[p][t];
        if (s.len[p] + 1 == s.len[q]) {
            s.link[cur] = q;
        } else {
            int32_t clone = (int32_t)s.next.size();
            s.next.push_back(s.next[q]);
            s.link.push_back(s.link[q]);
            s.len.push_back(s.len[p] + 1);
            s.endpos.push_back(s.endpos[q]);
            while (p != -1 && s.next[p].count(t) && s.next[p][t] == q) {
                s.next[p][t] = clone;
                p = s.link[p];
            }
            s.link[q] = clone;
            s.link[cur] = clone;
        }
    }
    s.last = cur;
}

// Propose up to max_tokens continuation tokens; returns count written to out.
int32_t sam_draft(void* h, int32_t max_tokens, int32_t min_context,
                  int32_t* out) {
    SAM& s = *(SAM*)h;
    int32_t n = (int32_t)s.tokens.size();
    if (n < min_context + 1) return 0;
    int32_t st = s.link[s.last];
    while (st > 0) {
        int32_t ep = s.endpos[st];
        if (s.len[st] >= min_context && ep < n - 1) {
            int32_t cnt = 0;
            for (int32_t i = ep + 1; i < n && cnt < max_tokens; ++i)
                out[cnt++] = s.tokens[i];
            return cnt;
        }
        st = s.link[st];
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Viterbi tile encoder (tail-biting, all 2^16 codes, f32 costs)
// ---------------------------------------------------------------------------

// Quantize `num_tiles` tiles of 256 f32 values (trellis sequence order) with
// the precomputed 65536-entry decode table. Writes codes (uint16) and
// reconstructed values. Parallel over tiles.
static void viterbi_one(const float* tile, const float* dec, int K,
                        uint16_t* out_codes, float* out_vals,
                        std::vector<float>& cost, std::vector<float>& ncost,
                        std::vector<uint16_t>& edges /* 256 * E */) {
    const int E = 65536 >> K;       // out-edge states (low 16-K bits)
    const int Q = 1 << K;
    const int KR = 16 - 2 * K;  // K <= 8 so KR >= 0
    auto in_edge = [&](int kk, int out) { return (kk << KR) | (out >> K); };

    auto forward = [&](int roll, int pre_state) {
        for (int i = 0; i < 256; ++i) {
            int ri = (i + roll) & 255;
            float w = tile[ri];
            uint16_t* er = &edges[(size_t)ri * E];
            for (int out = 0; out < E; ++out) {
                float best = 1e30f;
                int best_in = 0;
                for (int kk = 0; kk < Q; ++kk) {
                    int code = (kk << (16 - K)) | out;
                    int ie = in_edge(kk, out);
                    float d = dec[code] - w;
                    float c = d * d;
                    if (i == 0) {
                        if (pre_state >= 0 && ie != pre_state) continue;
                    } else {
                        c += cost[ie];
                    }
                    if (c < best) { best = c; best_in = ie; }
                }
                ncost[out] = best;
                er[out] = (uint16_t)best_in;
            }
            std::swap(cost, ncost);
        }
    };

    auto backward = [&](int roll, int edge, bool write) {
        for (int i = 255; i >= 0; --i) {
            int ri = (i + roll) & 255;
            int prev = edges[(size_t)ri * E + edge];
            if (write) {
                int code = (prev << K) | edge;
                out_codes[ri] = (uint16_t)code;
                out_vals[ri] = dec[code];
            }
            edge = prev;
            if (!write && ri == 0) break;
        }
        return edge;
    };

    forward(128, -1);
    int best = 0;
    float bc = cost[0];
    for (int e = 1; e < E; ++e)
        if (cost[e] < bc) { bc = cost[e]; best = e; }
    int end_state = backward(128, best, false);
    forward(0, end_state);
    backward(0, end_state, true);
}

void viterbi_quantize_tiles(const float* tiles, const float* dec_table,
                            int num_tiles, int K, uint16_t* out_codes,
                            float* out_vals, int threads) {
    if (threads <= 0)
        threads = (int)std::max(2u, std::thread::hardware_concurrency());
    std::atomic<int> nextt{0};
    auto worker = [&] {
        const int E = 65536 >> K;
        std::vector<float> cost(E), ncost(E);
        std::vector<uint16_t> edges((size_t)256 * E);
        for (;;) {
            int i = nextt.fetch_add(1);
            if (i >= num_tiles) return;
            viterbi_one(tiles + (size_t)i * 256, dec_table, K,
                        out_codes + (size_t)i * 256,
                        out_vals + (size_t)i * 256, cost, ncost, edges);
        }
    };
    std::vector<std::thread> ts;
    for (int i = 0; i < threads; ++i) ts.emplace_back(worker);
    for (auto& t : ts) t.join();
}

}  // extern "C"
