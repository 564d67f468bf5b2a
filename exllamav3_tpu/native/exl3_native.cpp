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

// ---------------------------------------------------------------------------
// CPU MoE expert FFN for host-offloaded experts.
//
// TPU-native counterpart of the reference's CPU MoE offload (feature
// reference: /root/reference/exllamav3/model/moe_cpu_host.py:20-37 +
// exllamav3_ext/cpu/moe_mul1.cpp:33-49). The reference's worker decodes
// trellis ("mul1") weights on the fly with AVX-512 VNNI; here host-resident
// experts are stored REQUANTIZED to int8 with per-output-row scales — the
// same representation the on-device serving ladder uses — so the GEMV is a
// plain s8·s8→s32 dot that g++ autovectorizes for whatever ISA -march=native
// exposes, and weight bytes stream row-major (near-sequential DRAM reads,
// the reference's own banding lesson).
//
// Stage A computes act(x·Wg)·(x·Wu) for every live (token, slot) job into a
// staging buffer, stage B the down projection; both parallelize over
// (job, output-block) pairs on the shared pool with no atomics; the final
// routed-weight combine is serial over T·k jobs (negligible).

namespace {

inline float act_silu(float v) { return v / (1.0f + std::exp(-v)); }
inline float act_gelu_erf(float v) {
    return 0.5f * v * (1.0f + std::erf(v * 0.70710678118654752f));
}
inline float act_gelu_tanh(float v) {
    float c = 0.7978845608028654f * (v + 0.044715f * v * v * v);
    return 0.5f * v * (1.0f + std::tanh(c));
}
inline float act_relu2(float v) { float r = v > 0 ? v : 0; return r * r; }

inline float apply_act(int kind, float v) {
    switch (kind) {
        case 1: return act_gelu_erf(v);
        case 2: return act_gelu_tanh(v);
        case 3: return act_relu2(v);
        default: return act_silu(v);
    }
}

// int8 dot with int32 accumulation (k up to ~2^16 is safe: |a·b| <= 127*127
// per lane, 2^14 bits needed at k=65536 < 2^31)
inline int32_t dot_s8(const int8_t* a, const int8_t* b, int n) {
    int32_t acc = 0;
    for (int j = 0; j < n; ++j) acc += (int32_t)a[j] * (int32_t)b[j];
    return acc;
}

inline void quantize_row_s8(const float* src, int8_t* dst, int n, float& scale) {
    float amax = 1e-8f;
    for (int j = 0; j < n; ++j) { float v = std::fabs(src[j]); if (v > amax) amax = v; }
    scale = amax / 127.0f;
    float inv = 127.0f / amax;
    // round-half-to-even to stay bit-identical with the numpy fallback's
    // np.rint (exact-tie values otherwise differ by one int8 step)
    for (int j = 0; j < n; ++j)
        dst[j] = (int8_t)std::nearbyintf(src[j] * inv);
}

}  // namespace

extern "C" {

// x (T,h) f32; topi/topv (T,k); wg/wu (E,i,h) int8 + sg/su (E,i) f32 row
// scales (wg null => non-gated); wd (E,h,i) int8 + sd (E,h); optional biases
// bg/bu (E,i), bd (E,h). act_kind: 0 silu / 1 gelu / 2 gelu_tanh / 3 relu2 /
// 4 silu_oai(limit). act_clamp != 0 applies the clamped combine
// (min(act(g),C) * clip(u,-C,C), reference activation_kernels.cuh act_mul).
// out (T,h) f32 is ACCUMULATED into (+=): the caller zeroes or pre-fills.
void moe_ffn_int8(
    const float* x, const int32_t* topi, const float* topv,
    const int8_t* wg, const float* sg, const float* bg,
    const int8_t* wu, const float* su, const float* bu,
    const int8_t* wd, const float* sd, const float* bd,
    float* out, int T, int k, int h, int inter,
    int act_kind, float act_limit, float act_clamp, int threads) {
    const int gated = wg != nullptr;
    // live jobs: (t, slot) with topv > 0
    std::vector<int> jt, js;
    jt.reserve((size_t)T * k); js.reserve((size_t)T * k);
    for (int t = 0; t < T; ++t)
        for (int s = 0; s < k; ++s)
            if (topv[(size_t)t * k + s] != 0.0f) { jt.push_back(t); js.push_back(s); }
    const int J = (int)jt.size();
    if (J == 0) return;

    // per-token int8 activations
    std::vector<int8_t> x8((size_t)T * h);
    std::vector<float> qx(T);
    for (int t = 0; t < T; ++t)
        quantize_row_s8(x + (size_t)t * h, x8.data() + (size_t)t * h, h, qx[t]);

    std::vector<float> a((size_t)J * inter);   // staged act(g)*u
    auto& tp = pool(threads);

    // stage A: gate/up GEMV + activation, parallel over (job, row-block)
    const int RB = 512;
    const int nb_a = (inter + RB - 1) / RB;
    {
        std::atomic<int> next{0};
        int total = J * nb_a;
        int nw = g_pool_threads;
        std::atomic<int> done{0};
        std::mutex m; std::condition_variable cv;
        auto work = [&] {
            for (;;) {
                int idx = next.fetch_add(1);
                if (idx >= total) break;
                int j = idx / nb_a, blk = idx % nb_a;
                int t = jt[j], e = topi[(size_t)t * k + js[j]];
                int r0 = blk * RB, r1 = std::min(inter, r0 + RB);
                const int8_t* x8t = x8.data() + (size_t)t * h;
                const float q = qx[t];
                const int8_t* wue = wu + (size_t)e * inter * h;
                const float* sue = su + (size_t)e * inter;
                const int8_t* wge = gated ? wg + (size_t)e * inter * h : nullptr;
                const float* sge = gated ? sg + (size_t)e * inter : nullptr;
                float* arow = a.data() + (size_t)j * inter;
                for (int r = r0; r < r1; ++r) {
                    float uv = dot_s8(x8t, wue + (size_t)r * h, h) * (q * sue[r]);
                    if (bu) uv += bu[(size_t)e * inter + r];
                    float av;
                    if (!gated) {
                        av = apply_act(act_kind, uv);
                    } else {
                        float gv = dot_s8(x8t, wge + (size_t)r * h, h) * (q * sge[r]);
                        if (bg) gv += bg[(size_t)e * inter + r];
                        if (act_kind == 4) {
                            // gpt-oss silu_oai: clamp then (u+1)*g*sigmoid(1.702 g)
                            float gc = std::min(gv, act_limit);
                            float uc = std::max(std::min(uv, act_limit), -act_limit);
                            av = (uc + 1.0f) * gc / (1.0f + std::exp(-gc * 1.702f));
                        } else if (act_clamp != 0.0f) {
                            float ga = std::min(apply_act(act_kind, gv), act_clamp);
                            float uc = std::max(std::min(uv, act_clamp), -act_clamp);
                            av = ga * uc;
                        } else {
                            av = apply_act(act_kind, gv) * uv;
                        }
                    }
                    arow[r] = av;
                }
            }
            {
                std::lock_guard<std::mutex> lk(m);
                if (++done == nw) cv.notify_all();
            }
        };
        for (int i = 0; i < nw; ++i) tp.submit(work);
        std::unique_lock<std::mutex> lk(m);
        cv.wait(lk, [&] { return done == nw; });
    }

    // quantize staged rows, stage B: down GEMV, parallel over (job, col-block)
    std::vector<int8_t> a8((size_t)J * inter);
    std::vector<float> qa(J);
    for (int j = 0; j < J; ++j)
        quantize_row_s8(a.data() + (size_t)j * inter,
                        a8.data() + (size_t)j * inter, inter, qa[j]);
    std::vector<float> y((size_t)J * h);
    {
        const int nb_b = (h + RB - 1) / RB;
        std::atomic<int> next{0};
        int total = J * nb_b;
        int nw = g_pool_threads;
        std::atomic<int> done{0};
        std::mutex m; std::condition_variable cv;
        auto work = [&] {
            for (;;) {
                int idx = next.fetch_add(1);
                if (idx >= total) break;
                int j = idx / nb_b, blk = idx % nb_b;
                int t = jt[j], e = topi[(size_t)t * k + js[j]];
                int c0 = blk * RB, c1 = std::min(h, c0 + RB);
                const int8_t* a8j = a8.data() + (size_t)j * inter;
                const float q = qa[j];
                const int8_t* wde = wd + (size_t)e * h * inter;
                const float* sde = sd + (size_t)e * h;
                float* yrow = y.data() + (size_t)j * h;
                for (int c = c0; c < c1; ++c) {
                    float v = dot_s8(a8j, wde + (size_t)c * inter, inter) * (q * sde[c]);
                    if (bd) v += bd[(size_t)e * h + c];
                    yrow[c] = v;
                }
            }
            {
                std::lock_guard<std::mutex> lk(m);
                if (++done == nw) cv.notify_all();
            }
        };
        for (int i = 0; i < nw; ++i) tp.submit(work);
        std::unique_lock<std::mutex> lk(m);
        cv.wait(lk, [&] { return done == nw; });
    }

    // serial routed-weight combine
    for (int j = 0; j < J; ++j) {
        int t = jt[j];
        float w = topv[(size_t)t * k + js[j]];
        const float* yrow = y.data() + (size_t)j * h;
        float* orow = out + (size_t)t * h;
        for (int c = 0; c < h; ++c) orow[c] += w * yrow[c];
    }
}

}  // extern "C"
