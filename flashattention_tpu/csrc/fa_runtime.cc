// Native runtime core: paged-KV page allocator + continuous-batching
// admission scheduler.
//
// TPU-native analog of the reference's native host layer (the CUDA repo's
// C++ launcher/allocator role, src/flashattention.cu:583-617, generalized to
// the serving runtime the north star requires): device compute stays in
// JAX/Pallas, but page bookkeeping and request admission run at native speed
// off the critical path.  Exposed as a C ABI for ctypes
// (flashattention_tpu/runtime/native.py); build with `make` in this dir.

#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <unordered_map>
#include <vector>

namespace {

struct Allocator {
  std::vector<int32_t> free_pages;  // LIFO free list: reuse hot pages first
  int32_t total = 0;
  std::mutex mu;
};

struct Request {
  int64_t id;
  int32_t prompt_len;
  int32_t max_new_tokens;
  int32_t page_size;
  // pages needed now (prompt) and at worst case (prompt + all new tokens)
  int32_t pages_now() const {
    return (prompt_len + page_size - 1) / page_size;
  }
  int32_t pages_max() const {
    return (prompt_len + max_new_tokens + page_size - 1) / page_size;
  }
};

struct Scheduler {
  std::deque<Request> waiting;  // FCFS
  std::unordered_map<int64_t, Request> running;
  int32_t max_batch = 0;
  int32_t page_size = 0;
  bool reserve_worst_case = false;  // admission policy (see fa_sched_create)
  std::mutex mu;
};

}  // namespace

extern "C" {

// ── Page allocator ─────────────────────────────────────────────────────────

void* fa_alloc_create(int32_t num_pages) {
  auto* a = new Allocator();
  a->total = num_pages;
  a->free_pages.reserve(num_pages);
  // Push in reverse so pages pop in ascending order initially.
  for (int32_t i = num_pages - 1; i >= 0; --i) a->free_pages.push_back(i);
  return a;
}

void fa_alloc_destroy(void* h) { delete static_cast<Allocator*>(h); }

int32_t fa_alloc_num_free(void* h) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  return static_cast<int32_t>(a->free_pages.size());
}

// Allocate n pages into out[0..n); returns 0 on success, -1 if insufficient
// (no partial allocation).
int32_t fa_alloc_pages(void* h, int32_t n, int32_t* out) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  if (static_cast<int32_t>(a->free_pages.size()) < n) return -1;
  for (int32_t i = 0; i < n; ++i) {
    out[i] = a->free_pages.back();
    a->free_pages.pop_back();
  }
  return 0;
}

void fa_alloc_free_pages(void* h, const int32_t* pages, int32_t n) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  for (int32_t i = 0; i < n; ++i) a->free_pages.push_back(pages[i]);
}

// ── Continuous-batching scheduler ──────────────────────────────────────────
//
// Policy: FCFS admission. A waiting request is admitted when (a) a batch slot
// is free and (b) enough pages are free for its prompt (reserve_worst_case=0,
// optimistic: decode may later preempt) or its full worst-case footprint
// (reserve_worst_case=1, no-preemption guarantee).

void* fa_sched_create(int32_t max_batch, int32_t page_size,
                      int32_t reserve_worst_case) {
  auto* s = new Scheduler();
  s->max_batch = max_batch;
  s->page_size = page_size;
  s->reserve_worst_case = reserve_worst_case != 0;
  return s;
}

void fa_sched_destroy(void* h) { delete static_cast<Scheduler*>(h); }

void fa_sched_add_request(void* h, int64_t id, int32_t prompt_len,
                          int32_t max_new_tokens) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  s->waiting.push_back(Request{id, prompt_len, max_new_tokens, s->page_size});
}

int32_t fa_sched_num_waiting(void* h) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  return static_cast<int32_t>(s->waiting.size());
}

int32_t fa_sched_num_running(void* h) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  return static_cast<int32_t>(s->running.size());
}

// Plan admissions for the next step.  Writes up to max_out admitted request
// ids into out_ids; returns the count.  free_pages is the allocator's current
// free count (caller allocates the actual pages afterwards, so the scheduler
// never races the allocator).
int32_t fa_sched_admit(void* h, int32_t free_pages, int64_t* out_ids,
                       int32_t max_out) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  int32_t admitted = 0;
  int32_t budget = free_pages;
  if (s->reserve_worst_case) {
    // Reservations must survive across admit() calls: subtract the decode
    // headroom (worst-case span minus the already-allocated prompt pages) of
    // every running request, or a later admit() would hand pages reserved
    // for their generation to a new request (breaking the no-preemption
    // guarantee this mode exists for).
    for (const auto& kv : s->running) {
      budget -= kv.second.pages_max() - kv.second.pages_now();
    }
  }
  while (!s->waiting.empty() && admitted < max_out &&
         static_cast<int32_t>(s->running.size()) < s->max_batch) {
    const Request& r = s->waiting.front();
    int32_t need = s->reserve_worst_case ? r.pages_max() : r.pages_now();
    if (need > budget) break;  // strict FCFS: no head-of-line bypass
    budget -= need;
    out_ids[admitted++] = r.id;
    s->running.emplace(r.id, r);
    s->waiting.pop_front();
  }
  return admitted;
}

void fa_sched_finish(void* h, int64_t id) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  s->running.erase(id);
}

// Cancel: drop a request wherever it sits (waiting queue or running set).
// Returns 1 if it was found, 0 otherwise.  The caller owns freeing any pages
// a running request held — the scheduler never touches the allocator.
int32_t fa_sched_cancel(void* h, int64_t id) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  if (s->running.erase(id) > 0) return 1;
  for (auto it = s->waiting.begin(); it != s->waiting.end(); ++it) {
    if (it->id == id) {
      s->waiting.erase(it);
      return 1;
    }
  }
  return 0;
}

}  // extern "C"
