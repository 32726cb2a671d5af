// Native token-stream data loader for language-model training.
//
// The runtime tier of the framework (the reference is pure Python end to
// end; SURVEY.md §2 notes the native tier here is Pallas for compute —
// this is the native HOST side: feeding the chip without holding the
// Python GIL).
//
// Design: a token corpus is one binary file of little-endian int32 token
// ids. The loader mmaps it (zero-copy, page-cache backed), and N worker
// threads cut deterministic pseudo-random windows of seq_len+1 tokens into
// [batch, seq_len+1] int32 batches (inputs = [:, :-1], targets = [:, 1:]),
// filling a bounded ring of pre-assembled batches. The Python side
// (ctypes, np_modeling_tpu/training/native_data.py) pops finished batches
// and device_puts them; assembly and file IO overlap the training step.
//
// Determinism: batch b's windows come from splitmix64(seed, b * batch + i)
// regardless of thread scheduling, so runs are reproducible and the pure
// NumPy fallback can produce bit-identical batches (tested).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

// splitmix64: tiny, high-quality, stateless — the same sequence is
// reproduced in the NumPy fallback.
static inline uint64_t splitmix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ULL;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
  return x ^ (x >> 31);
}

struct Batch {
  int64_t index;
  std::vector<int32_t> data;
};

struct Loader {
  const int32_t* tokens = nullptr;
  int64_t n_tokens = 0;
  int64_t mapped_bytes = 0;
  int fd = -1;

  int64_t seq_len = 0;   // window is seq_len + 1 tokens
  int64_t batch = 0;
  uint64_t seed = 0;

  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::deque<Batch> ready;
  size_t capacity = 4;
  std::atomic<int64_t> next_to_produce{0};
  int64_t next_to_consume = 0;
  std::atomic<bool> stop{false};

  void fill(Batch* b) const {
    const int64_t window = seq_len + 1;
    const int64_t n_windows = n_tokens - window + 1;
    b->data.resize(batch * window);
    for (int64_t i = 0; i < batch; ++i) {
      uint64_t r = splitmix64(seed ^ (uint64_t)(b->index * batch + i));
      int64_t start = (int64_t)(r % (uint64_t)n_windows);
      std::memcpy(b->data.data() + i * window, tokens + start,
                  window * sizeof(int32_t));
    }
  }

  void worker() {
    while (!stop.load()) {
      Batch b;
      b.index = next_to_produce.fetch_add(1);
      fill(&b);
      std::unique_lock<std::mutex> lock(mu);
      // Gate on the batch's INDEX, not the ring size: a ring-size gate
      // can deadlock (other workers fill the ring with later indices
      // while the batch the consumer needs waits outside). An index gate
      // always admits the next-to-consume batch (index < next + capacity
      // holds whenever index == next_to_consume, since capacity >= 1).
      cv_full.wait(lock, [&] {
        return stop.load() ||
               b.index < next_to_consume + (int64_t)capacity;
      });
      if (stop.load()) return;
      ready.push_back(std::move(b));
      cv_empty.notify_all();
    }
  }
};

}  // namespace

extern "C" {

// Returns a handle, or nullptr on failure. File must hold >= seq_len+1
// int32 tokens.
void* dl_open(const char* path, int64_t seq_len, int64_t batch,
              uint64_t seed, int n_threads, int prefetch) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  int64_t n_tokens = st.st_size / (int64_t)sizeof(int32_t);
  if (n_tokens < seq_len + 1) {
    ::close(fd);
    return nullptr;
  }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (mem == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* L = new Loader();
  L->tokens = static_cast<const int32_t*>(mem);
  L->n_tokens = n_tokens;
  L->mapped_bytes = st.st_size;
  L->fd = fd;
  L->seq_len = seq_len;
  L->batch = batch;
  L->seed = seed;
  L->capacity = prefetch > 0 ? (size_t)prefetch : 4;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int t = 0; t < nt; ++t) {
    L->workers.emplace_back([L] { L->worker(); });
  }
  return L;
}

// Copies the next batch ([batch, seq_len+1] int32, row-major) into out.
// Batches are delivered strictly in index order regardless of which worker
// produced them. Returns 0 on success.
int dl_next(void* handle, int32_t* out) {
  auto* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lock(L->mu);
  for (;;) {
    for (auto it = L->ready.begin(); it != L->ready.end(); ++it) {
      if (it->index == L->next_to_consume) {
        std::memcpy(out, it->data.data(),
                    it->data.size() * sizeof(int32_t));
        L->ready.erase(it);
        L->next_to_consume++;
        L->cv_full.notify_all();
        return 0;
      }
    }
    L->cv_empty.wait(lock);
    if (L->stop.load()) return 1;
  }
}

int64_t dl_num_tokens(void* handle) {
  return static_cast<Loader*>(handle)->n_tokens;
}

void dl_close(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  {
    std::unique_lock<std::mutex> lock(L->mu);
    L->stop.store(true);
    L->cv_full.notify_all();
    L->cv_empty.notify_all();
  }
  for (auto& t : L->workers) t.join();
  munmap(const_cast<int32_t*>(L->tokens), L->mapped_bytes);
  ::close(L->fd);
  delete L;
}

}  // extern "C"
