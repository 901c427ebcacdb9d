// Native prefetching data loader for minidiff_tpu.
//
// The reference framework has no data-loading subsystem at all (it is a
// 4.5 kLoC autodiff library; SURVEY.md §2.2), and its IO is np.save/np.load
// (minidiff/backend/numpy.py:129-130).  This is the TPU-runtime counterpart:
// training input pipelines must hide host-side batch assembly behind device
// compute, so batch gathering runs here — in C++ worker threads over an
// mmap'd dataset — while Python/JAX keeps the TPU busy.  The ctypes call
// into ld_next releases the GIL, so prefetch genuinely overlaps.
//
// Design:
//   * dataset = a flat binary file of n_items fixed-size records (the Python
//     side owns dtype/shape metadata); the file is mmap'd read-only and
//     MADV_SEQUENTIAL/WILLNEED-hinted.
//   * an epoch is a (optionally shuffled, seed+epoch-deterministic)
//     permutation of record indices, chunked into batches.
//   * n_threads workers claim batch indices in order, gather records into
//     per-batch buffers (the random-access memcpy pass is the expensive
//     part), and publish them into a bounded in-order queue (capacity
//     batches of lookahead, so memory stays O(capacity * batch_bytes)).
//   * ld_next blocks until the next in-sequence batch is ready and copies it
//     into the caller's buffer.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread loader.cpp -o ...so
// (driven by minidiff_tpu/native/__init__.py, cached per source hash).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Loader {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t file_bytes = 0;

  uint64_t n_items = 0;
  uint64_t item_bytes = 0;
  uint32_t batch = 0;
  uint32_t n_threads = 1;
  uint32_t capacity = 4;
  uint64_t seed = 0;
  bool shuffle = false;
  bool drop_last = false;

  // epoch state
  std::vector<uint64_t> perm;
  uint64_t n_batches = 0;
  std::vector<std::thread> workers;

  std::mutex mu;
  std::condition_variable cv_prod;  // workers wait for lookahead room
  std::condition_variable cv_cons;  // consumer waits for the next batch
  std::map<uint64_t, std::vector<uint8_t>> ready;
  uint64_t claim_next = 0;    // next batch index a worker may take
  uint64_t deliver_next = 0;  // next batch index ld_next hands out
  bool stop = false;

  uint64_t batch_items(uint64_t b) const {
    uint64_t start = b * batch;
    uint64_t remain = n_items - start;
    return remain < batch ? remain : batch;
  }

  void worker() {
    for (;;) {
      uint64_t b;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_prod.wait(lk, [&] {
          return stop || claim_next >= n_batches ||
                 claim_next < deliver_next + capacity;
        });
        if (stop || claim_next >= n_batches) return;
        b = claim_next++;
      }
      uint64_t items = batch_items(b);
      std::vector<uint8_t> buf(items * item_bytes);
      const uint64_t* idx = perm.data() + b * batch;
      for (uint64_t i = 0; i < items; ++i) {
        std::memcpy(buf.data() + i * item_bytes,
                    base + idx[i] * item_bytes, item_bytes);
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        ready.emplace(b, std::move(buf));
      }
      cv_cons.notify_all();
    }
  }

  void join_workers() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_prod.notify_all();
    for (auto& t : workers) {
      if (t.joinable()) t.join();
    }
    workers.clear();
    stop = false;
  }
};

}  // namespace

extern "C" {

void* ld_open(const char* path, uint64_t n_items, uint64_t item_bytes,
              uint32_t batch, uint32_t n_threads, uint32_t capacity,
              uint64_t seed, int shuffle, int drop_last) {
  if (n_items == 0 || item_bytes == 0 || batch == 0) return nullptr;
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 ||
      static_cast<uint64_t>(st.st_size) < n_items * item_bytes) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  madvise(base, st.st_size, MADV_WILLNEED);

  auto* ld = new Loader();
  ld->fd = fd;
  ld->base = static_cast<const uint8_t*>(base);
  ld->file_bytes = st.st_size;
  ld->n_items = n_items;
  ld->item_bytes = item_bytes;
  ld->batch = batch;
  ld->n_threads = n_threads ? n_threads : 1;
  ld->capacity = capacity ? capacity : 2;
  ld->seed = seed;
  ld->shuffle = shuffle != 0;
  ld->drop_last = drop_last != 0;
  return ld;
}

uint64_t ld_num_batches(void* h) {
  auto* ld = static_cast<Loader*>(h);
  if (ld->drop_last) return ld->n_items / ld->batch;
  return (ld->n_items + ld->batch - 1) / ld->batch;
}

int ld_start_epoch(void* h, uint64_t epoch) {
  auto* ld = static_cast<Loader*>(h);
  ld->join_workers();
  ld->ready.clear();
  ld->claim_next = 0;
  ld->deliver_next = 0;

  ld->perm.resize(ld->n_items);
  for (uint64_t i = 0; i < ld->n_items; ++i) ld->perm[i] = i;
  if (ld->shuffle) {
    std::mt19937_64 rng(ld->seed + 0x9e3779b97f4a7c15ULL * (epoch + 1));
    for (uint64_t i = ld->n_items - 1; i > 0; --i) {
      uint64_t j = rng() % (i + 1);
      std::swap(ld->perm[i], ld->perm[j]);
    }
  }
  ld->n_batches = ld_num_batches(h);

  for (uint32_t t = 0; t < ld->n_threads; ++t) {
    ld->workers.emplace_back([ld] { ld->worker(); });
  }
  return 0;
}

// Copies the next batch into `out`; returns item count (0 = epoch finished).
long long ld_next(void* h, uint8_t* out) {
  auto* ld = static_cast<Loader*>(h);
  uint64_t b;
  std::vector<uint8_t> buf;
  {
    std::unique_lock<std::mutex> lk(ld->mu);
    if (ld->deliver_next >= ld->n_batches) return 0;
    b = ld->deliver_next;
    ld->cv_cons.wait(lk, [&] { return ld->ready.count(b) > 0; });
    buf = std::move(ld->ready[b]);
    ld->ready.erase(b);
    ld->deliver_next = b + 1;
  }
  ld->cv_prod.notify_all();
  std::memcpy(out, buf.data(), buf.size());
  return static_cast<long long>(buf.size() / ld->item_bytes);
}

void ld_close(void* h) {
  auto* ld = static_cast<Loader*>(h);
  ld->join_workers();
  if (ld->base) munmap(const_cast<uint8_t*>(ld->base), ld->file_bytes);
  if (ld->fd >= 0) ::close(ld->fd);
  delete ld;
}

}  // extern "C"
