// Native host-side paged-KV block allocator.
//
// TPU-native counterpart of the reference's C++/NPU runtime allocator
// (the reference keeps its block bookkeeping in the torch_npu C++ runtime;
// here the device side is a functional KVCaches pytree and the only
// mutable state is this host allocator, which sits on the per-step
// serving path and must never become the bottleneck of a fused decode).
//
// Plain C ABI so Python binds via ctypes (no pybind11 in the image).
// All tables are owned by the caller (numpy int32 buffers, passed per
// call) — the allocator owns only the LIFO free stack, so Python and
// native code share one source of truth with zero copies.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Allocator {
  int32_t batch;
  int32_t max_blocks_per_seq;
  int32_t block_size;
  std::vector<int32_t> free_stack;  // LIFO: top = next block handed out
};

inline int32_t ceil_div(int32_t a, int32_t b) { return (a + b - 1) / b; }

}  // namespace

extern "C" {

Allocator* mojo_alloc_create(int32_t batch, int32_t max_blocks_per_seq,
                             int32_t total_blocks, int32_t block_size) {
  if (batch <= 0 || max_blocks_per_seq <= 0 || total_blocks <= 0 ||
      block_size <= 0)
    return nullptr;
  auto* a = new Allocator();
  a->batch = batch;
  a->max_blocks_per_seq = max_blocks_per_seq;
  a->block_size = block_size;
  a->free_stack.reserve(total_blocks);
  // Matches the Python fallback: free list [0..total) consumed from the
  // high end, so block ids are handed out in identical order.
  for (int32_t i = 0; i < total_blocks; ++i) a->free_stack.push_back(i);
  return a;
}

void mojo_alloc_destroy(Allocator* a) { delete a; }

int32_t mojo_alloc_free_count(const Allocator* a) {
  return static_cast<int32_t>(a->free_stack.size());
}

// Reserve space for q_lens[i] appended tokens on every sequence.
// seq_lens / block_tables are caller buffers updated in place;
// context_out[i] receives the pre-reserve length (the attention
// context). Transactional: on OOM returns -1 and mutates NOTHING.
int32_t mojo_alloc_reserve(Allocator* a, const int32_t* q_lens,
                           int32_t* seq_lens, int32_t* block_tables,
                           int32_t* context_out) {
  const int32_t bs = a->block_size;
  int64_t needed = 0;
  for (int32_t i = 0; i < a->batch; ++i) {
    const int32_t oldb = ceil_div(seq_lens[i], bs);
    const int32_t newb = ceil_div(seq_lens[i] + q_lens[i], bs);
    if (newb > a->max_blocks_per_seq) return -2;  // per-seq table overflow
    const int32_t* row =
        block_tables + static_cast<int64_t>(i) * a->max_blocks_per_seq;
    for (int32_t b = oldb; b < newb; ++b)
      // valid entries past the length are blocks this sequence still
      // owns from a rolled-back reserve (speculative rewind) — they get
      // reused, not re-allocated (overwriting them would leak)
      if (row[b] < 0) ++needed;
  }
  if (needed > static_cast<int64_t>(a->free_stack.size())) return -1;

  for (int32_t i = 0; i < a->batch; ++i) {
    const int32_t oldb = ceil_div(seq_lens[i], bs);
    const int32_t newb = ceil_div(seq_lens[i] + q_lens[i], bs);
    int32_t* row = block_tables + static_cast<int64_t>(i) * a->max_blocks_per_seq;
    // Hand out stack entries one at a time from the tail — bit-identical
    // tables to the numpy fallback's per-entry pop.
    for (int32_t b = oldb; b < newb; ++b) {
      if (row[b] < 0) {
        row[b] = a->free_stack.back();
        a->free_stack.pop_back();
      }
    }
    context_out[i] = seq_lens[i];
    seq_lens[i] += q_lens[i];
  }
  return 0;
}

// Return every block of one finished sequence to the free stack and
// clear its table row (continuous-batching slot reuse).
void mojo_alloc_release(Allocator* a, int32_t batch_idx, int32_t* seq_lens,
                        int32_t* block_tables) {
  if (batch_idx < 0 || batch_idx >= a->batch) return;
  // Free EVERY valid row entry, not just ceil(len/bs): speculative
  // decoding rewinds seq_lens after rejecting drafted tokens, which can
  // leave reserved blocks beyond the rewound length — slicing by `used`
  // would leak them on release.
  int32_t* row =
      block_tables + static_cast<int64_t>(batch_idx) * a->max_blocks_per_seq;
  for (int32_t b = a->max_blocks_per_seq - 1; b >= 0; --b) {
    if (row[b] >= 0) a->free_stack.push_back(row[b]);
    row[b] = -1;
  }
  seq_lens[batch_idx] = 0;
}

void mojo_alloc_reset(Allocator* a, int32_t total_blocks, int32_t* seq_lens,
                      int32_t* block_tables) {
  a->free_stack.clear();
  for (int32_t i = 0; i < total_blocks; ++i) a->free_stack.push_back(i);
  std::memset(seq_lens, 0, sizeof(int32_t) * a->batch);
  const int64_t n =
      static_cast<int64_t>(a->batch) * a->max_blocks_per_seq;
  for (int64_t i = 0; i < n; ++i) block_tables[i] = -1;
}

}  // extern "C"
