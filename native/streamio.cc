// Native stream-I/O runtime for rnnoise_tpu.
//
// Role: the host-side, latency-critical bookkeeping around the batched TPU
// compute step — per-stream PCM ring buffers, frame assembly into contiguous
// [S, T, 480] float batches (with int16 -> float conversion), active-slot
// masking for attach/detach without recompilation, and scatter of processed
// frames back to per-stream output rings.  This is the TPU-native analogue of
// the reference's per-stream C state handling (rnnoise_create /
// rnnoise_process_frame, reference src/denoise.c:311-321, 457-504), redesigned
// around a stream *pool* feeding one batched compute graph.
//
// Throughput design: ring push/pop move whole spans with memcpy (at most two
// per call, around the wrap point); all ring storage lives in one contiguous
// slab (dense per-tick working set, THP-friendly); assemble/commit move
// whole frame bursts with a single bookkeeping update per slot, directly
// between ring storage and the batch tensor (no staging copy), and fan the
// slot loop out over a persistent thread pool — at 4096 streams x 8 frames a
// tick moves ~94 MB, which must overlap the device step (see StreamingEngine
// pipelining).  Callers should reuse batch buffers across ticks (the ctypes
// wrapper's out= protocol): fresh allocations re-fault their pages every
// tick, measured as ~1.8x on the whole host tick.
//
// Exposed as a flat C ABI consumed via ctypes (rnnoise_tpu/runtime/native.py).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace {

constexpr int kFrameSize = 480;

// A fixed-capacity ring over a span of the pool's shared slab.  One
// contiguous backing store for all rings (instead of one heap allocation per
// ring) measurably matters on the assemble/commit paths: at 4096 streams the
// ring storage is ~120 MB, and per-ring allocations scatter it across the
// heap — the slab keeps the per-tick working set dense (and lets THP back it
// with huge pages), measured ~1.3x on the whole host tick on a 1-core VM.
struct Ring {
  int16_t* buf = nullptr;  // span inside StreamPool::slab
  size_t cap = 0;
  size_t head = 0;  // read position
  size_t tail = 0;  // write position
  size_t size = 0;  // readable elements

  void attach(int16_t* b, size_t capacity) {
    buf = b;
    cap = capacity;
    reset();
  }
  void reset() {
    memset(buf, 0, cap * sizeof(int16_t));
    head = tail = size = 0;
  }
  size_t push(const int16_t* src, size_t n) {
    size_t space = cap - size;
    if (n > space) n = space;
    size_t first = cap - tail;
    if (first > n) first = n;
    memcpy(buf + tail, src, first * sizeof(int16_t));
    memcpy(buf, src + first, (n - first) * sizeof(int16_t));
    tail = (tail + n) % cap;
    size += n;
    return n;
  }
  size_t pop(int16_t* dst, size_t n) {
    if (n > size) n = size;
    size_t first = cap - head;
    if (first > n) first = n;
    memcpy(dst, buf + head, first * sizeof(int16_t));
    if (n > first) memcpy(dst + first, buf, (n - first) * sizeof(int16_t));
    head = (head + n) % cap;
    size -= n;
    return n;
  }
  // Pop `take` whole frames into dst rows spaced `stride` apart (the
  // [T, S, 480] time-major batch layout), zero-filling rows take..t_frames.
  // One bookkeeping update for the whole burst instead of per-frame pop()
  // calls — the per-frame head/size updates are a measured ~15% of the
  // assemble phase at 4096 streams on one core.  Caller guarantees the ring
  // holds take whole frames (assemble's all-or-nothing contract).
  void pop_frames_strided(int16_t* dst, size_t stride, int take,
                          int t_frames) {
    size_t h = head;
    for (int t = 0; t < t_frames; t++) {
      int16_t* d = dst + (size_t)t * stride;
      if (t < take) {
        size_t first = cap - h;
        if (first >= (size_t)kFrameSize) {
          memcpy(d, buf + h, kFrameSize * sizeof(int16_t));
          h += kFrameSize;
          if (h == cap) h = 0;
        } else {
          memcpy(d, buf + h, first * sizeof(int16_t));
          memcpy(d + first, buf, (kFrameSize - first) * sizeof(int16_t));
          h = kFrameSize - first;
        }
      } else {
        memset(d, 0, kFrameSize * sizeof(int16_t));
      }
    }
    head = h;
    size -= (size_t)take * kFrameSize;
  }
  // Push `take` whole frames from src rows spaced `stride` apart; when the
  // ring fills mid-burst this truncates exactly like per-frame push()
  // (a final partial frame is possible), with one bookkeeping update.
  void push_frames_strided(const int16_t* src, size_t stride, int take) {
    size_t space = cap - size;
    size_t t0 = tail;
    size_t pushed = 0;
    for (int t = 0; t < take && space > 0; t++) {
      const int16_t* s = src + (size_t)t * stride;
      size_t n = (size_t)kFrameSize <= space ? (size_t)kFrameSize : space;
      size_t first = cap - t0;
      if (first >= n) {
        memcpy(buf + t0, s, n * sizeof(int16_t));
        t0 += n;
        if (t0 == cap) t0 = 0;
      } else {
        memcpy(buf + t0, s, first * sizeof(int16_t));
        memcpy(buf, s + first, (n - first) * sizeof(int16_t));
        t0 = n - first;
      }
      space -= n;
      pushed += n;
    }
    tail = t0;
    size += pushed;
  }
  // Pop n samples, converting to float straight into dst (two spans max).
  size_t pop_f32(float* dst, size_t n) {
    if (n > size) n = size;
    size_t first = cap - head;
    if (first > n) first = n;
    const int16_t* a = buf + head;
    for (size_t i = 0; i < first; i++) dst[i] = (float)a[i];
    const int16_t* b = buf;
    for (size_t i = first; i < n; i++) dst[i] = (float)b[i - first];
    head = (head + n) % cap;
    size -= n;
    return n;
  }
  // Push n samples, converting from float (round half away from zero,
  // clamp to int16 like the reference demo, rnnoise_demo.c:58).
  size_t push_f32(const float* src, size_t n) {
    size_t space = cap - size;
    if (n > space) n = space;
    size_t first = cap - tail;
    if (first > n) first = n;
    int16_t* a = buf + tail;
    for (size_t i = 0; i < first; i++) {
      float v = src[i];
      v = v > 0 ? v + 0.5f : v - 0.5f;
      if (v > 32767.f) v = 32767.f;
      if (v < -32768.f) v = -32768.f;
      a[i] = (int16_t)v;
    }
    int16_t* b = buf;
    for (size_t i = first; i < n; i++) {
      float v = src[i];
      v = v > 0 ? v + 0.5f : v - 0.5f;
      if (v > 32767.f) v = 32767.f;
      if (v < -32768.f) v = -32768.f;
      b[i - first] = (int16_t)v;
    }
    tail = (tail + n) % cap;
    size += n;
    return n;
  }
};

// Minimal persistent thread pool: parallel_for over slot ranges.
//
// Concurrency design: chunk tickets live in a single 64-bit atomic whose
// upper 32 bits carry the dispatch generation — a worker claims a chunk with
// a CAS that fails unless the ticket still belongs to the generation it
// snapshotted under the mutex, so a stale worker (woken late, or preempted
// mid-loop across a dispatch boundary) can never consume a chunk of — or
// decrement the completion count of — a newer dispatch.
struct Pool {
  std::vector<std::thread> workers;
  std::mutex m;
  std::condition_variable cv, done_cv;
  std::function<void(int, int)> job;  // [begin, end); set under m
  int n_chunks = 0, chunk = 0, total = 0;  // set under m
  uint64_t generation = 0;                 // set under m
  std::atomic<uint64_t> ticket{0};         // (generation << 32) | next_chunk
  std::atomic<int> remaining{0};
  bool stop = false;

  explicit Pool(int n_threads) {
    for (int i = 0; i < n_threads; i++) {
      workers.emplace_back([this] { worker(); });
    }
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(m);
      stop = true;
    }
    cv.notify_all();
    for (auto& w : workers) w.join();
  }
  // Claim and run chunks of generation `gen`; parameters are the caller's
  // under-mutex snapshot of that generation's dispatch.
  void run_chunks(uint64_t gen, const std::function<void(int, int)>& f,
                  int my_chunks, int my_chunk, int my_total) {
    for (;;) {
      uint64_t t = ticket.load(std::memory_order_acquire);
      if ((t >> 32) != gen) break;               // newer dispatch exists
      int c = (int)(t & 0xffffffffu);
      if (c >= my_chunks) break;                 // this dispatch exhausted
      if (!ticket.compare_exchange_weak(t, t + 1,
                                        std::memory_order_acq_rel)) {
        continue;
      }
      int b = c * my_chunk;
      int e = b + my_chunk < my_total ? b + my_chunk : my_total;
      f(b, e);
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(m);  // pair with done_cv predicate
        done_cv.notify_one();
      }
    }
  }
  void worker() {
    uint64_t seen = 0;
    for (;;) {
      std::function<void(int, int)> f;
      uint64_t gen;
      int my_chunks, my_chunk, my_total;
      {
        std::unique_lock<std::mutex> lk(m);
        cv.wait(lk, [&] { return stop || generation != seen; });
        if (stop) return;
        gen = seen = generation;
        f = job;
        my_chunks = n_chunks;
        my_chunk = chunk;
        my_total = total;
      }
      run_chunks(gen, f, my_chunks, my_chunk, my_total);
    }
  }
  void parallel_for(int n, std::function<void(int, int)> f) {
    if (n <= 0) return;
    uint64_t gen;
    int my_chunks, my_chunk;
    std::function<void(int, int)> myjob = std::move(f);
    {
      std::lock_guard<std::mutex> lk(m);
      int nthreads = (int)workers.size() + 1;
      chunk = (n + 4 * nthreads - 1) / (4 * nthreads);
      if (chunk < 1) chunk = 1;
      n_chunks = (n + chunk - 1) / chunk;
      total = n;
      job = myjob;
      gen = ++generation;
      remaining.store(n_chunks);
      ticket.store(gen << 32, std::memory_order_release);
      my_chunks = n_chunks;
      my_chunk = chunk;
    }
    cv.notify_all();
    run_chunks(gen, myjob, my_chunks, my_chunk, n);  // participate
    std::unique_lock<std::mutex> lk(m);
    done_cv.wait(lk, [&] { return remaining.load() == 0; });
  }
};

struct StreamPool {
  int n_slots;
  size_t ring_frames;
  std::vector<int16_t> slab;  // contiguous backing store for every ring
  std::vector<Ring> in_rings;
  std::vector<Ring> out_rings;
  std::vector<uint8_t> active;
  std::vector<uint8_t> needs_reset;  // slot was (re)attached; device state must re-init
  Pool* threads = nullptr;
};

}  // namespace

extern "C" {

StreamPool* rnnt_pool_create(int n_slots, int ring_frames) {
  auto* p = new StreamPool();
  p->n_slots = n_slots;
  p->ring_frames = ring_frames;
  p->in_rings.resize(n_slots);
  p->out_rings.resize(n_slots);
  p->active.assign(n_slots, 0);
  p->needs_reset.assign(n_slots, 0);
  const size_t rcap = (size_t)ring_frames * kFrameSize;
  p->slab.resize(2 * (size_t)n_slots * rcap);
  for (int i = 0; i < n_slots; i++) {
    p->in_rings[i].attach(p->slab.data() + (size_t)i * rcap, rcap);
    p->out_rings[i].attach(p->slab.data() + ((size_t)n_slots + i) * rcap,
                           rcap);
  }
  int nt;
  const char* env = std::getenv("RNNT_THREADS");  // worker-count override
  if (env && *env) {                              // (host-scaling experiments;
    nt = std::atoi(env);                          //  0 = no workers, caller
    if (nt < 0) nt = 0;                           //  thread runs everything)
    if (nt > 64) nt = 64;
    p->threads = new Pool(nt);
  } else {
    int hw = (int)std::thread::hardware_concurrency();
    nt = hw > 2 ? hw - 2 : 1;  // leave headroom for the device runtime
    if (nt > 16) nt = 16;
    p->threads = new Pool(nt - 1 > 0 ? nt - 1 : 1);
  }
  return p;
}

void rnnt_pool_destroy(StreamPool* p) {
  if (!p) return;
  delete p->threads;
  delete p;
}

int rnnt_pool_n_slots(const StreamPool* p) { return p->n_slots; }

// Attach a new stream into the first free slot; returns slot id or -1.
int rnnt_pool_attach(StreamPool* p) {
  for (int i = 0; i < p->n_slots; i++) {
    if (!p->active[i]) {
      p->active[i] = 1;
      p->needs_reset[i] = 1;
      p->in_rings[i].reset();
      p->out_rings[i].reset();
      return i;
    }
  }
  return -1;
}

void rnnt_pool_detach(StreamPool* p, int slot) {
  if (slot >= 0 && slot < p->n_slots) p->active[slot] = 0;
}

// Feed raw 16-bit PCM into a stream; returns samples accepted.
int64_t rnnt_pool_push(StreamPool* p, int slot, const int16_t* pcm, int64_t n) {
  if (slot < 0 || slot >= p->n_slots || !p->active[slot]) return -1;
  return (int64_t)p->in_rings[slot].push(pcm, (size_t)n);
}

// Read denoised 16-bit PCM from a stream; returns samples produced.
int64_t rnnt_pool_pull(StreamPool* p, int slot, int16_t* pcm, int64_t n) {
  if (slot < 0 || slot >= p->n_slots) return -1;
  return (int64_t)p->out_rings[slot].pop(pcm, (size_t)n);
}

int64_t rnnt_pool_available(const StreamPool* p, int slot) {
  if (slot < 0 || slot >= p->n_slots) return -1;
  return (int64_t)p->out_rings[slot].size;
}

// Bulk ingest: push n_per_slot samples into every ACTIVE slot from a
// contiguous [S, n_per_slot] int16 matrix (slot-major).  The per-slot
// entry points stay for packet-at-a-time servers (they are ~100 ns each
// from C); this is the zero-Python-overhead path for full-batch feeders.
// Returns the number of slots fed.
int rnnt_pool_push_all(StreamPool* p, const int16_t* pcm,
                       int64_t n_per_slot) {
  std::atomic<int> fed{0};
  p->threads->parallel_for(p->n_slots, [&](int b, int e) {
    int local = 0;
    for (int s = b; s < e; s++) {
      if (!p->active[s]) continue;
      p->in_rings[s].push(pcm + (size_t)s * n_per_slot, (size_t)n_per_slot);
      local++;
    }
    fed.fetch_add(local);
  });
  return fed.load();
}

// Bulk drain: pop up to n_per_slot samples per slot into [S, n_per_slot]
// (short reads zero-filled).  Returns the number of slots that produced a
// full n_per_slot.
int rnnt_pool_pull_all(StreamPool* p, int16_t* pcm, int64_t n_per_slot) {
  std::atomic<int> full{0};
  p->threads->parallel_for(p->n_slots, [&](int b, int e) {
    int local = 0;
    for (int s = b; s < e; s++) {
      int16_t* dst = pcm + (size_t)s * n_per_slot;
      size_t got = p->out_rings[s].pop(dst, (size_t)n_per_slot);
      if (got < (size_t)n_per_slot)
        memset(dst + got, 0, ((size_t)n_per_slot - got) * sizeof(int16_t));
      else
        local++;
    }
    full.fetch_add(local);
  });
  return full.load();
}

// Assemble `t_frames` frames for every slot into batch[S, T, 480] f32.
// All-or-nothing per slot: a slot yields exactly t_frames whole frames or 0
// (partial takes would have to be re-queued, which corrupts ordering when a
// fractional frame remains in the ring).  frame_counts[s] receives t_frames
// or 0; reset_mask[s] is set if the slot was freshly attached since the last
// assemble (device state must be re-zeroed).
void rnnt_pool_assemble(StreamPool* p, int t_frames, float* batch,
                        int32_t* frame_counts, uint8_t* reset_mask) {
  const size_t frame_elems = (size_t)t_frames * kFrameSize;
  p->threads->parallel_for(p->n_slots, [&](int b, int e) {
    for (int s = b; s < e; s++) {
      float* dst = batch + (size_t)s * frame_elems;
      reset_mask[s] = p->needs_reset[s];
      p->needs_reset[s] = 0;
      int take = 0;
      if (p->active[s]) {
        size_t whole = p->in_rings[s].size / kFrameSize;
        take = (whole >= (size_t)t_frames) ? t_frames : 0;
      }
      frame_counts[s] = take;
      size_t got =
          take ? p->in_rings[s].pop_f32(dst, (size_t)take * kFrameSize) : 0;
      if (got < frame_elems)
        memset(dst + got, 0, (frame_elems - got) * sizeof(float));
    }
  });
}

// Scatter processed frames (batch[S, T, 480] f32) back into output rings,
// honouring frame_counts from the matching assemble call.  Values are
// rounded and clamped to int16 like the reference demo (rnnoise_demo.c:58).
void rnnt_pool_commit(StreamPool* p, int t_frames, const float* batch,
                      const int32_t* frame_counts) {
  const size_t frame_elems = (size_t)t_frames * kFrameSize;
  p->threads->parallel_for(p->n_slots, [&](int b, int e) {
    for (int s = b; s < e; s++) {
      int take = frame_counts[s];
      if (take <= 0) continue;
      const float* src = batch + (size_t)s * frame_elems;
      p->out_rings[s].push_f32(src, (size_t)take * kFrameSize);
    }
  });
}

// Time-major variants: batch is laid out [T, S, 480] so the device scan can
// consume/produce it without boundary transposes (denoise.process_frames_tm).
// Rings move one 480-sample frame per memcpy; the stride between a slot's
// consecutive frames is the full stream axis.
void rnnt_pool_assemble_tm(StreamPool* p, int t_frames, float* batch,
                           int32_t* frame_counts, uint8_t* reset_mask) {
  const size_t stride = (size_t)p->n_slots * kFrameSize;
  p->threads->parallel_for(p->n_slots, [&](int b, int e) {
    for (int s = b; s < e; s++) {
      reset_mask[s] = p->needs_reset[s];
      p->needs_reset[s] = 0;
      int take = 0;
      if (p->active[s]) {
        size_t whole = p->in_rings[s].size / kFrameSize;
        take = (whole >= (size_t)t_frames) ? t_frames : 0;
      }
      frame_counts[s] = take;
      for (int t = 0; t < t_frames; t++) {
        float* dst = batch + (size_t)t * stride + (size_t)s * kFrameSize;
        if (t < take)
          p->in_rings[s].pop_f32(dst, kFrameSize);
        else
          memset(dst, 0, kFrameSize * sizeof(float));
      }
    }
  });
}

void rnnt_pool_commit_tm(StreamPool* p, int t_frames, const float* batch,
                         const int32_t* frame_counts) {
  const size_t stride = (size_t)p->n_slots * kFrameSize;
  p->threads->parallel_for(p->n_slots, [&](int b, int e) {
    for (int s = b; s < e; s++) {
      int take = frame_counts[s];
      for (int t = 0; t < take; t++) {
        const float* src = batch + (size_t)t * stride
                           + (size_t)s * kFrameSize;
        p->out_rings[s].push_f32(src, kFrameSize);
      }
    }
  });
}

// Raw-int16 time-major variants: pure frame memcpys between the rings and a
// [T, S, 480] int16 tensor — the int16<->f32 conversion moves onto the
// device (denoise.process_frames_tm_i16), halving host<->device bytes and
// removing the host conversion loops from the tick.
void rnnt_pool_assemble_tm_i16(StreamPool* p, int t_frames, int16_t* batch,
                               int32_t* frame_counts, uint8_t* reset_mask) {
  const size_t stride = (size_t)p->n_slots * kFrameSize;
  p->threads->parallel_for(p->n_slots, [&](int b, int e) {
    for (int s = b; s < e; s++) {
      reset_mask[s] = p->needs_reset[s];
      p->needs_reset[s] = 0;
      int take = 0;
      if (p->active[s]) {
        size_t whole = p->in_rings[s].size / kFrameSize;
        take = (whole >= (size_t)t_frames) ? t_frames : 0;
      }
      frame_counts[s] = take;
      p->in_rings[s].pop_frames_strided(
          batch + (size_t)s * kFrameSize, stride, take, t_frames);
    }
  });
}

void rnnt_pool_commit_tm_i16(StreamPool* p, int t_frames,
                             const int16_t* batch,
                             const int32_t* frame_counts) {
  const size_t stride = (size_t)p->n_slots * kFrameSize;
  p->threads->parallel_for(p->n_slots, [&](int b, int e) {
    for (int s = b; s < e; s++) {
      int take = frame_counts[s];
      if (take <= 0) continue;
      p->out_rings[s].push_frames_strided(
          batch + (size_t)s * kFrameSize, stride, take);
    }
  });
}

// Strided raw-int16 time-major variants for multi-process fan-out
// (runtime/fanout.py): K worker processes each own a StreamPool for a
// contiguous range of the global slot axis and assemble/commit DIRECTLY
// into the shared [T, S_total, 480] batch tensor.  `batch` is the base of
// the full tensor, `total_slots` gives the T stride, and `slot_offset` is
// this pool's first global slot.  frame_counts/reset_mask point at this
// pool's own slices (length n_slots).
void rnnt_pool_assemble_tm_i16_strided(StreamPool* p, int t_frames,
                                       int16_t* batch, int64_t total_slots,
                                       int64_t slot_offset,
                                       int32_t* frame_counts,
                                       uint8_t* reset_mask) {
  const size_t stride = (size_t)total_slots * kFrameSize;
  p->threads->parallel_for(p->n_slots, [&](int b, int e) {
    for (int s = b; s < e; s++) {
      reset_mask[s] = p->needs_reset[s];
      p->needs_reset[s] = 0;
      int take = 0;
      if (p->active[s]) {
        size_t whole = p->in_rings[s].size / kFrameSize;
        take = (whole >= (size_t)t_frames) ? t_frames : 0;
      }
      frame_counts[s] = take;
      p->in_rings[s].pop_frames_strided(
          batch + (size_t)(slot_offset + s) * kFrameSize, stride, take,
          t_frames);
    }
  });
}

void rnnt_pool_commit_tm_i16_strided(StreamPool* p, int t_frames,
                                     const int16_t* batch,
                                     int64_t total_slots, int64_t slot_offset,
                                     const int32_t* frame_counts) {
  const size_t stride = (size_t)total_slots * kFrameSize;
  p->threads->parallel_for(p->n_slots, [&](int b, int e) {
    for (int s = b; s < e; s++) {
      int take = frame_counts[s];
      if (take <= 0) continue;
      p->out_rings[s].push_frames_strided(
          batch + (size_t)(slot_offset + s) * kFrameSize, stride, take);
    }
  });
}

// Strided bulk ingest/drain against a [S_total, n_per_slot] int16 matrix:
// this pool's slot s maps to global row slot_offset + s.
int rnnt_pool_push_all_strided(StreamPool* p, const int16_t* pcm,
                               int64_t n_per_slot, int64_t slot_offset) {
  std::atomic<int> fed{0};
  p->threads->parallel_for(p->n_slots, [&](int b, int e) {
    int local = 0;
    for (int s = b; s < e; s++) {
      if (!p->active[s]) continue;
      p->in_rings[s].push(pcm + (size_t)(slot_offset + s) * n_per_slot,
                          (size_t)n_per_slot);
      local++;
    }
    fed.fetch_add(local);
  });
  return fed.load();
}

int rnnt_pool_pull_all_strided(StreamPool* p, int16_t* pcm,
                               int64_t n_per_slot, int64_t slot_offset) {
  std::atomic<int> full{0};
  p->threads->parallel_for(p->n_slots, [&](int b, int e) {
    int local = 0;
    for (int s = b; s < e; s++) {
      int16_t* dst = pcm + (size_t)(slot_offset + s) * n_per_slot;
      size_t got = p->out_rings[s].pop(dst, (size_t)n_per_slot);
      if (got < (size_t)n_per_slot)
        memset(dst + got, 0, ((size_t)n_per_slot - got) * sizeof(int16_t));
      else
        local++;
    }
    full.fetch_add(local);
  });
  return full.load();
}

// ---------------------------------------------------------------------------
// DNNw weight-blob validation (native port of parse_weights,
// reference src/parse_lpcnet_weights.c:37-78).  Returns the number of arrays,
// or -1 on malformed input.  Optionally fills `names` (concatenated,
// NUL-separated, up to names_cap bytes).
// ---------------------------------------------------------------------------

int rnnt_blob_validate(const uint8_t* data, int64_t len, char* names,
                       int64_t names_cap) {
  const int kBlock = 64;
  int count = 0;
  int64_t pos = 0;
  int64_t names_pos = 0;
  while (len - pos > 0) {
    if (len - pos < kBlock) return -1;
    const uint8_t* h = data + pos;
    if (memcmp(h, "DNNw", 4) != 0) return -1;
    int32_t version, type, size, block_size;
    memcpy(&version, h + 4, 4);
    memcpy(&type, h + 8, 4);
    memcpy(&size, h + 12, 4);
    memcpy(&block_size, h + 16, 4);
    if (version != 0 || size < 0) return -1;
    if (block_size < size || block_size > len - pos - kBlock) return -1;
    if (h[kBlock - 1] != 0) return -1;
    if (names != nullptr) {
      const char* nm = (const char*)(h + 20);
      int64_t l = (int64_t)strnlen(nm, 44);
      if (names_pos + l + 1 < names_cap) {
        memcpy(names + names_pos, nm, l);
        names_pos += l;
        names[names_pos++] = '\0';
      }
    }
    pos += kBlock + block_size;
    count++;
  }
  if (names != nullptr && names_pos < names_cap) names[names_pos] = '\0';
  return count;
}

}  // extern "C"
