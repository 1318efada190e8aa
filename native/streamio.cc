// Native stream-I/O runtime for rnnoise_tpu.
//
// Role: the host-side, latency-critical bookkeeping around the batched TPU
// compute step — per-stream PCM ring buffers, frame assembly into contiguous
// [S, 480] float batches (with int16 -> float conversion), active-slot
// masking for attach/detach without recompilation, and scatter of processed
// frames back to per-stream output rings.  This is the TPU-native analogue of
// the reference's per-stream C state handling (rnnoise_create /
// rnnoise_process_frame, reference src/denoise.c:311-321, 457-504), redesigned
// around a stream *pool* feeding one batched compute graph.
//
// Exposed as a flat C ABI consumed via ctypes (rnnoise_tpu/runtime/native.py).

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>

namespace {

constexpr int kFrameSize = 480;

struct Ring {
  std::vector<int16_t> data;
  size_t head = 0;  // read position
  size_t tail = 0;  // write position
  size_t size = 0;  // readable elements

  void reset(size_t capacity) {
    data.assign(capacity, 0);
    head = tail = size = 0;
  }
  size_t push(const int16_t* src, size_t n) {
    size_t space = data.size() - size;
    if (n > space) n = space;
    for (size_t i = 0; i < n; i++) {
      data[tail] = src[i];
      tail = (tail + 1) % data.size();
    }
    size += n;
    return n;
  }
  size_t pop(int16_t* dst, size_t n) {
    if (n > size) n = size;
    for (size_t i = 0; i < n; i++) {
      dst[i] = data[head];
      head = (head + 1) % data.size();
    }
    size -= n;
    return n;
  }
};

struct StreamPool {
  int n_slots;
  size_t ring_frames;
  std::vector<Ring> in_rings;
  std::vector<Ring> out_rings;
  std::vector<uint8_t> active;
  std::vector<uint8_t> needs_reset;  // slot was (re)attached; device state must re-init
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
  for (int i = 0; i < n_slots; i++) {
    p->in_rings[i].reset((size_t)ring_frames * kFrameSize);
    p->out_rings[i].reset((size_t)ring_frames * kFrameSize);
  }
  return p;
}

void rnnt_pool_destroy(StreamPool* p) { delete p; }

int rnnt_pool_n_slots(const StreamPool* p) { return p->n_slots; }

// Attach a new stream into the first free slot; returns slot id or -1.
int rnnt_pool_attach(StreamPool* p) {
  for (int i = 0; i < p->n_slots; i++) {
    if (!p->active[i]) {
      p->active[i] = 1;
      p->needs_reset[i] = 1;
      p->in_rings[i].reset(p->ring_frames * kFrameSize);
      p->out_rings[i].reset(p->ring_frames * kFrameSize);
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

// Assemble `t_frames` frames for every slot into batch[S, T, 480] f32.
// All-or-nothing per slot: a slot yields exactly t_frames whole frames or 0
// (partial takes would have to be re-queued, which corrupts ordering when a
// fractional frame remains in the ring).  frame_counts[s] receives t_frames
// or 0; reset_mask[s] is set if the slot was freshly attached since the last
// assemble (device state must be re-zeroed).
void rnnt_pool_assemble(StreamPool* p, int t_frames, float* batch,
                        int32_t* frame_counts, uint8_t* reset_mask) {
  const size_t frame_elems = (size_t)t_frames * kFrameSize;
  std::vector<int16_t> tmp(frame_elems);
  for (int s = 0; s < p->n_slots; s++) {
    float* dst = batch + (size_t)s * frame_elems;
    reset_mask[s] = p->needs_reset[s];
    p->needs_reset[s] = 0;
    int take = 0;
    if (p->active[s]) {
      size_t whole = p->in_rings[s].size / kFrameSize;
      take = (whole >= (size_t)t_frames) ? t_frames : 0;
    }
    frame_counts[s] = take;
    size_t got = take ? p->in_rings[s].pop(tmp.data(), (size_t)take * kFrameSize)
                      : 0;
    size_t i = 0;
    for (; i < got; i++) dst[i] = (float)tmp[i];
    for (; i < frame_elems; i++) dst[i] = 0.0f;
  }
}

// Scatter processed frames (batch[S, T, 480] f32) back into output rings,
// honouring frame_counts from the matching assemble call.  Values are
// rounded and clamped to int16 like the reference demo (rnnoise_demo.c:58).
void rnnt_pool_commit(StreamPool* p, int t_frames, const float* batch,
                      const int32_t* frame_counts) {
  const size_t frame_elems = (size_t)t_frames * kFrameSize;
  std::vector<int16_t> tmp(frame_elems);
  for (int s = 0; s < p->n_slots; s++) {
    int take = frame_counts[s];
    if (take <= 0) continue;
    const float* src = batch + (size_t)s * frame_elems;
    size_t n = (size_t)take * kFrameSize;
    for (size_t i = 0; i < n; i++) {
      float v = src[i];
      v = v > 0 ? v + 0.5f : v - 0.5f;  // round half away from zero
      if (v > 32767.f) v = 32767.f;
      if (v < -32768.f) v = -32768.f;
      tmp[i] = (int16_t)v;
    }
    p->out_rings[s].push(tmp.data(), n);
  }
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
