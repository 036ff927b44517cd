// LENS-TPU native event-stream runtime.
//
// Replaces the closed-source samna C++ driver surface the reference leans on
// for DVS preprocessing (reference run_speck.py:258-271: hot-pixel filter with
// threshold 5, ROI origin/cut crop, channel merge) and the per-event Python
// hot loops in collect_data.py:193-202 and tools/dvstools.py:288-361.  The
// host-side event decode/accumulate is the one part of the pipeline XLA cannot
// express (variable-length streams); everything downstream is JAX.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o liblens_events.so lens_events.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <deque>
#include <mutex>
#include <vector>

extern "C" {

// Accumulate a timestamp-sorted event stream into per-timebin count frames.
//
//   t          : (n) event timestamps, seconds
//   x, y       : (n) pixel coordinates (sensor space)
//   n          : number of events
//   t0         : stream start; <0 means "use first event's timestamp"
//                (reference dvstools.py:294-297 initializes the offset lazily)
//   timebin_s  : frame interval in seconds (1/timebin of dvstools.py:174)
//   roi_x/y    : ROI origin (reference run_speck.py:268-269: (23, 0))
//   roi_w/h    : ROI size  (cut - origin + 1; 80x80 on the Speck path)
//   hot_thresh : per-bin per-pixel event cap; counts above it are clamped and
//                the pixel flagged hot for that bin (software analogue of the
//                chip's dvs_filter.threshold = 5, run_speck.py:262-264).
//                <= 0 disables the filter.
//   frames     : out, (max_frames, roi_h, roi_w) uint32, zero-initialized here
//   max_frames : capacity of `frames`
//
// Returns the number of frames written (the last, partial bin included).
int64_t lens_accumulate_frames(const double* t, const uint16_t* x,
                               const uint16_t* y, int64_t n, double t0,
                               double timebin_s, int roi_x, int roi_y,
                               int roi_w, int roi_h, int hot_thresh,
                               uint32_t* frames, int64_t max_frames) {
  if (n <= 0 || max_frames <= 0) return 0;
  const int64_t frame_px = (int64_t)roi_w * roi_h;
  std::memset(frames, 0, sizeof(uint32_t) * frame_px * max_frames);
  if (t0 < 0) t0 = t[0];

  int64_t frame_idx = 0;
  double frame_end = t0 + timebin_s;
  uint32_t* cur = frames;

  auto finish_bin = [&]() {
    if (hot_thresh > 0) {
      for (int64_t p = 0; p < frame_px; ++p)
        if (cur[p] > (uint32_t)hot_thresh) cur[p] = (uint32_t)hot_thresh;
    }
  };

  for (int64_t i = 0; i < n; ++i) {
    if (t[i] < t0) continue;  // pre-start events skipped (dvstools.py:300)
    while (t[i] >= frame_end) {
      finish_bin();
      if (++frame_idx >= max_frames) return frame_idx;
      cur = frames + frame_idx * frame_px;
      frame_end += timebin_s;
    }
    const int xr = (int)x[i] - roi_x;
    const int yr = (int)y[i] - roi_y;
    if (xr < 0 || xr >= roi_w || yr < 0 || yr >= roi_h) continue;  // ROI cut
    cur[(int64_t)yr * roi_w + xr] += 1;  // polarity-merged (dvs_layer.merge)
  }
  finish_bin();
  return frame_idx + 1;
}

// Per-pixel exponential-decay frame representation
// (reference dvstools.py decay_rep, 305-316 / 334-342):
//   on each event: frame[p] = frame[p] * exp(-lambda * dt_since_last) + accum
//   at bin close:  frame    = frame    * exp(-lambda * (interval - active))
// Emits float frames; caller converts/quantizes.
int64_t lens_decay_frames(const double* t, const uint16_t* x, const uint16_t* y,
                          int64_t n, double t0, double timebin_s,
                          double decay_lambda, double accum, int width,
                          int height, float* frames, int64_t max_frames) {
  if (n <= 0 || max_frames <= 0) return 0;
  const int64_t frame_px = (int64_t)width * height;
  std::memset(frames, 0, sizeof(float) * frame_px * max_frames);
  if (t0 < 0) t0 = t[0];

  std::vector<double> state(frame_px, 0.0);
  std::vector<double> last_update(frame_px, t0);
  std::vector<double> active(frame_px, 0.0);

  int64_t frame_idx = 0;
  double frame_end = t0 + timebin_s;

  auto close_bin = [&]() {
    for (int64_t p = 0; p < frame_px; ++p) {
      const double tail = timebin_s - active[p];
      const double v = state[p] * std::exp(-decay_lambda * (tail > 0 ? tail : 0));
      frames[frame_idx * frame_px + p] = (float)v;
      state[p] = v;
      active[p] = 0.0;
      last_update[p] = frame_end;
    }
  };

  for (int64_t i = 0; i < n; ++i) {
    if (t[i] < t0) continue;
    while (t[i] >= frame_end) {
      close_bin();
      if (++frame_idx >= max_frames) return frame_idx;
      frame_end += timebin_s;
    }
    if (x[i] >= width || y[i] >= height) continue;
    const int64_t p = (int64_t)y[i] * width + x[i];
    const double dt = t[i] - last_update[p];
    active[p] += dt;
    state[p] = state[p] * std::exp(-decay_lambda * dt) + accum;
    last_update[p] = t[i];
  }
  close_bin();
  return frame_idx + 1;
}

// Identify hot pixels: pixels whose total event count exceeds
// `count_threshold` across the stream (offline analogue of the exclusion
// lists consumed by dvstools.py:122-128).  Returns number found; writes up to
// max_out (x, y) pairs.
int64_t lens_find_hot_pixels(const uint16_t* x, const uint16_t* y, int64_t n,
                             int width, int height, int64_t count_threshold,
                             uint16_t* out_xy, int64_t max_out) {
  std::vector<int64_t> counts((int64_t)width * height, 0);
  for (int64_t i = 0; i < n; ++i) {
    if (x[i] < width && y[i] < height) counts[(int64_t)y[i] * width + x[i]]++;
  }
  int64_t found = 0;
  for (int yy = 0; yy < height && found < max_out; ++yy)
    for (int xx = 0; xx < width && found < max_out; ++xx)
      if (counts[(int64_t)yy * width + xx] > count_threshold) {
        out_xy[found * 2] = (uint16_t)xx;
        out_xy[found * 2 + 1] = (uint16_t)yy;
        ++found;
      }
  return found;
}

// Parse a whitespace text event file ("t x y pol" lines after an optional
// "width height" header — the format ExtractRosbag emits, dvstools.py:73-79).
// Two-pass ctypes-friendly API: first call with events=nullptr to count.
int64_t lens_parse_text_events(const char* path, double* t, uint16_t* x,
                               uint16_t* y, uint8_t* pol, int64_t capacity,
                               int* width, int* height) {
  FILE* f = std::fopen(path, "r");
  if (!f) return -1;
  char line[8192];
  int64_t count = 0;
  *width = 0;
  *height = 0;
  bool first = true;
  while (std::fgets(line, sizeof(line), f)) {
    // A line longer than the buffer would otherwise be split into chunks
    // whose tails can parse as phantom events; skip the overflow line
    // entirely (consume to newline), matching the Python fallback's
    // whole-line parsing.
    if (std::strchr(line, '\n') == nullptr && !std::feof(f)) {
      int ch;
      while ((ch = std::fgetc(f)) != '\n' && ch != EOF) {
      }
      first = false;
      continue;
    }
    double a, b, c, d;
    char probe[2];
    const int got = std::sscanf(line, "%lf %lf %lf %lf", &a, &b, &c, &d);
    // Header iff the line holds EXACTLY two tokens (the fallback's rule):
    // a partially-corrupt 4-field event whose first two tokens are numeric
    // must not be consumed as a bogus width/height.
    if (first && got == 2 &&
        std::sscanf(line, "%*s %*s %1s", probe) != 1) {
      *width = (int)a;
      *height = (int)b;
      first = false;
      continue;
    }
    first = false;
    if (got < 4) continue;
    if (t != nullptr) {
      if (count >= capacity) break;
      t[count] = a;
      x[count] = (uint16_t)b;
      y[count] = (uint16_t)c;
      pol[count] = (uint8_t)d;
    }
    ++count;
  }
  std::fclose(f);
  return count;
}

// Parse complete "t x y [pol]" lines from an in-memory buffer (the LIVE
// stdin ingest fast path: the Python feeder reads raw chunks and hands the
// bytes here instead of float()-parsing ~3 tokens per line in Python —
// measured the live loop's bottleneck at on-chip densities).  Only
// '\n'-terminated lines are consumed; *consumed reports the byte offset of
// the last complete line so the caller carries the partial tail into the
// next chunk.  Lines with fewer than 3 numeric tokens (e.g. the optional
// "width height" header, heartbeats, comments) are skipped — the same rule
// as the Python line loop.  Returns the number of events written.
int64_t lens_parse_text_buffer(const char* buf, int64_t len, double* t,
                               uint16_t* x, uint16_t* y, int64_t capacity,
                               int64_t* consumed) {
  int64_t count = 0;
  int64_t pos = 0;
  *consumed = 0;
  while (pos < len && count < capacity) {
    const char* line = buf + pos;
    const char* nl =
        (const char*)std::memchr(line, '\n', (size_t)(len - pos));
    if (nl == nullptr) break;  // partial line: leave for the next chunk
    const int64_t line_len = (int64_t)(nl - line);
    pos += line_len + 1;
    *consumed = pos;
    if (line_len >= 8190) continue;  // overflow-length line: skip whole
    char tmp[8192];
    std::memcpy(tmp, line, (size_t)line_len);
    tmp[line_len] = '\0';
    double a, b, c;
    if (std::sscanf(tmp, "%lf %lf %lf", &a, &b, &c) == 3) {
      t[count] = a;
      x[count] = (uint16_t)b;
      y[count] = (uint16_t)c;
      ++count;
    }
  }
  return count;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Live streaming ingest session — the samna event-graph role (reference
// run_speck.py:281-299: source node -> spike-collection interval -> readout
// callback) as a first-party ring: a producer thread feeds raw AER events as
// they arrive; a consumer polls complete timebins, each emitted as an
// ROI count frame plus an event-TIME substep raster over the (pre-mapped)
// network input pixels.  Semantics are bit-identical to the offline batch
// path (lens_tpu/runtime/stream.py aer_bin_source / rasterize_bin_events):
//   - t0 = first event inside the ROI
//   - bin b = floor((t - t0) / timebin_s); substep = floor(t_rel/bin * S)
//   - hot-pixel cap: frame counts clamped; raster capped cumulatively so the
//     EARLIEST events are kept
// Feed and poll may run on different threads (mutex-guarded).

namespace {

// Ready-queue entry: either a run of `empties` consecutive all-zero bins
// (stored as a counter — never materialized) or one packed data blob.
// A corrupt AER line with a far-future timestamp used to drive
// `while (cur_bin < b) close_bin_locked()`, eagerly packing every
// intervening empty bin (~10 MB each at substeps=250/n_in=10000) and
// exhausting host memory; runs of empty bins are now O(1) memory and
// synthesized as zero frames lazily at poll time.
struct BinEntry {
  int64_t empties = 0;           // > 0: that many empty bins; 0: data blob
  std::vector<uint8_t> blob;
};

// Gap-far drops tolerated before concluding the stream clock was anchored
// by a corrupt far-past line (at chip event densities, 32 events is a tiny
// fraction of one bin — recovery costs almost nothing).
static constexpr int64_t kFarStreakRebase = 32;

struct LensStream {
  double timebin_s;
  int roi_x, roi_y, roi_w, roi_h, hot_cap, substeps, n_in;
  int64_t max_gap_bins;  // corruption guard: events jumping further ahead
                         // than this many bins are dropped as corrupt
  int64_t far_streak = 0;  // consecutive gap-far drops before the first
                           // emitted bin; a long streak means t0 itself was
                           // anchored by a corrupt far-past line
  std::vector<int32_t> lut;  // roi_h*roi_w -> input index or -1
  std::mutex mu;
  double t0 = -1.0;
  int64_t cur_bin = 0;
  bool any = false;
  bool cur_dirty = false;        // current bin has received >=1 event
  std::vector<uint32_t> frame;   // current bin, (roi_h*roi_w)
  std::vector<int32_t> raster;   // current bin, (substeps*n_in)
  std::deque<BinEntry> ready;
  int64_t pending_bins = 0;      // total bins poll() will emit

  LensStream() = default;

  void close_bin_locked() {
    if (!cur_dirty) {  // all-zero bin: extend/append an empty run
      if (!ready.empty() && ready.back().empties > 0)
        ++ready.back().empties;
      else
        ready.push_back(BinEntry{1, {}});
      ++pending_bins;
      ++cur_bin;
      return;
    }
    const int64_t fpx = (int64_t)roi_w * roi_h;
    if (hot_cap > 0) {
      for (int64_t p = 0; p < fpx; ++p)
        if (frame[p] > (uint32_t)hot_cap) frame[p] = (uint32_t)hot_cap;
      // Cumulative cap along substeps per input pixel: earliest kept.
      for (int p = 0; p < n_in; ++p) {
        int64_t acc = 0;
        for (int s = 0; s < substeps; ++s) {
          int32_t& v = raster[(int64_t)s * n_in + p];
          int64_t take = std::min<int64_t>(v, hot_cap - acc);
          if (take < 0) take = 0;
          v = (int32_t)take;
          acc += take;
        }
      }
    }
    BinEntry e;
    e.blob.resize(sizeof(uint32_t) * fpx +
                  sizeof(int32_t) * (int64_t)substeps * n_in);
    std::memcpy(e.blob.data(), frame.data(), sizeof(uint32_t) * fpx);
    std::memcpy(e.blob.data() + sizeof(uint32_t) * fpx, raster.data(),
                sizeof(int32_t) * (int64_t)substeps * n_in);
    ready.push_back(std::move(e));
    ++pending_bins;
    std::fill(frame.begin(), frame.end(), 0u);
    std::fill(raster.begin(), raster.end(), 0);
    cur_dirty = false;
    ++cur_bin;
  }
};

}  // namespace

extern "C" {

void* lens_stream_open(double timebin_s, int roi_x, int roi_y, int roi_w,
                       int roi_h, int hot_cap, int substeps,
                       const int32_t* lut, int n_in, int64_t max_gap_bins) {
  auto* s = new LensStream();
  s->timebin_s = timebin_s;
  s->roi_x = roi_x;
  s->roi_y = roi_y;
  s->roi_w = roi_w;
  s->roi_h = roi_h;
  s->hot_cap = hot_cap;
  s->substeps = substeps;
  s->n_in = n_in;
  s->max_gap_bins = max_gap_bins > 0 ? max_gap_bins : INT64_MAX;
  s->lut.assign(lut, lut + (int64_t)roi_w * roi_h);
  s->frame.assign((int64_t)roi_w * roi_h, 0u);
  s->raster.assign((int64_t)substeps * n_in, 0);
  return s;
}

// Feed a chunk of time-ordered events; out-of-ROI events are dropped, events
// older than the current bin (late arrivals) are dropped.
void lens_stream_feed(void* h, const double* t, const uint16_t* x,
                      const uint16_t* y, int64_t n) {
  auto* s = (LensStream*)h;
  std::lock_guard<std::mutex> lock(s->mu);
  for (int64_t i = 0; i < n; ++i) {
    const int xr = (int)x[i] - s->roi_x;
    const int yr = (int)y[i] - s->roi_y;
    if (xr < 0 || xr >= s->roi_w || yr < 0 || yr >= s->roi_h) continue;
    if (s->t0 < 0) s->t0 = t[i];
    // t0-poisoning guard: if the FIRST in-ROI line was corrupt far-future,
    // every real event would compute b < 0 and be dropped as "late" for the
    // stream's whole lifetime.  While no bin has been emitted yet, an event
    // earlier than t0 by a CORRUPTION-SCALE margin (the same max_gap_bins
    // window the forward guard uses — ordinary start-of-stream millisecond
    // jitter must NOT discard bin 0's accumulated events) rebases the clock
    // to it; after the first emitted bin the history is fixed and the
    // late-event rule holds.
    if (s->cur_bin == 0 && s->pending_bins == 0 && s->ready.empty() &&
        s->t0 - t[i] > (double)s->max_gap_bins * s->timebin_s) {
      s->t0 = t[i];
      std::fill(s->frame.begin(), s->frame.end(), 0u);
      std::fill(s->raster.begin(), s->raster.end(), 0);
      s->cur_dirty = false;
    }
    s->any = true;
    int64_t b = (int64_t)std::floor((t[i] - s->t0) / s->timebin_s);
    // Corruption guards.  In-window = [cur_bin, cur_bin + max_gap_bins]:
    // late events (bin already emitted) and gap-far future events both
    // drop.  But if t0 itself was anchored by a corrupt line, EVERY
    // subsequent real event lands out-of-window (behind for a far-future
    // anchor, ahead for a far-past one) and the stream would emit nothing
    // forever — a single stray corrupt line produces one drop, a poisoned
    // anchor an unbroken STREAK of them, so while no bin has been emitted
    // a long streak rebases the clock to the current event.
    const bool in_window =
        b >= s->cur_bin && b - s->cur_bin <= s->max_gap_bins;
    if (!in_window) {
      if (s->cur_bin == 0 && s->pending_bins == 0 && s->ready.empty() &&
          ++s->far_streak >= kFarStreakRebase) {
        s->t0 = t[i];
        std::fill(s->frame.begin(), s->frame.end(), 0u);
        std::fill(s->raster.begin(), s->raster.end(), 0);
        s->cur_dirty = false;
        s->far_streak = 0;
        b = 0;
      } else {
        continue;
      }
    } else {
      s->far_streak = 0;  // an in-window event: the anchor is sane
    }
    while (s->cur_bin < b) s->close_bin_locked();
    s->cur_dirty = true;
    s->frame[(int64_t)yr * s->roi_w + xr] += 1;
    const int32_t pix = s->lut[(int64_t)yr * s->roi_w + xr];
    if (pix >= 0) {
      const double t_rel = t[i] - s->t0 - (double)b * s->timebin_s;
      int64_t sub = (int64_t)(t_rel / s->timebin_s * s->substeps);
      if (sub < 0) sub = 0;
      if (sub >= s->substeps) sub = s->substeps - 1;
      s->raster[sub * s->n_in + pix] += 1;
    }
  }
}

// Close the current (partial) bin — call at end-of-stream so the final bin
// is emitted, mirroring the offline path which emits through bins.max().
void lens_stream_flush(void* h) {
  auto* s = (LensStream*)h;
  std::lock_guard<std::mutex> lock(s->mu);
  if (s->any) s->close_bin_locked();
  // Idempotent: a defensive second flush (e.g. a finally block after the
  // normal end-of-stream flush) must not emit a spurious empty bin.
  s->any = false;
}

int64_t lens_stream_pending(void* h) {
  auto* s = (LensStream*)h;
  std::lock_guard<std::mutex> lock(s->mu);
  return s->pending_bins;
}

// Pop one complete bin into frame_out (roi_h*roi_w u32) and raster_out
// (substeps*n_in i32).  Returns 1 if a bin was emitted, 0 if none pending.
// Empty bins (stored as run counters) are synthesized as zeros here.
int lens_stream_poll(void* h, uint32_t* frame_out, int32_t* raster_out) {
  auto* s = (LensStream*)h;
  std::lock_guard<std::mutex> lock(s->mu);
  if (s->ready.empty()) return 0;
  const int64_t fpx = (int64_t)s->roi_w * s->roi_h;
  const int64_t rsz = (int64_t)s->substeps * s->n_in;
  BinEntry& e = s->ready.front();
  if (e.empties > 0) {
    std::memset(frame_out, 0, sizeof(uint32_t) * fpx);
    std::memset(raster_out, 0, sizeof(int32_t) * rsz);
    if (--e.empties == 0) s->ready.pop_front();
  } else {
    std::memcpy(frame_out, e.blob.data(), sizeof(uint32_t) * fpx);
    std::memcpy(raster_out, e.blob.data() + sizeof(uint32_t) * fpx,
                sizeof(int32_t) * rsz);
    s->ready.pop_front();
  }
  --s->pending_bins;
  return 1;
}

void lens_stream_close(void* h) { delete (LensStream*)h; }

}  // extern "C"
