// Native host runtime: event buffering, packetization, and frame-queue
// bookkeeping for the TPU odometry pipeline.
//
// The reference keeps this layer OUTSIDE the library (the Rock/orogen task
// owns the dataflow loop — buffering of events/images and packet formation;
// SURVEY §0 L7). Here it is part of the framework, in C++ because it is the
// one genuinely serial, latency-sensitive host path: millions of events/s
// must be ingested, validated (monotonic timestamps — the reference throws
// on violations, src/tracking/EventFrame.cpp:204-208), sliced into
// fixed-capacity packets, and padded into the static-shape arrays the jitted
// kernels consume. Doing this in numpy costs several copies per packet; this
// C ABI does it in one pass, and the Python side (slam_eds_tpu/io/
// event_buffer.py) binds it with ctypes (no pybind11 in the image).
//
// Threading model: single-producer single-consumer ring buffer with atomic
// head/tail — the producer (sensor/dataset reader thread) pushes batches,
// the consumer (pipeline loop) drains packets. No locks on the hot path.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Event {
  float x;
  float y;
  double t;
  float p;
};

class EventRing {
 public:
  explicit EventRing(int64_t capacity)
      : buf_(static_cast<size_t>(capacity)), cap_(capacity), head_(0),
        tail_(0), dropped_(0), last_t_(-1.0), nonmono_(0) {}

  // Push a batch; returns number accepted. Events with non-monotonic
  // timestamps are counted and their time clamped (the reference hard-throws;
  // a production runtime must survive sensor glitches, so we repair + count).
  int64_t push(const float* xs, const float* ys, const double* ts,
               const float* ps, int64_t n) {
    int64_t accepted = 0;
    int64_t head = head_.load(std::memory_order_relaxed);
    const int64_t tail = tail_.load(std::memory_order_acquire);
    for (int64_t i = 0; i < n; ++i) {
      if (head - tail >= cap_) {  // full: drop oldest-first policy = reject
        dropped_ += n - i;
        break;
      }
      double t = ts[i];
      if (t < last_t_) {
        ++nonmono_;
        t = last_t_;
      }
      last_t_ = t;
      Event& e = buf_[static_cast<size_t>(head % cap_)];
      e.x = xs[i];
      e.y = ys[i];
      e.t = t;
      e.p = ps[i];
      ++head;
      ++accepted;
    }
    head_.store(head, std::memory_order_release);
    return accepted;
  }

  int64_t size() const {
    return head_.load(std::memory_order_acquire) -
           tail_.load(std::memory_order_acquire);
  }

  // Drain up to `count` events into fixed-capacity output arrays of length
  // `capacity`, padding the remainder by repeating the last event with zero
  // polarity (zero-weight in the raster kernels). Returns n_valid. Output
  // timestamps are float64 seconds; also writes the median event time (the
  // packet timestamp, reference EventFrame.cpp:210-212).
  int64_t pop_packet(int64_t count, int64_t capacity, float* xs, float* ys,
                     double* ts, float* ps, double* median_t) {
    int64_t tail = tail_.load(std::memory_order_relaxed);
    const int64_t head = head_.load(std::memory_order_acquire);
    const int64_t n = std::min({count, head - tail, capacity});
    for (int64_t i = 0; i < n; ++i) {
      const Event& e = buf_[static_cast<size_t>((tail + i) % cap_)];
      xs[i] = e.x;
      ys[i] = e.y;
      ts[i] = e.t;
      ps[i] = e.p;
    }
    tail_.store(tail + n, std::memory_order_release);
    if (n > 0) {
      for (int64_t i = n; i < capacity; ++i) {
        xs[i] = xs[n - 1];
        ys[i] = ys[n - 1];
        ts[i] = ts[n - 1];
        ps[i] = 0.0f;
      }
      *median_t = ts[n / 2];
    } else {
      *median_t = 0.0;
    }
    return n;
  }

  // Same but slicing by time: all events with t < t_end (e.g. "events up to
  // the next frame" packetization the driver task performs).
  int64_t pop_until(double t_end, int64_t capacity, float* xs, float* ys,
                    double* ts, float* ps, double* median_t) {
    int64_t tail = tail_.load(std::memory_order_relaxed);
    const int64_t head = head_.load(std::memory_order_acquire);
    int64_t n = 0;
    while (n < capacity && tail + n < head) {
      const Event& e = buf_[static_cast<size_t>((tail + n) % cap_)];
      if (e.t >= t_end) break;
      xs[n] = e.x;
      ys[n] = e.y;
      ts[n] = e.t;
      ps[n] = e.p;
      ++n;
    }
    tail_.store(tail + n, std::memory_order_release);
    if (n > 0) {
      for (int64_t i = n; i < capacity; ++i) {
        xs[i] = xs[n - 1];
        ys[i] = ys[n - 1];
        ts[i] = ts[n - 1];
        ps[i] = 0.0f;
      }
      *median_t = ts[n / 2];
    } else {
      *median_t = 0.0;
    }
    return n;
  }

  int64_t dropped() const { return dropped_; }
  int64_t nonmonotonic() const { return nonmono_; }

 private:
  std::vector<Event> buf_;
  const int64_t cap_;
  std::atomic<int64_t> head_;
  std::atomic<int64_t> tail_;
  int64_t dropped_;
  double last_t_;
  int64_t nonmono_;
};

}  // namespace

extern "C" {

void* event_ring_create(int64_t capacity) { return new EventRing(capacity); }

void event_ring_destroy(void* ring) { delete static_cast<EventRing*>(ring); }

int64_t event_ring_push(void* ring, const float* xs, const float* ys,
                        const double* ts, const float* ps, int64_t n) {
  return static_cast<EventRing*>(ring)->push(xs, ys, ts, ps, n);
}

int64_t event_ring_size(void* ring) {
  return static_cast<EventRing*>(ring)->size();
}

int64_t event_ring_pop_packet(void* ring, int64_t count, int64_t capacity,
                              float* xs, float* ys, double* ts, float* ps,
                              double* median_t) {
  return static_cast<EventRing*>(ring)->pop_packet(count, capacity, xs, ys, ts,
                                                   ps, median_t);
}

int64_t event_ring_pop_until(void* ring, double t_end, int64_t capacity,
                             float* xs, float* ys, double* ts, float* ps,
                             double* median_t) {
  return static_cast<EventRing*>(ring)->pop_until(t_end, capacity, xs, ys, ts,
                                                  ps, median_t);
}

int64_t event_ring_dropped(void* ring) {
  return static_cast<EventRing*>(ring)->dropped();
}

int64_t event_ring_nonmonotonic(void* ring) {
  return static_cast<EventRing*>(ring)->nonmonotonic();
}

}  // extern "C"
