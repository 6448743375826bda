// Serving-scheduler core: batch-formation policy for the cross-request
// batching server (stablediffusioneo_tpu/serving/).
//
// Role in the framework: the reference runs one request at a time
// (canny2image_TRT.py process()); a production TPU deployment instead wants
// requests with compatible compiled-engine signatures (same resolution
// bucket / steps / sampler / guess-mode) gathered into one batched engine
// call. This library is the native decision core for that gathering:
// given queue ages and the allowed batch buckets it decides WHEN to cut a
// batch and HOW LARGE, and which compatibility group to serve first.
// The Python layer (serving/scheduler.py) mirrors every function 1:1 as a
// fallback and the test suite asserts equivalence.
//
// Build: make -C native  (produces build/libsdeo_sched.so)

#include <cstdint>

extern "C" {

// Decide how many requests to dispatch from one compatibility group.
//
// ages_ms:  per-request waiting times, oldest first (ages_ms[0] = max).
// n:        queue length (may exceed max_batch).
// buckets:  allowed batch sizes, ascending (engines compile per size).
// nb:       number of buckets.
// max_batch: largest admissible batch (usually buckets[nb-1]).
// max_wait_ms: batching window — the oldest request never waits longer
//           than this once the group could be dispatched.
//
// Returns 0 (keep accumulating) or a bucket size to dispatch now.
// Policy: dispatch at the largest bucket the queue can fill; before the
// window expires, hold out for a bigger bucket (throughput); once the
// oldest request's window is spent, cut at the largest fillable bucket
// (latency bound).
int sdeo_decide_cut(const double* ages_ms, int n, const int* buckets, int nb,
                    int max_batch, double max_wait_ms) {
  if (n <= 0 || nb <= 0) return 0;
  int best = 0;  // largest bucket <= min(n, max_batch)
  for (int i = 0; i < nb; ++i) {
    if (buckets[i] <= n && buckets[i] <= max_batch && buckets[i] > best)
      best = buckets[i];
  }
  if (best == 0) {
    // queue smaller than the smallest bucket: nothing dispatchable yet
    return 0;
  }
  if (best >= max_batch) {
    // the largest engine is full — waiting cannot improve this batch
    return best;
  }
  // the batch could still grow (new arrivals raise n) — hold while the
  // oldest request's window lasts
  return ages_ms[0] >= max_wait_ms ? best : 0;
}

// Pick which compatibility group to serve next (oldest-request-first:
// starvation-free across groups). oldest_ages[k] is the age of group k's
// oldest request (<0 when the group is empty). Returns the group index or
// -1 when all are empty.
int sdeo_pick_group(const double* oldest_ages, int nkeys) {
  int best = -1;
  double best_age = -1.0;
  for (int k = 0; k < nkeys; ++k) {
    if (oldest_ages[k] >= 0.0 && oldest_ages[k] > best_age) {
      best_age = oldest_ages[k];
      best = k;
    }
  }
  return best;
}

// Millisecond deadline until the scheduler must re-evaluate a group even if
// nothing arrives (the remaining batching window of the oldest request).
// Returns a non-negative wait in ms, or -1 for "no deadline" (empty group).
double sdeo_next_deadline_ms(const double* ages_ms, int n,
                             double max_wait_ms) {
  if (n <= 0) return -1.0;
  double remain = max_wait_ms - ages_ms[0];
  return remain > 0.0 ? remain : 0.0;
}

}  // extern "C"
