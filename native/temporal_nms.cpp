// 1-D temporal NMS for action-localization proposals.
//
// Native counterpart of the reference's nms_cpu
// (InternVideo1/Downstream/Temporal-Action-Localization/libs/utils/csrc/
// nms_cpu.cpp): sequential suppression over score-sorted [start, end)
// segments, with both hard suppression and soft-NMS (linear / gaussian
// decay). Sequential data-dependent control flow belongs on the host, not
// in XLA — exposed through ctypes (see internvideo_tpu/ops/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

// segs: (n, 2) [start, end]; scores: (n,)
// keep_out: (n,) indices of kept segments; returns number kept.
int temporal_nms(const float* segs, const float* scores, int n,
                 float iou_threshold, int max_keep, int* keep_out) {
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return scores[a] > scores[b]; });
  std::vector<char> suppressed(n, 0);
  int kept = 0;
  for (int oi = 0; oi < n && kept < max_keep; ++oi) {
    int i = order[oi];
    if (suppressed[i]) continue;
    keep_out[kept++] = i;
    float s1 = segs[2 * i], e1 = segs[2 * i + 1];
    float len1 = e1 - s1;
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (suppressed[j]) continue;
      float s2 = segs[2 * j], e2 = segs[2 * j + 1];
      float inter = std::max(0.f, std::min(e1, e2) - std::max(s1, s2));
      float uni = len1 + (e2 - s2) - inter;
      if (uni > 0.f && inter / uni > iou_threshold) suppressed[j] = 1;
    }
  }
  return kept;
}

// Soft-NMS: decays scores instead of suppressing; writes decayed scores.
// method: 0 = linear, 1 = gaussian(sigma).
int soft_temporal_nms(const float* segs, const float* scores_in, int n,
                      float iou_threshold, float sigma, float min_score,
                      int method, float* scores_out, int* order_out) {
  std::vector<float> s(scores_in, scores_in + n);
  std::vector<char> done(n, 0);
  int count = 0;
  for (int step = 0; step < n; ++step) {
    int best = -1;
    float best_s = min_score;
    for (int i = 0; i < n; ++i)
      if (!done[i] && s[i] > best_s) { best = i; best_s = s[i]; }
    if (best < 0) break;
    done[best] = 1;
    order_out[count] = best;
    scores_out[count] = s[best];
    ++count;
    float s1 = segs[2 * best], e1 = segs[2 * best + 1];
    float len1 = e1 - s1;
    for (int j = 0; j < n; ++j) {
      if (done[j]) continue;
      float s2 = segs[2 * j], e2 = segs[2 * j + 1];
      float inter = std::max(0.f, std::min(e1, e2) - std::max(s1, s2));
      float uni = len1 + (e2 - s2) - inter;
      float iou = uni > 0.f ? inter / uni : 0.f;
      if (method == 1) {
        s[j] *= std::exp(-iou * iou / sigma);
      } else if (iou > iou_threshold) {
        s[j] *= (1.f - iou);
      }
    }
  }
  return count;
}

}  // extern "C"
