// Golden-vector generator: evaluates the reference rotated-IoU kernel
// (read-only include from /root/reference) on boxes read from stdin and
// prints IoU values. Used only by tools/make_goldens.py to produce
// tests/goldens/*.npz — the kernel itself is NOT part of this framework.
//
// stdin:  N, then N lines of "x1 y1 w1 h1 a1 x2 y2 w2 h2 a2"
// stdout: N lines of IoU (float, 9 digits)

#include <cstdio>

#include "box_iou_rotated/box_iou_rotated_utils.h"

int main() {
  int n;
  if (std::scanf("%d", &n) != 1) return 1;
  for (int i = 0; i < n; ++i) {
    double b1[5], b2[5];
    for (int j = 0; j < 5; ++j) std::scanf("%lf", &b1[j]);
    for (int j = 0; j < 5; ++j) std::scanf("%lf", &b2[j]);
    double iou = detectron2::single_box_iou_rotated<double>(b1, b2);
    std::printf("%.9f\n", iou);
  }
  return 0;
}
