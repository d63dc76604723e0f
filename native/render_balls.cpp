// Z-buffered ball-splat point-cloud renderer (C ABI).
//
// Native equivalent of the reference's visualizer/render_balls_so.cpp
// component (SURVEY.md §2.1 last row): splats each point as a shaded
// disk with depth testing.  Offline (renders into a caller-provided
// RGB float buffer); the interactive window of the original is replaced
// by PNG export in mm3d_tpu/utils/visualizer.py (no display server).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// pts: [n,3] view-space coordinates (x right, y down, z depth>0 into
// the screen); colors: [n,3] in [0,1]; img: [h,w,3] float RGB
// (overwritten); radius: ball radius in pixels at depth `ref_depth`.
void mm3d_render_balls(const float* pts, const float* colors, int64_t n,
                       float* img, int64_t h, int64_t w, float focal,
                       float radius, float bg) {
  std::vector<float> zbuf(h * w, 1e30f);
  for (int64_t i = 0; i < h * w * 3; ++i) img[i] = bg;

  for (int64_t i = 0; i < n; ++i) {
    float x = pts[i * 3 + 0], y = pts[i * 3 + 1], z = pts[i * 3 + 2];
    if (z <= 1e-6f) continue;
    float u = focal * x / z + w * 0.5f;
    float v = focal * y / z + h * 0.5f;
    float r = std::max(1.0f, focal * radius / z);
    int u0 = (int)std::floor(u - r), u1 = (int)std::ceil(u + r);
    int v0 = (int)std::floor(v - r), v1 = (int)std::ceil(v + r);
    u0 = std::max(u0, 0); v0 = std::max(v0, 0);
    u1 = std::min(u1, (int)w - 1); v1 = std::min(v1, (int)h - 1);
    for (int py = v0; py <= v1; ++py) {
      for (int px = u0; px <= u1; ++px) {
        float dx = px - u, dy = py - v;
        float d2 = dx * dx + dy * dy;
        if (d2 > r * r) continue;
        // sphere shading: depth bulges toward the viewer at the center
        float bulge = std::sqrt(std::max(0.0f, r * r - d2)) / r;
        float zd = z - bulge * radius;
        int64_t pix = py * w + px;
        if (zd < zbuf[pix]) {
          zbuf[pix] = zd;
          float shade = 0.35f + 0.65f * bulge;  // lambertian-ish
          img[pix * 3 + 0] = colors[i * 3 + 0] * shade;
          img[pix * 3 + 1] = colors[i * 3 + 1] * shade;
          img[pix * 3 + 2] = colors[i * 3 + 2] * shade;
        }
      }
    }
  }
}

}  // extern "C"
