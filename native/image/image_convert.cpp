// Native image conversion: float [-1,1] tensors -> RGB8.
//
// The reference does its tensor<->image conversion natively with
// Accelerate/vImage (CGImage+vImage.swift:23-131); this is the TPU
// framework's native equivalent for the serving path, where per-image host
// postprocessing (denormalize + clamp + quantize) otherwise runs in Python.
// Compiled with -O3 -march=native; auto-vectorizes cleanly.

#include <cstdint>
#include <cstddef>

extern "C" {

// x: n floats in [-1, 1] (any layout); out: n bytes.
// out = round(clamp(x/2 + 0.5, 0, 1) * 255)
void sdtpu_denormalize_to_uint8(const float* x, uint8_t* out, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    float v = x[i] * 0.5f + 0.5f;
    v = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
    out[i] = static_cast<uint8_t>(v * 255.0f + 0.5f);
  }
}

// uint8 RGB -> float in [lo, hi] (img2img / controlnet ingestion,
// reference CGImage+vImage.swift:67-131)
void sdtpu_uint8_to_float(const uint8_t* x, float* out, size_t n, float lo,
                          float hi) {
  const float scale = (hi - lo) / 255.0f;
  for (size_t i = 0; i < n; ++i) {
    out[i] = x[i] * scale + lo;
  }
}

}  // extern "C"
