// fclrt: native host runtime for fcl_taco2_tpu.
//
// The per-batch host work on the training hot path is building the phoneme
// regroup plan (ops/regroup.py build_plan): scanning durations, computing
// segment tables, and producing the utterance-frame gather index map.  The
// reference does the equivalent with per-phoneme Python loops
// (/root/reference/tts.py:243-263); our numpy version is vectorized, and
// this C++ implementation removes the remaining interpreter overhead and
// temporary allocations for production-scale loaders (it is O(total
// frames) with exactly one pass per output table).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>

extern "C" {

// Build the segment tables + inverse frame map for one batch.
//
// Inputs:
//   durations : [B * Tmax] int32, frames per token (0 = skip/pad)
//   B, Tmax   : batch / token-axis sizes
//   max_dur   : D, static per-segment frame budget
//   P         : padded segment capacity (out tables sized to P)
//   max_olen  : Lmax, padded utterance frame capacity
// Outputs (caller-allocated):
//   seg_utt   [P], seg_tok [P], seg_start [P], seg_dur [P]  int32
//   frame_mask [P * max_dur]  uint8 (1 where d < seg_dur)
//   position   [P * max_dur]  float32 (d / dur ramps)
//   utt_gather [B * max_olen] int32 (flat index into P*D phoneme frames)
//   utt_mask   [B * max_olen] uint8 (1 at valid frames)
// Returns: number of real segments, or -1 if P / max_dur is exceeded.
int32_t fclrt_build_plan(
    const int32_t* durations, int32_t B, int32_t Tmax, int32_t max_dur,
    int32_t P, int32_t max_olen,
    int32_t* seg_utt, int32_t* seg_tok, int32_t* seg_start,
    int32_t* seg_dur, uint8_t* frame_mask, float* position,
    int32_t* utt_gather, uint8_t* utt_mask) {
  const int32_t D = max_dur;
  std::memset(seg_utt, 0, sizeof(int32_t) * P);
  std::memset(seg_tok, 0, sizeof(int32_t) * P);
  std::memset(seg_start, 0, sizeof(int32_t) * P);
  std::memset(seg_dur, 0, sizeof(int32_t) * P);
  std::memset(frame_mask, 0, sizeof(uint8_t) * P * D);
  std::memset(position, 0, sizeof(float) * P * D);
  std::memset(utt_gather, 0, sizeof(int32_t) * B * max_olen);
  std::memset(utt_mask, 0, sizeof(uint8_t) * B * max_olen);

  int32_t seg = 0;
  for (int32_t b = 0; b < B; ++b) {
    int32_t frame = 0;  // cumulative frame position within utterance b
    const int32_t* durs_b = durations + (int64_t)b * Tmax;
    for (int32_t t = 0; t < Tmax; ++t) {
      const int32_t d = durs_b[t];
      if (d <= 0) continue;
      if (d > D || seg >= P || frame + d > max_olen) return -1;
      seg_utt[seg] = b;
      seg_tok[seg] = t;
      seg_start[seg] = frame;
      seg_dur[seg] = d;
      uint8_t* fm = frame_mask + (int64_t)seg * D;
      float* pos = position + (int64_t)seg * D;
      int32_t* gather = utt_gather + (int64_t)b * max_olen + frame;
      uint8_t* mask = utt_mask + (int64_t)b * max_olen + frame;
      const int32_t base = seg * D;
      for (int32_t k = 0; k < d; ++k) {
        fm[k] = 1;
        // divide (not multiply by reciprocal): bit-exact with the numpy
        // reference implementation in ops/regroup.py
        pos[k] = (float)((double)k / (double)d);
        gather[k] = base + k;
        mask[k] = 1;
      }
      frame += d;
      ++seg;
    }
  }
  return seg;
}

}  // extern "C"
