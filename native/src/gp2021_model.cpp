// Bit-accurate integer correlator channel model (hardware golden model).
//
// Behavioral re-derivation of the hardware-correlator semantics the
// reference implements three times — the GP2021 software simulator
// (osgnss_next_step/src/correlator/correlator.c:148-316), the namuru RTL
// tracking channel (rtl/tracking_channel.v: carrier NCO + mixers + code
// NCO + code gen + 6 accumulators), and the ARM firmware's view of it —
// kept sample-serial and integer-exact on purpose: it is the framework's
// cross-implementation test oracle (SURVEY.md §4.4), used to validate the
// JAX engine's uint32 NCO phase bookkeeping and accumulator semantics.
//
// Conventions:
//   * carrier NCO: uint32 phase accumulator; LO from the top 3 phase bits
//     through an 8-phase quantized sin/cos table (levels +-1/+-2, the
//     sign/mag LO style of correlator.c:203-204 / rtl/carrier_nco.v);
//   * code NCO: uint32 accumulator; each wrap = one half-chip tick
//     (rtl/code_nco.v half-chip enable);
//   * E/P/L from a half-chip delay line over the +-1 code
//     (rtl/code_gen.v early/prompt/late phases);
//   * six int64 accumulators, dumped at each prompt code-period epoch;
//     ms epoch counter 0..epochs_per_bit-1 (rtl/epoch_counter.v).

#include <cstdint>

namespace {

// 8-phase quantized LO (one period of cos/sin at levels +-1, +-2).
constexpr int32_t kCos8[8] = {2, 1, -1, -2, -2, -1, 1, 2};
constexpr int32_t kSin8[8] = {1, 2, 2, 1, -1, -2, -2, -1};

}  // namespace

extern "C" {

struct Gp2021State {
  uint32_t carr_phase;
  uint32_t code_phase;     // sub-half-chip accumulator
  int32_t half_chip;       // 0 .. 2*code_len-1, prompt tap position
  int64_t acc[6];          // IE, QE, IP, QP, IL, QL (running)
  int32_t epoch_ms;        // code periods since bit epoch
};

// Process n complex int8 samples through one tracking channel.
// code: +-1 chips [code_len]. Dumps: on each prompt code-period wrap the
// six accumulators are written to dumps[6*k] (k-th dump) and cleared.
// Returns the number of dumps produced.
int gp2021_run(Gp2021State* st, const int8_t* code, int32_t code_len,
               const int8_t* iq, int64_t n, uint32_t carr_step,
               uint32_t code_step, int32_t epochs_per_bit,
               int64_t* dumps, int32_t max_dumps) {
  int dumps_out = 0;
  int32_t two_len = 2 * code_len;
  for (int64_t i = 0; i < n; ++i) {
    // Carrier mixer: x * conj(LO), integer.
    uint32_t ph = st->carr_phase >> 29;          // top 3 bits
    int32_t c = kCos8[ph], s = kSin8[ph];
    int32_t xi = iq[2 * i], xq = iq[2 * i + 1];
    int32_t bi = xi * c + xq * s;
    int32_t bq = xq * c - xi * s;
    st->carr_phase += carr_step;

    // E/P/L taps from the half-chip position: early leads prompt by one
    // half-chip, late lags by one.
    int32_t hc_p = st->half_chip;
    int32_t hc_e = hc_p + 1 == two_len ? 0 : hc_p + 1;
    int32_t hc_l = hc_p == 0 ? two_len - 1 : hc_p - 1;
    int32_t ce = code[hc_e >> 1];
    int32_t cp = code[hc_p >> 1];
    int32_t cl = code[hc_l >> 1];
    st->acc[0] += ce * bi;
    st->acc[1] += ce * bq;
    st->acc[2] += cp * bi;
    st->acc[3] += cp * bq;
    st->acc[4] += cl * bi;
    st->acc[5] += cl * bq;

    // Code NCO: each wrap advances one half-chip.
    uint32_t before = st->code_phase;
    st->code_phase += code_step;
    if (st->code_phase < before) {               // u32 wrap = tick
      ++st->half_chip;
      if (st->half_chip == two_len) {
        st->half_chip = 0;
        // Prompt epoch: dump and clear (accumulate-and-dump,
        // rtl/accumulator.v).
        if (dumps_out < max_dumps) {
          for (int k = 0; k < 6; ++k) dumps[6 * dumps_out + k] = st->acc[k];
          ++dumps_out;
        }
        for (int k = 0; k < 6; ++k) st->acc[k] = 0;
        st->epoch_ms = (st->epoch_ms + 1) % epochs_per_bit;
      }
    }
  }
  return dumps_out;
}

}  // extern "C"
