// Native host bitstream codec for the lc3jax framework.
//
// The bit-serial ends of LC3 — side-info parsing, the arithmetic (range)
// codec and MPVQ (de)enumeration — are inherently sequential per frame and
// run on host (SURVEY.md section 7.1). This C++ implementation replaces the
// Python reference path on the hot serving path; it produces/consumes the
// same fixed-shape tensors the batched TPU kernels exchange
// (lc3jax/dsp/decoder.py ParsedFrames, lc3jax/dsp/encoder.py fields).
//
// Parity: mirrors the semantics of the reference implementation
// (decoder/side_info_reader.rs, decoder/arithmetic_codec.rs,
// encoder/bitstream_encoding.rs) as re-derived in lc3jax/ref; validated
// bit-exactly against it in tests/test_native_bitstream.py.
//
// Build: see native/build.sh (plain g++, no external deps). Exposed via
// ctypes (lc3jax/coding/native.py). Batch entry points fan out over a
// thread pool: streams are independent.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

#if defined(LC3_SPEC_SIMD) && defined(__AVX512F__)
#include <immintrin.h>
#endif

namespace {

// ----------------------------------------------------------- spec tables
// Filled in from Python at init (they live in lc3jax/data/tables.npz; the
// library stays data-free).
static int16_t g_ac_spec_freq[64][17];
static int16_t g_ac_spec_cumfreq[64][17];
static uint8_t g_ac_spec_lookup[4096];
static int16_t g_ac_tns_order_freq[2][8];
static int16_t g_ac_tns_order_cumfreq[2][8];
static int16_t g_ac_tns_coef_freq[8][17];
static int16_t g_ac_tns_coef_cumfreq[8][17];
static int32_t g_mpvq_offsets[16][11];
// Reciprocal table for the range-decoder quotient: ceil(2^38 / d), one
// u64 per possible tmp = range >> 10 in [1, 2^14). 128 KB (L2); an
// L1-resident 32 KB normalized variant (clz-shift both operands into
// [2^13, 2^14)) measured 4-6% SLOWER in interleaved A/B on the bench
// host (tools/host_parse_ab.py) — with two lock-step lanes the OoO
// window hides the L2 load, while the clz+shift chain lengthens the
// serial dependency it was meant to cut.
static uint64_t g_recip14[16384];
// quotient -> fused spectral-model entry (256 KB, L2-resident), indexed by
// q = floor(low/tmp) (exact: the per-symbol multiply walk-down of
// reference arithmetic_codec.rs:81-84 satisfies tmp*cumfreq[val] <= low
// iff cumfreq[val] <= q). Each entry packs val (5b) | cumfreq[val] (10b)
// | freq[val] (11b) in one uint32, so the serial decode chain pays a
// single dependent load after the quotient.
static uint32_t g_spec_ent[64][1024];
// Per-page cumfreq[1..16] widened to u32 for the AVX-512 multiply-compare
// symbol search (LC3_SPEC_SIMD): val = popcount(tmp*cumfreq[1..16] <= low)
// — the comparison IS the division, so the serial chain carries no table
// load at all (this 4 KB table is pki-indexed, known one symbol early).
alignas(64) static uint32_t g_spec_cf32[64][16];

static inline uint32_t quot10(uint32_t low, uint32_t tmp) {
#ifdef LC3_DIV_FLOAT
  // A/B variant: double division instead of the reciprocal-table load.
  // Exact: low < 2^24 and tmp in [2^6, 2^14) are both exact doubles; when
  // tmp divides low the quotient is an exact double, otherwise the true
  // quotient sits >= 1/tmp >= 2^-14 away from any integer, far beyond the
  // 2^-53-relative rounding of the correctly-rounded divide, so truncation
  // can never cross an integer boundary. Trades the L2 table load on the
  // serial chain for the FP divider (~14 cycle latency, no memory traffic).
  return uint32_t(double(low) / double(tmp));
#else
  return uint32_t((uint64_t(low) * g_recip14[tmp]) >> 38);
#endif
}

struct Reader {
  const uint8_t* buf;
  int len;
  int head = 0;       // byte cursor from the front
  int tail_bits = 0;  // bit cursor from the back
  bool error = false;

  int head_byte() {
    if (head >= len) { error = true; return 0; }
    return buf[head++];
  }
  uint32_t head_u24() {
    if (head + 2 >= len) { error = true; return 0; }
    uint32_t v = (uint32_t(buf[head]) << 16) | (uint32_t(buf[head + 1]) << 8) |
                 buf[head + 2];
    head += 3;
    return v;
  }
  uint32_t tail_uint(int nbits) {
    int byte_index = tail_bits / 8;
    int bit_index = tail_bits % 8;
    int bits_left = 8 - bit_index;
    int add_bytes = (nbits > bits_left && nbits < 8) ? 2 : 1;
    int nbytes = nbits / 8 + add_bytes;
    if (len - head - byte_index - nbytes < 0) { error = true; return 0; }
    int start = len - byte_index - nbytes;
    uint64_t v = 0;
    for (int i = 0; i < nbytes; i++) v = (v << 8) | buf[start + i];
    v >>= bit_index;
    v &= (uint64_t(1) << nbits) - 1;
    tail_bits += nbits;
    return uint32_t(v);
  }
  bool tail_bool() {
    int byte_index = tail_bits / 8;
    int bit_index = tail_bits % 8;
    if (len - head - byte_index + 2 < 0) { error = true; return false; }
    uint8_t b = buf[len - byte_index - 1];
    tail_bits += 1;
    return (b >> bit_index) & 1;
  }
};

struct SideInfo {
  int bandwidth = 0;
  int lastnz = 0;
  bool lsb_mode = false;
  int gg_ind = 0;
  int num_tns_filters = 0;
  int rc_order[2] = {0, 0};
  // SNS VQ
  int ind_lf = 0, ind_hf = 0, ls_inda = 0, ls_indb = 0;
  int32_t idx_a = 0, idx_b = 0;
  int submode_lsb = 0, submode_msb = 0, g_ind = 0;
  // LTPF
  bool pitch_present = false, ltpf_active = false;
  int pitch_index = 0;
  int noise_factor = 0;
};

static int ceil_log2(int v) {
  int bits = 0;
  while ((1 << bits) < v) bits++;
  return bits;
}

static bool read_side_info(Reader& r, int fs_ind, int ne, SideInfo& si) {
  static const int kNbitsBw[5] = {0, 1, 2, 2, 3};
  int nbits_bw = kNbitsBw[fs_ind];
  if (nbits_bw > 0) {
    si.bandwidth = r.tail_uint(nbits_bw);
    if (fs_ind < si.bandwidth) return false;
  }
  int lastnz_bits = ceil_log2(ne / 2);
  si.lastnz = (int(r.tail_uint(lastnz_bits)) + 1) << 1;
  if (si.lastnz > ne) return false;
  si.lsb_mode = r.tail_bool();
  si.gg_ind = r.tail_uint(8);
  si.num_tns_filters = si.bandwidth < 3 ? 1 : 2;
  for (int f = 0; f < si.num_tns_filters; f++) si.rc_order[f] = r.tail_bool();
  si.pitch_present = r.tail_bool();

  // SNS VQ demux
  si.ind_lf = r.tail_uint(5);
  si.ind_hf = r.tail_uint(5);
  si.submode_msb = r.tail_bool();
  si.g_ind = r.tail_uint(si.submode_msb == 0 ? 1 : 2);
  si.ls_inda = r.tail_bool();
  if (si.submode_msb == 0) {
    uint32_t tmp = r.tail_uint(25);
    if (tmp >= 33460056u) return false;
    uint32_t idx_bor = tmp / 2390004u;
    si.idx_a = tmp - idx_bor * 2390004u;
    int32_t ib = int32_t(idx_bor) - 2;
    si.submode_lsb = ib < 0 ? 1 : 0;
    ib += si.submode_lsb * 2;
    if (si.submode_lsb != 0) {
      si.g_ind = (si.g_ind << 1) + ib;
    } else {
      si.idx_b = ib >> 1;
      si.ls_indb = ib & 1;
    }
  } else {
    uint32_t tmp = r.tail_uint(24);
    if (tmp >= 16708096u) return false;
    if (tmp >= 15158272u) {
      tmp -= 15158272u;
      si.submode_lsb = 1;
      si.g_ind = (si.g_ind << 1) + (tmp & 1);
      si.idx_a = tmp >> 1;
    } else {
      si.idx_a = tmp;
    }
  }

  if (si.pitch_present) {
    si.ltpf_active = r.tail_bool();
    si.pitch_index = r.tail_uint(9);
  }
  si.noise_factor = r.tail_uint(3);
  return !r.error;
}

struct RangeDec {
  uint32_t low, range;
  bool error = false;
  void init(Reader& r) {
    low = r.head_u24();
    range = 0x00ffffff;
  }
  int decode(Reader& r, const int16_t* cumfreq, const int16_t* freq, int n) {
    uint32_t tmp = range >> 10;
    if (low >= (tmp << 10)) { error = true; return 0; }
    uint32_t q = quot10(low, tmp);
    int val = n - 1;
    while (uint32_t(cumfreq[val]) > q) val--;
    low -= tmp * uint32_t(cumfreq[val]);
    range = tmp * uint32_t(freq[val]);
    while (range < 0x10000) {
      low = ((low << 8) & 0x00ffffff) + uint32_t(r.head_byte());
      range <<= 8;
    }
    return val;
  }
  // spectral-model fast path: branchless symbol search via the quotient LUT.
  // Requires r.buf to have >= 2 readable zero bytes past r.len (the batch
  // driver parses from a zero-padded copy), so the renormalisation can read
  // unconditionally: past-the-end bytes read as 0, exactly what head_byte()
  // returns once the error flag is set, and the flag itself is kept exact
  // (consuming byte index >= len marks the frame corrupt).
  int decode_spec(Reader& r, int pki) {
    uint32_t tmp = range >> 10;
    if (low >= (tmp << 10)) { error = true; return 0; }
    uint32_t e = g_spec_ent[pki][quot10(low, tmp)];
    int val = int(e & 31u);
    low -= tmp * ((e >> 5) & 1023u);
    range = tmp * (e >> 15);
    // branchless renorm: range >= 0x40 always (tmp >= 0x40, freq >= 1), so
    // at most 2 bytes are pulled per symbol
    uint32_t nb = uint32_t(range < 0x10000u) + uint32_t(range < 0x100u);
    uint32_t two = (uint32_t(r.buf[r.head]) << 8) | uint32_t(r.buf[r.head + 1]);
    uint32_t sh = 8u * nb;
    low = ((low << sh) & 0x00ffffffu) | ((two >> (16u - sh)) & ((1u << sh) - 1u));
    range <<= sh;
    r.head += int(nb);
    if (r.head > r.len) r.error = true;
    return val;
  }
};

static void mpvq_deenum(int dim, int k_val, int ls_ind, uint32_t ind,
                        int32_t* vec) {
  for (int i = 0; i < dim; i++) vec[i] = 0;
  int leading_sign = ls_ind == 0 ? 1 : -1;
  int k_max = k_val;
  for (int pos = 0; pos < dim; pos++) {
    const int32_t* row = g_mpvq_offsets[dim - 1 - pos];
    if (ind == 0) {
      vec[pos] = leading_sign < 0 ? -k_max : k_max;
      break;
    }
    int k_acc = k_max;
    while (ind < uint32_t(row[k_acc])) k_acc--;
    ind -= uint32_t(row[k_acc]);
    int k_delta = k_max - k_acc;
    if (k_delta != 0) {
      vec[pos] = leading_sign < 0 ? -k_delta : k_delta;
      leading_sign = (ind & 1) ? -1 : 1;
      ind >>= 1;
      k_max -= k_delta;
    }
  }
}

static int ilog2_floor(uint32_t v) {
  int r = -1;
  while (v) { v >>= 1; r++; }
  return r;
}

// Per-frame parse state, phase-split so the batch driver can interleave the
// spectral loops of several frames on one core. The spectral range decoder
// is a ~30-cycle serial dependency chain per symbol (recip multiply ->
// 64 KB LUT load -> low/range update); one frame alone leaves the core's
// out-of-order window mostly idle, so the driver steps G frames round-robin
// and their independent chains overlap (memory-level parallelism). Measured
// phase split before this restructure: spectral decode was ~92% of parse
// time. Semantics mirror the reference spectral_data.rs / arithmetic_codec.rs
// as re-derived in lc3jax/ref/bitstream.py; parity pinned by
// tests/test_native_bitstream.py and the on-device differential fuzz.
struct FrameCtx {
  Reader r;
  RangeDec st;
  SideInfo si;
  // spectral loop cursor (t/lev/xk/xk1 persist mid-pair state so the
  // multi-lane driver can park a lane between lock-step passes even when
  // it is inside an escape ladder)
  int k = 0, c = 0;
  int t = 0, lev = 0, xk = 0, xk1 = 0;
  int ne, nbits, rate_flag;
  int tns_order[2];
  int tns_idx[16];
  int32_t* x;
  int* save_lev;  // [ne] scratch, pooled by the driver
  bool bad = false;   // frame is corrupt (PLC)
  bool done = false;  // spectral loop finished (or failed)
  // zero-padded payload copy: lets the range decoder renorm read 2 bytes
  // unconditionally (max nbytes is 400 per the LC3 spec / api.py)
  uint8_t pad[408];
};

// Side info + TNS + range-decoder init. On any corruption marks the frame
// bad+done so the spectral/tail phases are skipped.
static void parse_head(FrameCtx& f, const uint8_t* buf, int nbytes, int fs_ind,
                       int ne, bool is_7p5ms) {
  std::memcpy(f.pad, buf, size_t(nbytes));
  std::memset(f.pad + nbytes, 0, 8);
  f.r = Reader{f.pad, nbytes};
  f.ne = ne;
  f.nbits = nbytes * 8;
  f.k = 0;
  f.c = 0;
  f.bad = false;
  f.done = false;
  f.si = SideInfo{};  // read_side_info writes some fields only conditionally
  if (!read_side_info(f.r, fs_ind, ne, f.si)) {
    f.bad = f.done = true;
    return;
  }
  f.st = RangeDec{};
  f.st.init(f.r);

  int max_bits = is_7p5ms ? 360 : 480;
  int lpcw = f.nbits < max_bits ? 1 : 0;
  f.tns_order[0] = f.si.rc_order[0];
  f.tns_order[1] = f.si.rc_order[1];
  for (int i = 0; i < 16; i++) f.tns_idx[i] = 0;
  for (int fi = 0; fi < f.si.num_tns_filters; fi++) {
    if (f.tns_order[fi] > 0) {
      int order = f.st.decode(f.r, g_ac_tns_order_cumfreq[lpcw],
                              g_ac_tns_order_freq[lpcw], 8);
      if (f.st.error || f.r.error) { f.bad = f.done = true; return; }
      f.tns_order[fi] = order + 1;
      for (int k = 0; k < f.tns_order[fi]; k++) {
        f.tns_idx[fi * 8 + k] = f.st.decode(f.r, g_ac_tns_coef_cumfreq[k],
                                            g_ac_tns_coef_freq[k], 17);
        if (f.st.error || f.r.error) { f.bad = f.done = true; return; }
      }
    }
  }
  f.rate_flag = f.nbits > (160 + fs_ind * 160) ? 512 : 0;
  // prime the first pair's cursor (k == 0, c == 0)
  f.t = f.c + f.rate_flag;
  f.lev = 0;
  f.xk = 0;
  f.xk1 = 0;
  if (f.si.lastnz <= 0) f.done = true;
}

// --- register-resident spectral loop ---------------------------------
// The spectral range decoder is a serial dependency chain per symbol
// (quotient multiply -> fused model-entry load -> low/range update). To
// overlap two frames' chains in the out-of-order window WITHOUT paying a
// per-step state round-trip through memory, the hot cursor lives in a
// small non-escaping struct (scalarised into registers by the compiler)
// for the whole loop. Control flow stays BRANCHY on purpose: the renorm
// and sign branches predict well on real content, so the core speculates
// past them, while cmov formulations were measured to lengthen the serial
// low->quotient->entry->low chain and lose ~25%. Error flags are sticky
// and checked once per pair (memory-safe post-error: padded payload copy,
// bounds-checked tail reads, bad frames' outputs are zeroed by the driver).
struct SpecHot {
  uint32_t low, range;
  int head, tail;
  bool st_err = false, rd_err = false;
  int c, k, lev, t;
  int xk, xk1;
  int pki;
  bool done;
};

static inline void hot_load(SpecHot& h, const FrameCtx& f) {
  h.low = f.st.low;
  h.range = f.st.range;
  h.head = f.r.head;
  h.tail = f.r.tail_bits;
  h.st_err = f.st.error;
  h.rd_err = f.r.error;
  h.c = f.c;
  h.k = f.k;
  h.t = f.t;
  h.lev = f.lev;
  h.xk = f.xk;
  h.xk1 = f.xk1;
  // pki is derivable from (t, lev): the ladder indexes the same table with
  // a min(lev, 3) page offset, and lev == 0 is the base page
  h.pki = g_ac_spec_lookup[h.t + std::min(h.lev, 3) * 1024];
  h.done = f.done;
}

static inline void hot_store(const SpecHot& h, FrameCtx& f) {
  f.st.low = h.low;
  f.st.range = h.range;
  f.st.error = h.st_err;
  f.r.head = h.head;
  f.r.tail_bits = h.tail;
  f.r.error = h.rd_err;
  f.c = h.c;
  f.k = h.k;
  f.t = h.t;
  f.lev = h.lev;
  f.xk = h.xk;
  f.xk1 = h.xk1;
  f.done = h.done;
}

// one spectral symbol; mirrors RangeDec::decode_spec on local state
static inline int hot_sym(SpecHot& h, const uint8_t* buf, int len) {
#if defined(LC3_SPEC_SIMD) && defined(__AVX512F__)
  // AVX-512 multiply-compare search: val = #{v in 1..16 : tmp*cumfreq[v]
  // <= low}, i.e. the walk-down of reference arithmetic_codec.rs:81-84
  // evaluated as one vector compare. cumfreq[0] == 0 always, and the
  // virtual cumfreq[17] == 1024 makes prods[17] = tmp << 10, so
  // low/range both update from one 8-byte load of adjacent products.
  // Replaces BOTH dependent L2 loads (g_recip14, g_spec_ent) of the LUT
  // path with register/L1 traffic; g_spec_cf32 is indexed by pki, which
  // is known one symbol ahead (off the serial chain).
  uint32_t tmp = h.range >> 10;
  uint32_t top = tmp << 10;
  if (h.low >= top) { h.st_err = true; return 0; }
  __m512i prod = _mm512_mullo_epi32(
      _mm512_set1_epi32(int(tmp)),
      _mm512_load_si512((const void*)g_spec_cf32[h.pki]));
  __mmask16 le = _mm512_cmp_epu32_mask(prod, _mm512_set1_epi32(int(h.low)),
                                       _MM_CMPINT_LE);
  int val = _mm_popcnt_u32(uint32_t(le));
  alignas(64) uint32_t parr[18];
  parr[0] = 0;
  _mm512_store_si512((void*)(parr + 1), prod);
  parr[17] = top;
  uint64_t two;  // prods[val] | prods[val+1] << 32 (monotonic, adjacent)
  std::memcpy(&two, reinterpret_cast<const char*>(parr) + 4 * val, 8);
  h.low -= uint32_t(two);
  h.range = uint32_t(two >> 32) - uint32_t(two);
#else
  uint32_t tmp = h.range >> 10;
  if (h.low >= (tmp << 10)) { h.st_err = true; return 0; }
  uint32_t e = g_spec_ent[h.pki][quot10(h.low, tmp)];
  int val = int(e & 31u);
  h.low -= tmp * ((e >> 5) & 1023u);
  h.range = tmp * (e >> 15);
#endif
  // speculative renorm: reads from the zero-padded copy (over-reads past
  // len behave exactly like head_byte()'s 0 return once the sticky error
  // below is set); the loop branch predicts well and keeps the byte feed
  // off the serial chain
  while (h.range < 0x10000u) {
    h.low = ((h.low << 8) & 0x00ffffffu) | uint32_t(buf[h.head++]);
    h.range <<= 8;
  }
  h.rd_err |= (h.head > len);
  return val;
}

// one tail (side) bit consume; mirrors Reader::tail_bool semantics.
// NOT windowed on purpose: a 64-bit shift-window variant (see TailWin,
// used in the single-lane residual phase) measured 6% SLOWER here — each
// windowed bit depends on the previous shift, while these per-bit loads
// are independent L1 hits the out-of-order core runs alongside the range
// decoder chain, and the extra window state spills registers at 2 lanes.
static inline int hot_tail(SpecHot& h, const uint8_t* buf, int len) {
  int byte_index = h.tail >> 3;
  int bit_index = h.tail & 7;
  bool oob = (len - h.head - byte_index + 2) < 0;
  h.rd_err |= oob;
  int idx = oob ? 0 : (len - byte_index - 1);
  int b = (buf[idx] >> bit_index) & 1;
  h.tail++;
  return oob ? 0 : b;
}

// conditional sign consume: when v > 0, read one tail bit and negate v if
// it is set (speculative: most lines are zero, the branch predicts well)
static inline void hot_sign(SpecHot& h, const uint8_t* buf, int len, int& v) {
  if (v > 0 && hot_tail(h, buf, len)) v = -v;
}

// bookkeeping after one symbol: advance the escape ladder or finish the
// k-pair; keeps h.pki primed for the next symbol. Exactly the reference
// ladder semantics (spectral_data.rs) incl. the lev==14 corner: the ladder
// exits with the escape symbol itself as (a, b).
static inline void hot_after_sym(SpecHot& h, FrameCtx& f, int sym,
                                 const uint8_t* buf, int len) {
  bool escape = (sym >= 16) & !h.st_err;
  if (escape) {
    if (!f.si.lsb_mode || h.lev > 0) {
      h.xk += hot_tail(h, buf, len) << h.lev;
      h.xk1 += hot_tail(h, buf, len) << h.lev;
    }
    h.lev++;
    if (h.lev < 14) {
      h.pki = g_ac_spec_lookup[h.t + std::min(h.lev, 3) * 1024];
      return;
    }
  }
  f.save_lev[h.k] = h.lev;  // scratch is per-frame: harmless when !lsb_mode
  int a = sym & 3, b = sym >> 2;
  int xk = h.xk + (a << h.lev), xk1 = h.xk1 + (b << h.lev);
  hot_sign(h, buf, len, xk);
  hot_sign(h, buf, len, xk1);
  if (h.st_err | h.rd_err) {
    f.bad = true;
    h.done = true;
    return;
  }
  f.x[h.k] = xk;
  f.x[h.k + 1] = xk1;
  int lv = std::min(h.lev, 3);
  int tn = lv <= 1 ? 1 + (a + b) * (lv + 1) : 12 + lv;
  h.c = (h.c & 15) * 16 + tn;
  h.k += 2;
  if (h.k >= f.si.lastnz) {
    h.done = true;
    return;
  }
  h.t = h.c + f.rate_flag + (h.k > f.ne / 2 ? 256 : 0);
  h.lev = 0;
  h.xk = 0;
  h.xk1 = 0;
  h.pki = g_ac_spec_lookup[h.t];
}

// run one frame's spectral loop to completion on local state
static void spec_loop1(FrameCtx& f) {
  if (f.done) return;
  SpecHot h;
  hot_load(h, f);
  const uint8_t* buf = f.r.buf;
  const int len = f.r.len;
  while (!h.done) {
    int sym = hot_sym(h, buf, len);
    hot_after_sym(h, f, sym, buf, len);
  }
  hot_store(h, f);
}

// run two frames' spectral loops simultaneously: their symbol chains are
// independent, so the out-of-order core overlaps the dependent loads
static void spec_loop2(FrameCtx& A, FrameCtx& B) {
  if (A.done) { spec_loop1(B); return; }
  if (B.done) { spec_loop1(A); return; }
  SpecHot a, b;
  hot_load(a, A);
  hot_load(b, B);
  const uint8_t* bufA = A.r.buf;
  const int lenA = A.r.len;
  const uint8_t* bufB = B.r.buf;
  const int lenB = B.r.len;
  while (!(a.done | b.done)) {
    int symA = hot_sym(a, bufA, lenA);
    int symB = hot_sym(b, bufB, lenB);
    hot_after_sym(a, A, symA, bufA, lenA);
    hot_after_sym(b, B, symB, bufB, lenB);
  }
  while (!a.done) {
    int sym = hot_sym(a, bufA, lenA);
    hot_after_sym(a, A, sym, bufA, lenA);
  }
  while (!b.done) {
    int sym = hot_sym(b, bufB, lenB);
    hot_after_sym(b, B, sym, bufB, lenB);
  }
  hot_store(a, A);
  hot_store(b, B);
}

// Run N frames' spectral loops in lock-step until ANY lane finishes, then
// store everything back. Fixed N keeps each lane's SpecHot scalarised into
// registers; the caller re-filters live lanes and re-enters, so the
// store/load round-trip happens once per finished frame, off the hot path.
template <int N>
static void spec_loop_fixed(FrameCtx* const* F) {
  SpecHot h[N];
  const uint8_t* buf[N];
  int len[N];
  for (int i = 0; i < N; i++) {
    hot_load(h[i], *F[i]);
    buf[i] = F[i]->r.buf;
    len[i] = F[i]->r.len;
  }
  for (;;) {
    int sym[N];
    for (int i = 0; i < N; i++) sym[i] = hot_sym(h[i], buf[i], len[i]);
    bool any_done = false;
    for (int i = 0; i < N; i++) {
      hot_after_sym(h[i], *F[i], sym[i], buf[i], len[i]);
      any_done |= h[i].done;
    }
    if (any_done) break;
  }
  for (int i = 0; i < N; i++) hot_store(h[i], *F[i]);
}

// Drive up to kSpecLanes frames through the spectral phase together:
// re-filter the live lanes each pass and dispatch to the widest fixed-N
// lock-step loop. More lanes = more independent range-decoder chains in
// the out-of-order window (each chain is ~load-to-use serial). Lane count
// is tuned by A/B measurement with tools/host_parse_bench.py on the bench
// host (absolute throughput lives in the committed BENCH_r*.json, not
// here): two chains already fill this core's OoO window, and wider
// SpecHot arrays start spilling registers. Wider cores may prefer 4.
#ifndef LC3_SPEC_LANES
#define LC3_SPEC_LANES 2
#endif
constexpr int kSpecLanes = LC3_SPEC_LANES;  // -DLC3_SPEC_LANES=N to A/B

static void spec_loop_multi(FrameCtx** fr, int n) {
  for (;;) {
    FrameCtx* live[kSpecLanes];
    int m = 0;
    for (int i = 0; i < n; i++)
      if (!fr[i]->done) live[m++] = fr[i];
    switch (m) {
      case 0:
        return;
      case 1:
        spec_loop1(*live[0]);
        return;
      case 2:
        spec_loop2(*live[0], *live[1]);
        return;
      case 3:
        spec_loop_fixed<3>(live);
        break;
      default:
        spec_loop_fixed<4>(live);
        break;
    }
  }
}

// Residual bits, noise seed, SNS de-enumeration, field stores.
// (A 64-bit shift-window bulk tail-bit reader was A/B'd here and in the
// spectral hot loop: 2.7% / 6% SLOWER respectively — the scalar per-bit
// loads are independent L1 hits the OoO core overlaps for free, while a
// window serializes bit n on bit n-1's shift. See the cycles/symbol
// breakdown in BENCH_SWEEP.md.)
static bool parse_tail(FrameCtx& f,
                       uint8_t* lsb_mode, int32_t* gg_ind,
                       int32_t* rc_order, int32_t* rc_i, int32_t* bandwidth,
                       int32_t* noise_factor, int32_t* nf_seed,
                       uint8_t* zero_frame, uint8_t* residual_bits,
                       int32_t* n_residual, int32_t* sns_y, int32_t* sns_shape,
                       int32_t* sns_gind, int32_t* sns_ind_lf,
                       int32_t* sns_ind_hf, uint8_t* ltpf_active,
                       int32_t* pitch_index) {
  Reader& r = f.r;
  const SideInfo& si = f.si;
  int32_t* x = f.x;
  const int ne = f.ne;
  for (int k = si.lastnz; k < ne; k++) x[k] = 0;

  int nbits_side = r.tail_bits - 8;
  int nbits_ari = (r.head + 1 - 3) * 8 + 25 - ilog2_floor(f.st.range);
  if (f.nbits < nbits_side + nbits_ari) return false;
  int nres_avail = f.nbits - nbits_side - nbits_ari;
  int nres = 0;
  if (!si.lsb_mode) {
    for (int k = 0; k < ne; k++) {
      if (x[k] != 0) {
        if (nres == nres_avail) break;
        // aligned at the spectral line (not rank order) so the device-side
        // residual_apply needs no gather
        residual_bits[k] = r.tail_bool();
        nres++;
      }
    }
  } else {
    int budget = nres_avail;
    auto read_bit = [&](int idx) -> bool {
      if (budget == 0) return false;
      bool bit = r.tail_bool();
      budget--;
      if (bit) {
        if (x[idx] > 0) x[idx]++;
        else if (x[idx] < 0) x[idx]--;
        else {
          if (budget == 0) return false;
          bool b2 = r.tail_bool();
          budget--;
          x[idx] = b2 ? -1 : 1;
        }
      }
      return true;
    };
    for (int k = 0; k < si.lastnz; k += 2) {
      if (f.save_lev[k] > 0) {
        if (!read_bit(k)) break;
        if (!read_bit(k + 1)) break;
      }
    }
  }
  if (r.error) return false;

  // uint32 wraparound preserves the low 16 bits the seed keeps, and lets
  // the compiler vectorize the multiply-accumulate (int64 blocks it)
  uint32_t seed = 0;
  for (int k = 0; k < ne; k++) seed += uint32_t(std::abs(x[k])) * uint32_t(k);
  *nf_seed = int32_t(seed & 0xFFFF);
  *zero_frame = (si.lastnz == 2 && x[0] == 0 && x[1] == 0 && si.gg_ind == 0);

  *lsb_mode = si.lsb_mode;
  *gg_ind = si.gg_ind;
  rc_order[0] = f.tns_order[0];
  rc_order[1] = f.tns_order[1];
  for (int i = 0; i < 16; i++) rc_i[i] = f.tns_idx[i];
  *bandwidth = si.bandwidth;
  *noise_factor = si.noise_factor;
  *n_residual = nres;

  // SNS de-enumeration
  int shape_j = (si.submode_msb << 1) + si.submode_lsb;
  int32_t y[16] = {0};
  if (shape_j == 0) {
    mpvq_deenum(10, 10, si.ls_inda, si.idx_a, y);
    int32_t z6[6];
    mpvq_deenum(6, 1, si.ls_indb, si.idx_b, z6);
    for (int i = 0; i < 6; i++) y[10 + i] = z6[i];
  } else if (shape_j == 1) {
    mpvq_deenum(10, 10, si.ls_inda, si.idx_a, y);
  } else if (shape_j == 2) {
    mpvq_deenum(16, 8, si.ls_inda, si.idx_a, y);
  } else {
    mpvq_deenum(16, 6, si.ls_inda, si.idx_a, y);
  }
  for (int i = 0; i < 16; i++) sns_y[i] = y[i];
  *sns_shape = shape_j;
  *sns_gind = si.g_ind;
  *sns_ind_lf = si.ind_lf;
  *sns_ind_hf = si.ind_hf;
  *ltpf_active = si.ltpf_active;
  *pitch_index = si.pitch_index;
  return true;
}

// -------------------------------------------------------------- encoder

// Inconsistent caller-supplied fields must fail per-frame, not scribble
// past the payload row (the Rust reference panics on OOB; an exported C
// ABI can't, so every write is guarded and `error` is checked after).
#ifdef LC3_PACK_SLOWSIDE
// A/B baseline: the original per-bit side writer (one guarded byte RMW
// per backward bit). ~440 side bits/frame at 48k/150B made this the
// packer's single largest cost — see the batched writer below.
struct Writer {
  uint8_t* buf;
  int len;
  int bp = 0;
  int bp_side;
  int mask_side = 1;
  bool error = false;
  explicit Writer(uint8_t* b, int n) : buf(b), len(n), bp_side(n - 1) {
    std::memset(b, 0, n);
  }
  void bool_backward(bool bit) {
    if (bp_side < 0 || bp_side < bp) { error = true; return; }
    if (bit) buf[bp_side] |= mask_side;
    else buf[bp_side] &= ~mask_side;
    if (mask_side == 0x80) { mask_side = 1; bp_side--; }
    else mask_side <<= 1;
  }
  void uint_backward(uint32_t val, int nbits) {
    for (int i = 0; i < nbits; i++) { bool_backward(val & 1); val >>= 1; }
  }
  void byte_forward(uint8_t v) {
    if (bp >= len) { error = true; return; }
    buf[bp++] = v;
  }
  void uint_forward(uint32_t val, int nbits) {
    if (bp >= len) { error = true; return; }
    int mask = 0x80;
    for (int i = 0; i < nbits; i++) {
      if (val & mask) buf[bp] |= mask;
      else buf[bp] &= ~mask;
      mask >>= 1;
    }
  }
  void final_flush() {}
  int nbits_side_written(int nbits) const {
    int lg = ilog2_floor(uint32_t(mask_side));
    return nbits - (8 * bp_side + 8 - lg);
  }
};
#else
// Batched side writer: backward (side) bits accumulate LSB-first in a
// 64-bit register and flush whole bytes to the tail, so a frame's ~440
// side bits cost ~55 byte stores instead of ~440 guarded RMWs. Bit
// layout is identical to the per-bit writer (each tail byte fills LSB
// to MSB walking backward). Callers must invoke final_flush() once,
// after RangeEnc::finish, to OR the pending partial byte into place —
// that byte may legitimately be shared with the range coder's final
// uint_forward (which writes only the top bits and never advances bp).
// Overrun detection is equivalent for valid field bundles and at least
// as strict for inconsistent ones: both pointers are monotone, so a
// side/forward crossing caught per-bit by the old writer is caught at
// flush (or final_flush) here, and the frame is zeroed the same way.
struct Writer {
  uint8_t* buf;
  int len;
  int bp = 0;
  int side_bytes = 0;   // whole tail bytes already flushed
  uint64_t acc = 0;     // pending side bits, next bit at 1 << nacc
  int nacc = 0;
  bool error = false;
  explicit Writer(uint8_t* b, int n) : buf(b), len(n) {
    std::memset(b, 0, n);
  }
  void flush_acc() {
    while (nacc >= 8) {
      int idx = len - 1 - side_bytes;
      if (idx < 0 || idx < bp) { error = true; nacc = 0; return; }
      buf[idx] = uint8_t(acc & 0xff);
      acc >>= 8;
      nacc -= 8;
      side_bytes++;
    }
  }
  void bool_backward(bool bit) {
    acc |= uint64_t(bit) << nacc;
    if (++nacc >= 48) flush_acc();
  }
  void uint_backward(uint32_t val, int nbits) {
    // widest single field is 13 bits (SNS index_joint low half)
    acc |= (uint64_t(val) & ((uint64_t(1) << nbits) - 1)) << nacc;
    nacc += nbits;
    if (nacc >= 48) flush_acc();
  }
  void byte_forward(uint8_t v) {
    if (bp >= len) { error = true; return; }
    buf[bp++] = v;
  }
  void uint_forward(uint32_t val, int nbits) {
    if (bp >= len) { error = true; return; }
    uint8_t top = uint8_t(0xff00 >> nbits);  // top nbits of the byte
    buf[bp] = uint8_t((buf[bp] & ~top) | (val & top));
  }
  void final_flush() {
    flush_acc();
    if (error || nacc == 0) return;
    int idx = len - 1 - side_bytes;
    // idx == bp is the legal shared final byte; idx < bp is a crossing
    if (idx < 0 || idx < bp) { error = true; return; }
    buf[idx] |= uint8_t(acc & 0xff);
  }
  int nbits_side_written(int nbits) const {
    (void)nbits;
    return 8 * side_bytes + nacc;
  }
};
#endif

struct RangeEnc {
  uint32_t low = 0, range = 0x00ffffff;
  int32_t cache = -1, carry = 0, carry_count = 0;
  void shift(Writer& w) {
    if (low < 0x00ff0000u || carry == 1) {
      if (cache >= 0) w.byte_forward(uint8_t((cache + carry) & 0xff));
      while (carry_count > 0) {
        w.byte_forward(uint8_t((carry + 0xff) & 0xff));
        carry_count--;
      }
      cache = int32_t(low >> 16);
      carry = 0;
    } else {
      carry_count++;
    }
    low = (low << 8) & 0x00ffffff;
  }
  void encode(Writer& w, int cum_freq, int sym_freq) {
    uint32_t r = range >> 10;
    low += r * uint32_t(cum_freq);
    if (low >> 24) carry = 1;
    low &= 0x00ffffff;
    range = r * uint32_t(sym_freq);
    while (range < 0x10000) { range <<= 8; shift(w); }
  }
  int forecast(const Writer& w) const {
    int nbits_ari = w.bp * 8 + 25 - ilog2_floor(range);
    if (carry >= 0) nbits_ari += 8;
    if (carry_count > 0) nbits_ari += carry_count * 8;
    return nbits_ari;
  }
  void finish(Writer& w) {
    int bits = 1;
    while ((range >> (24 - bits)) == 0) bits++;
    uint32_t mask = 0x00ffffff >> bits;
    uint32_t val = low + mask;
    uint32_t over1 = val >> 24;
    uint32_t high = low + range;
    uint32_t over2 = high >> 24;
    val &= 0x00ffffff & ~mask;
    if (over1 == over2) {
      if (val + mask >= high) {
        bits++;
        mask >>= 1;
        val = ((low + mask) & 0x00ffffff) & ~mask;
      }
      if (val < low) carry = 1;
    }
    low = val;
    while (bits > 0) { shift(w); bits -= 8; }
    bits += 8;
    if (carry_count > 0) {
      w.byte_forward(uint8_t(cache));
      while (carry_count > 1) { w.byte_forward(0xff); carry_count--; }
      w.uint_forward(0xffu >> (8 - bits), bits);
    } else {
      w.uint_forward(uint32_t(cache & 0xffff), bits);
    }
  }
};

struct EncFields {
  int bandwidth, nbits_bw;
  int ind_lf, ind_hf, shape_j, gind, ls_inda, ls_indb;
  int32_t index_joint;
  int num_tns_filters, lpc_weighting;
  const int32_t* rc_order;
  const int32_t* rc_i;
  bool pitch_present, ltpf_active;
  int pitch_index;
  int lastnz_trunc, gg_ind, rate_flag, nbits_lsb;
  bool lsb_mode;
  int noise_factor;
  const int32_t* x_q;
  const uint8_t* res_bits;
  int n_res;
};

static const int kSnsGainMsbBits[4] = {1, 1, 2, 2};
static const int kSnsGainLsbBits[4] = {0, 1, 0, 1};

// Returns false (and zeroes the frame) on inconsistent fields or a writer
// overrun instead of corrupting memory.
static bool pack_one(const EncFields& f, int ne, uint8_t* out, int nbytes) {
  Writer w(out, nbytes);
  // field ranges that index static tables or drive loop bounds
  bool ok = f.lastnz_trunc >= 2 && f.lastnz_trunc <= ne &&
            (f.lastnz_trunc & 1) == 0 && f.num_tns_filters >= 0 &&
            f.num_tns_filters <= 2 && f.lpc_weighting >= 0 &&
            f.lpc_weighting <= 1 && f.shape_j >= 0 && f.shape_j <= 3 &&
            (f.rate_flag == 0 || f.rate_flag == 512);
  for (int fi = 0; ok && fi < f.num_tns_filters; fi++) {
    ok = f.rc_order[fi] >= 0 && f.rc_order[fi] <= 8;
    for (int k = 0; ok && k < f.rc_order[fi]; k++)
      ok = f.rc_i[k + 8 * fi] >= 0 && f.rc_i[k + 8 * fi] < 17;
  }
  if (!ok) { std::memset(out, 0, nbytes); return false; }
  int nbits = nbytes * 8;
  if (f.nbits_bw > 0) w.uint_backward(f.bandwidth, f.nbits_bw);
  w.uint_backward((f.lastnz_trunc >> 1) - 1, ceil_log2(ne / 2));
  w.bool_backward(f.lsb_mode);
  w.uint_backward(f.gg_ind, 8);
  for (int i = 0; i < f.num_tns_filters; i++)
    w.bool_backward(f.rc_order[i] != 0);
  w.bool_backward(f.pitch_present);
  w.uint_backward(f.ind_lf, 5);
  w.uint_backward(f.ind_hf, 5);
  bool submode_msb = (f.shape_j >> 1) != 0;
  w.bool_backward(submode_msb);
  w.uint_backward(f.gind >> kSnsGainLsbBits[f.shape_j], kSnsGainMsbBits[f.shape_j]);
  w.bool_backward(f.ls_inda != 0);
  if (!submode_msb) {
    w.uint_backward(uint32_t(f.index_joint), 13);
    w.uint_backward(uint32_t(f.index_joint) >> 13, 12);
  } else {
    w.uint_backward(uint32_t(f.index_joint), 12);
    w.uint_backward(uint32_t(f.index_joint) >> 12, 12);
  }
  if (f.pitch_present) {
    w.bool_backward(f.ltpf_active);
    w.uint_backward(f.pitch_index, 9);
  }
  w.uint_backward(f.noise_factor, 3);

  RangeEnc st;
  for (int fi = 0; fi < f.num_tns_filters; fi++) {
    if (f.rc_order[fi] > 0) {
      st.encode(w, g_ac_tns_order_cumfreq[f.lpc_weighting][f.rc_order[fi] - 1],
                g_ac_tns_order_freq[f.lpc_weighting][f.rc_order[fi] - 1]);
      for (int k = 0; k < f.rc_order[fi]; k++) {
        st.encode(w, g_ac_tns_coef_cumfreq[k][f.rc_i[k + 8 * fi]],
                  g_ac_tns_coef_freq[k][f.rc_i[k + 8 * fi]]);
      }
    }
  }

  // spectral data
  // lsb queue: at most 4 entries per k-pair over <= 240 pairs; a fixed
  // stack buffer avoids a per-frame heap allocation
  uint8_t lsbs[1984];
  int n_lsbs = 0;
  // nonzero-line positions, collected on the fly so the residual pass
  // emits straight off this list instead of re-scanning all ne lines
  // with a load+branch each (~400 lines at 48k)
  int16_t nz[480];
  int n_nz = 0;
  int c = 0;
  for (int k = 0; k < f.lastnz_trunc; k += 2) {
    int t = c + f.rate_flag + (k > ne / 2 ? 256 : 0);
    uint32_t a = uint32_t(std::abs(f.x_q[k]));
    uint32_t a_lsb = a;
    uint32_t b = uint32_t(std::abs(f.x_q[k + 1]));
    uint32_t b_lsb = b;
    int lev = 0;
    uint8_t lsb0 = 0, lsb1 = 0;
    while (std::max(a, b) >= 4) {
      int pki = g_ac_spec_lookup[t + std::min(lev, 3) * 1024];
      st.encode(w, g_ac_spec_cumfreq[pki][16], g_ac_spec_freq[pki][16]);
      if (f.lsb_mode && lev == 0) {
        lsb0 = a & 1;
        lsb1 = b & 1;
      } else {
        w.bool_backward(a & 1);
        w.bool_backward(b & 1);
      }
      a >>= 1;
      b >>= 1;
      lev++;
    }
    int pki = g_ac_spec_lookup[t + std::min(lev, 3) * 1024];
    int sym = int(a + 4 * b);
    st.encode(w, g_ac_spec_cumfreq[pki][sym], g_ac_spec_freq[pki][sym]);
    if (f.lsb_mode && lev > 0) {
      a_lsb >>= 1;
      b_lsb >>= 1;
      lsbs[n_lsbs++] = lsb0;
      if (a_lsb == 0 && f.x_q[k] != 0) lsbs[n_lsbs++] = f.x_q[k] > 0 ? 0 : 1;
      lsbs[n_lsbs++] = lsb1;
      if (b_lsb == 0 && f.x_q[k + 1] != 0) lsbs[n_lsbs++] = f.x_q[k + 1] > 0 ? 0 : 1;
    }
    if (a_lsb > 0) { w.bool_backward(f.x_q[k] <= 0); nz[n_nz++] = int16_t(k); }
    if (b_lsb > 0) {
      w.bool_backward(f.x_q[k + 1] <= 0);
      nz[n_nz++] = int16_t(k + 1);
    }
    lev = std::min(lev, 3);
    int tn = lev <= 1 ? 1 + (int(a) + int(b)) * (lev + 1) : 12 + lev;
    c = (c & 15) * 16 + tn;
  }

  int nbits_side = w.nbits_side_written(nbits);
  int nbits_ari = st.forecast(w);
  int nres_enc = std::max(0, nbits - (nbits_side + nbits_ari));
  if (!f.lsb_mode) {
    // res_bits is spectrally aligned (bit for line k at index k); emit in
    // nonzero-line order, which is how the decoder consumes them. The nz
    // list covers every nonzero line below lastnz_trunc; the defensive
    // tail scan matches the old full-ne scan should a caller hand x_q
    // with nonzeros past the truncation point (a valid encoder never
    // does — quantization zeroes them).
    int n = std::min(nres_enc, f.n_res);
    int emitted = 0;
    for (int i = 0; i < n_nz && emitted < n; i++, emitted++)
      w.bool_backward(f.res_bits[nz[i]] != 0);
    for (int k = f.lastnz_trunc; k < ne && emitted < n; k++) {
      if (f.x_q[k] != 0) {
        w.bool_backward(f.res_bits[k] != 0);
        emitted++;
      }
    }
  } else {
    int n = std::min(nres_enc, n_lsbs);
    for (int i = 0; i < n; i++) w.bool_backward(lsbs[i] == 1);
  }
  st.finish(w);
  w.final_flush();
  if (w.error) { std::memset(out, 0, nbytes); return false; }
  return true;
}

}  // namespace

extern "C" {

void lc3_load_tables(const int16_t* spec_freq, const int16_t* spec_cumfreq,
                     const uint8_t* spec_lookup, const int16_t* tns_order_freq,
                     const int16_t* tns_order_cumfreq,
                     const int16_t* tns_coef_freq,
                     const int16_t* tns_coef_cumfreq,
                     const int32_t* mpvq_offsets) {
  std::memcpy(g_ac_spec_freq, spec_freq, sizeof(g_ac_spec_freq));
  std::memcpy(g_ac_spec_cumfreq, spec_cumfreq, sizeof(g_ac_spec_cumfreq));
  std::memcpy(g_ac_spec_lookup, spec_lookup, sizeof(g_ac_spec_lookup));
  std::memcpy(g_ac_tns_order_freq, tns_order_freq, sizeof(g_ac_tns_order_freq));
  std::memcpy(g_ac_tns_order_cumfreq, tns_order_cumfreq,
              sizeof(g_ac_tns_order_cumfreq));
  std::memcpy(g_ac_tns_coef_freq, tns_coef_freq, sizeof(g_ac_tns_coef_freq));
  std::memcpy(g_ac_tns_coef_cumfreq, tns_coef_cumfreq,
              sizeof(g_ac_tns_coef_cumfreq));
  std::memcpy(g_mpvq_offsets, mpvq_offsets, sizeof(g_mpvq_offsets));
  g_recip14[0] = 0;
  for (uint64_t d = 1; d < 16384; d++)
    g_recip14[d] = ((uint64_t(1) << 38) + d - 1) / d;
  for (int pki = 0; pki < 64; pki++)
    for (int v = 1; v <= 16; v++)
      g_spec_cf32[pki][v - 1] = uint32_t(g_ac_spec_cumfreq[pki][v]);
  for (int pki = 0; pki < 64; pki++) {
    int val = 0;
    for (int q = 0; q < 1024; q++) {
      while (val < 16 && g_ac_spec_cumfreq[pki][val + 1] <= q) val++;
      // 5/10/11-bit packing fits: val <= 16, cumfreq <= 1023, freq <= 1024
      // (the spectral model's total weight is 1 << 10)
      g_spec_ent[pki][q] = uint32_t(val) |
                           (uint32_t(g_ac_spec_cumfreq[pki][val]) << 5) |
                           (uint32_t(g_ac_spec_freq[pki][val]) << 15);
    }
  }
}

// Batched parse: payloads [S, nbytes] row-major. Outputs preallocated by the
// caller with the ParsedFrames layout. Returns number of bad (PLC) frames.
int lc3_parse_frames(const uint8_t* payloads, int S, int nbytes, int fs_ind,
                     int ne, int is_7p5ms, int n_threads,
                     int32_t* x, uint8_t* lsb_mode, int32_t* gg_ind,
                     int32_t* rc_order, int32_t* rc_i, int32_t* bandwidth,
                     int32_t* noise_factor, int32_t* nf_seed,
                     uint8_t* zero_frame, uint8_t* residual_bits,
                     int32_t* n_residual, int32_t* sns_y, int32_t* sns_shape,
                     int32_t* sns_gind, int32_t* sns_ind_lf,
                     int32_t* sns_ind_hf, uint8_t* ltpf_active,
                     int32_t* pitch_index, uint8_t* bad_frame) {
  std::vector<std::thread> threads;
  int nt = std::max(1, n_threads);
  std::vector<int> bad_counts(nt, 0);
  // Each thread drives frames through the spectral loop kSpecLanes at a
  // time (spec_loop_multi): the lanes' independent range-decoder chains
  // overlap in the out-of-order window while the hot cursors stay in
  // registers.
  constexpr int G = kSpecLanes;
  auto work = [&](int tid) {
    std::vector<FrameCtx> ctx(G);
    std::vector<int> lev_pool(size_t(G) * ne);
    std::vector<int> idx(G);
    int s = tid;
    while (s < S) {
      int g = 0;
      for (; g < G && s < S; g++, s += nt) {
        idx[g] = s;
        ctx[g].x = x + size_t(s) * ne;
        ctx[g].save_lev = lev_pool.data() + size_t(g) * ne;
        // clear the sparsely-written output rows up front
        std::memset(residual_bits + size_t(s) * ne, 0, size_t(ne));
        std::memset(rc_i + size_t(s) * 16, 0, sizeof(int32_t) * 16);
        std::memset(sns_y + size_t(s) * 16, 0, sizeof(int32_t) * 16);
        rc_order[size_t(s) * 2] = rc_order[size_t(s) * 2 + 1] = 0;
        parse_head(ctx[g], payloads + size_t(idx[g]) * nbytes, nbytes, fs_ind,
                   ne, is_7p5ms != 0);
      }
      const int n = g;
      FrameCtx* ptrs[G];
      for (int i = 0; i < n; i++) ptrs[i] = &ctx[i];
      spec_loop_multi(ptrs, n);
      for (int i = 0; i < n; i++) {
        FrameCtx& f = ctx[i];
        const int si = idx[i];
        bool ok = !f.bad &&
                  parse_tail(f, lsb_mode + si, gg_ind + si,
                             rc_order + size_t(si) * 2, rc_i + size_t(si) * 16,
                             bandwidth + si, noise_factor + si, nf_seed + si,
                             zero_frame + si, residual_bits + size_t(si) * ne,
                             n_residual + si, sns_y + size_t(si) * 16,
                             sns_shape + si, sns_gind + si, sns_ind_lf + si,
                             sns_ind_hf + si, ltpf_active + si,
                             pitch_index + si);
        if (!ok) {
          bad_frame[si] = 1;
          // Zero EVERY per-stream output, not just the spectrum: the
          // Python binding reuses output buffer rings across calls
          // (coding/native.py), so any field parse_tail did not reach
          // before failing would otherwise leak a PREVIOUS batch's value
          // into this frame's row. The decoder's PLC path ignores bad
          // lanes, but the parse API contract (and the differential
          // oracle, which zeroes all fields on bad frames) requires
          // defined outputs. Caught by
          // tests/test_native_bitstream.py::test_parse_pair_loop_drain_paths
          // flaking only when other suites had warmed the buffer ring.
          std::memset(x + size_t(si) * ne, 0, sizeof(int32_t) * ne);
          std::memset(residual_bits + size_t(si) * ne, 0, size_t(ne));
          std::memset(rc_i + size_t(si) * 16, 0, sizeof(int32_t) * 16);
          std::memset(sns_y + size_t(si) * 16, 0, sizeof(int32_t) * 16);
          rc_order[size_t(si) * 2] = rc_order[size_t(si) * 2 + 1] = 0;
          lsb_mode[si] = 0;
          gg_ind[si] = 0;
          bandwidth[si] = 0;
          noise_factor[si] = 0;
          nf_seed[si] = 0;
          zero_frame[si] = 0;
          n_residual[si] = 0;
          sns_shape[si] = 0;
          sns_gind[si] = 0;
          sns_ind_lf[si] = 0;
          sns_ind_hf[si] = 0;
          ltpf_active[si] = 0;
          pitch_index[si] = 0;
          bad_counts[tid]++;
        } else {
          bad_frame[si] = 0;
        }
      }
    }
  };
  if (nt == 1) {
    work(0);
  } else {
    for (int t = 0; t < nt; t++) threads.emplace_back(work, t);
    for (auto& th : threads) th.join();
  }
  int total = 0;
  for (int v : bad_counts) total += v;
  return total;
}

// Batched pack: field arrays [S,...]; out [S, nbytes]. Returns the number
// of frames rejected for inconsistent fields (their rows are zeroed).
int lc3_pack_frames(int S, int nbytes, int ne, int n_threads,
                     const int32_t* bandwidth, int nbits_bw,
                     const int32_t* ind_lf, const int32_t* ind_hf,
                     const int32_t* shape_j, const int32_t* gind,
                     const int32_t* ls_inda, const int32_t* ls_indb,
                     const int32_t* index_joint, const int32_t* num_tns,
                     int lpc_weighting, const int32_t* rc_order,
                     const int32_t* rc_i, const uint8_t* pitch_present,
                     const uint8_t* ltpf_active, const int32_t* pitch_index,
                     const int32_t* lastnz_trunc, const int32_t* gg_ind,
                     int rate_flag, const int32_t* nbits_lsb,
                     const uint8_t* lsb_mode, const int32_t* noise_factor,
                     const int32_t* x_q, const uint8_t* res_bits,
                     const int32_t* n_res, uint8_t* out) {
  int nt = std::max(1, n_threads);
  std::vector<int> bad_counts(nt, 0);
  auto work = [&](int tid) {
    for (int s = tid; s < S; s += nt) {
      EncFields f{
          bandwidth[s], nbits_bw, ind_lf[s], ind_hf[s], shape_j[s], gind[s],
          ls_inda[s], ls_indb[s], index_joint[s], num_tns[s], lpc_weighting,
          rc_order + size_t(s) * 2, rc_i + size_t(s) * 16,
          pitch_present[s] != 0, ltpf_active[s] != 0, pitch_index[s],
          lastnz_trunc[s], gg_ind[s], rate_flag, nbits_lsb[s],
          lsb_mode[s] != 0, noise_factor[s], x_q + size_t(s) * ne,
          res_bits + size_t(s) * ne, n_res[s]};
      if (!pack_one(f, ne, out + size_t(s) * nbytes, nbytes)) bad_counts[tid]++;
    }
  };
  if (nt == 1) {
    work(0);
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < nt; t++) threads.emplace_back(work, t);
    for (auto& th : threads) th.join();
  }
  int total = 0;
  for (int v : bad_counts) total += v;
  return total;
}

}  // extern "C"
