/* Sanitizer fuzz harness for the native runtime.
 *
 * Build:  make -C native fuzz   (ASan + UBSan)
 * Run:    native/fuzz_decode [iterations]
 *
 * Strategy: build seed frames with the encoder (several levels/formats/
 * dictionaries), then hammer the streaming decoder and the block-level
 * entry points with deterministic random mutations (bit flips, truncation,
 * splices, random garbage) and adversarial chunk sizes.  Any memory error
 * or UB aborts via the sanitizer; decode errors are expected and fine.
 */
#include "../include/tlz4.h"

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

static uint64_t rng_state = 0x9E3779B97F4A7C15ull;
static uint64_t rnd() {
  rng_state ^= rng_state << 13;
  rng_state ^= rng_state >> 7;
  rng_state ^= rng_state << 17;
  return rng_state;
}

static std::vector<uint8_t> make_seed_input() {
  std::vector<uint8_t> v;
  for (int i = 0; i < 3000; i++) v.push_back(uint8_t(rnd()));
  const char *s = "the quick brown fox jumps over the lazy dog. ";
  for (int i = 0; i < 400; i++) v.insert(v.end(), s, s + strlen(s));
  v.insert(v.end(), 5000, uint8_t('x'));
  for (int i = 0; i < 2000; i++) v.push_back(uint8_t(rnd()));
  return v;
}

static void decode_all(const std::vector<uint8_t> &frame, size_t chunk) {
  tlz4_dec *d = tlz4_dec_new(nullptr, 0);
  std::vector<uint8_t> out((8u << 20) + (1u << 16));
  size_t off = 0;
  int done = 0;
  while (off < frame.size() && !done) {
    size_t take = std::min(chunk, frame.size() - off);
    int final_flag = off + take >= frame.size();
    int64_t r = tlz4_dec_write(d, frame.data() + off, int64_t(take),
                               final_flag, out.data(), int64_t(out.size()),
                               &done);
    if (r < 0) break;  /* decode errors are expected on mutated input */
    off += take;
  }
  tlz4_dec_free(d);
}

int main(int argc, char **argv) {
  int iters = argc > 1 ? atoi(argv[1]) : 400;
  std::vector<uint8_t> input = make_seed_input();

  /* seed frames across the parameter space */
  std::vector<std::vector<uint8_t>> seeds;
  for (int level : {0, 2, 6, 9}) {
    for (int legacy : {0, 1}) {
      if (legacy && level == 0) continue;
      std::vector<uint8_t> out(size_t(tlz4_compress_bound(int64_t(input.size()))));
      /* legacy only supports the fixed 8 MB block size (a non-full legacy
       * block ends the stream), so small blocks are modern-frame only */
      int64_t n = tlz4_compress(input.data(), int64_t(input.size()),
                                out.data(), int64_t(out.size()), level,
                                legacy, nullptr, 0, legacy ? 0 : 4096);
      if (n < 0) { fprintf(stderr, "seed compress failed\n"); return 1; }
      out.resize(size_t(n));
      seeds.push_back(std::move(out));
    }
  }

  for (int it = 0; it < iters; it++) {
    std::vector<uint8_t> f = seeds[rnd() % seeds.size()];
    int muts = 1 + int(rnd() % 4);
    for (int m = 0; m < muts; m++) {
      switch (rnd() % 4) {
        case 0:  /* bit flip */
          if (!f.empty()) f[rnd() % f.size()] ^= uint8_t(1u << (rnd() % 8));
          break;
        case 1:  /* truncate */
          if (f.size() > 4) f.resize(4 + rnd() % (f.size() - 4));
          break;
        case 2: {  /* splice garbage */
          size_t at = rnd() % (f.size() + 1);
          for (int k = 0; k < 6; k++)
            f.insert(f.begin() + at, uint8_t(rnd()));
          break;
        }
        case 3:  /* byte overwrite run */
          if (!f.empty()) {
            size_t at = rnd() % f.size();
            size_t len = std::min<size_t>(1 + rnd() % 16, f.size() - at);
            memset(f.data() + at, int(rnd()), len);
          }
          break;
      }
    }
    decode_all(f, 1 + rnd() % 4096);

    /* block-level surfaces with hostile payloads */
    if (f.size() > 8) {
      std::vector<int32_t> a(f.size() + 2), b(f.size() + 2), c(f.size() + 2),
          d4(f.size() + 2);
      tlz4_parse_sequences(f.data(), int64_t(f.size()), a.data(), b.data(),
                           c.data(), d4.data(), int64_t(a.size()));
      std::vector<uint8_t> out(1 << 16);
      tlz4_decode_block(f.data(), int64_t(std::min<size_t>(f.size(), 4096)),
                        nullptr, 0, out.data(), int64_t(out.size()));
    }
  }
  printf("fuzz ok: %d iterations\n", iters);
  return 0;
}
