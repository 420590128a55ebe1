/* Minimal standalone LZ4 decoder binary — the framework's counterpart to
 * the reference's size-optimized `tiny-smallz4cat` artifact
 * (/root/reference/Makefile:20-43): stdin -> stdout streaming decode with
 * the constant-memory ring decoder (64 KB ring + 16-byte stash, no input
 * retention).  Build: `make -C native tinycat` (-Os, static, stripped). */
#include <stdio.h>
#include <stdlib.h>

#include "tlz4.h"

int main(void) {
  static uint8_t in[1 << 14], out[1 << 16];
  tlz4_rdec *d = tlz4_rdec_new(NULL, 0, /*verify=*/1);
  if (!d) return 2;
  int done = 0;
  int64_t have = 0, off = 0;
  int final = 0;
  while (!done) {
    if (off == have && !final) {
      have = (int64_t)fread(in, 1, sizeof(in), stdin);
      off = 0;
      final = have == 0 || feof(stdin);
    }
    int64_t consumed = 0;
    int64_t n = tlz4_rdec_write(d, in + off, have - off, final, out,
                                (int64_t)sizeof(out), &consumed, &done);
    if (n < 0) {
      fprintf(stderr, "tinycat: corrupt stream (%lld)\n", (long long)n);
      tlz4_rdec_free(d);
      return 1;
    }
    off += consumed;
    if (n > 0 && fwrite(out, 1, (size_t)n, stdout) != (size_t)n) {
      tlz4_rdec_free(d);
      return 3;
    }
    if (final && off == have && n == 0 && !done) {
      fprintf(stderr, "tinycat: truncated stream\n");
      tlz4_rdec_free(d);
      return 1;
    }
  }
  tlz4_rdec_free(d);
  return 0;
}
