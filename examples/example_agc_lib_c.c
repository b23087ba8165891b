/*
 * C client of the agc-tpu native library (parity with the reference's
 * src/examples/example-agc-lib-c.c).
 *
 * Build:
 *   gcc example_agc_lib_c.c -I../agc_tpu/native -L../agc_tpu/native \
 *       -lagcnative -Wl,-rpath,../agc_tpu/native -o example_agc_lib_c
 * Run:
 *   ./example_agc_lib_c archive.agc
 */

#include <stdio.h>
#include <stdlib.h>

#include "agc.h"

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <archive.agc>\n", argv[0]);
    return 1;
  }
  agc_t* h = agc_open(argv[1], 1);
  if (!h) {
    fprintf(stderr, "cannot open %s\n", argv[1]);
    return 1;
  }

  int n_sample = 0;
  char** samples = agc_list_sample(h, &n_sample);
  printf("samples: %d\n", n_sample);

  char* ref = agc_reference_sample(h);
  printf("reference sample: %s\n", ref);
  agc_string_destroy(ref);

  for (int i = 0; i < n_sample && i < 3; ++i) {
    int n_ctg = 0;
    char** ctgs = agc_list_ctg(h, samples[i], &n_ctg);
    printf("  %s: %d contigs\n", samples[i], n_ctg);
    if (n_ctg > 0) {
      int len = agc_get_ctg_len(h, samples[i], ctgs[0]);
      char* buf = (char*)malloc((size_t)len + 1);
      int got = agc_get_ctg_seq(h, samples[i], ctgs[0], -1, -1, buf);
      printf("    %s: %d bases (first 60: %.60s)\n", ctgs[0], got, buf);
      free(buf);
    }
    agc_list_destroy(ctgs);
  }
  agc_list_destroy(samples);
  agc_close(h);
  return 0;
}
