/* Minimal C client of the rnnoise_tpu C ABI shim — the same loop as the
 * reference demo (examples/rnnoise_demo.c:52-61): raw 16-bit PCM in/out,
 * frame by frame, first frame dropped by the caller if desired.
 *
 * Usage: capi_demo [model_blob] < in.pcm > out.pcm
 * Prints per-frame VAD to stderr for the test harness.
 */
#include <stdio.h>
#include <stdlib.h>

#include "rnnoise_tpu.h"

int main(int argc, char **argv) {
  RNNModel *model = NULL;
  if (argc > 1) {
    model = rnnoise_model_from_filename(argv[1]);
    if (!model) {
      fprintf(stderr, "failed to load model %s\n", argv[1]);
      return 1;
    }
  }
  DenoiseState *st = rnnoise_create(model);
  if (!st) {
    fprintf(stderr, "rnnoise_create failed\n");
    return 1;
  }
  int n = rnnoise_get_frame_size();
  short *pcm = malloc(sizeof(short) * n);
  float *fin = malloc(sizeof(float) * n);
  float *fout = malloc(sizeof(float) * n);
  while (fread(pcm, sizeof(short), n, stdin) == (size_t)n) {
    int i;
    for (i = 0; i < n; i++) fin[i] = pcm[i];
    float vad = rnnoise_process_frame(st, fout, fin);
    for (i = 0; i < n; i++) {
      float v = fout[i];
      pcm[i] = (short)(v < -32768 ? -32768 : v > 32767 ? 32767 : (v >= 0 ? v + .5f : v - .5f));
    }
    fwrite(pcm, sizeof(short), n, stdout);
    fprintf(stderr, "vad %.6f\n", vad);
  }
  rnnoise_destroy(st);
  if (model) rnnoise_model_free(model);
  free(pcm);
  free(fin);
  free(fout);
  return 0;
}
