/* Public C API of the rnnoise_tpu compatibility shim.
 *
 * Declaration-compatible with the reference librnnoise public header
 * (include/rnnoise.h:57-125) so existing applications relink without source
 * changes.  Semantics:
 *   - frames are 480 samples of mono 48 kHz float PCM in int16 scale,
 *   - rnnoise_process_frame returns the voice-activity probability,
 *   - model == NULL selects the built-in default model,
 *   - a custom RNNModel must outlive every DenoiseState created from it and
 *     be released with rnnoise_model_free afterwards.
 *
 * Implementation: native/rnnoise_capi.cc (embedded-interpreter bridge into
 * the TPU-batched runtime).  Build with scripts/build_capi.sh.
 */
#ifndef RNNOISE_TPU_H
#define RNNOISE_TPU_H

#include <stdio.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct DenoiseState DenoiseState;
typedef struct RNNModel RNNModel;

/* Size in bytes of the (opaque) DenoiseState handle. */
int rnnoise_get_size(void);

/* Samples consumed/produced per rnnoise_process_frame call (480). */
int rnnoise_get_frame_size(void);

/* (Re)initialize a state in place; model NULL = default.  Returns 0 on
 * success. */
int rnnoise_init(DenoiseState *st, RNNModel *model);

/* Allocate + initialize a state; free with rnnoise_destroy. */
DenoiseState *rnnoise_create(RNNModel *model);

void rnnoise_destroy(DenoiseState *st);

/* Denoise one 480-sample frame; returns the VAD probability in [0, 1]. */
float rnnoise_process_frame(DenoiseState *st, float *out, const float *in);

/* Model loaders (weights_blob.bin format). */
RNNModel *rnnoise_model_from_buffer(const void *ptr, int len);
RNNModel *rnnoise_model_from_file(FILE *f);
RNNModel *rnnoise_model_from_filename(const char *filename);
void rnnoise_model_free(RNNModel *model);

#ifdef __cplusplus
}
#endif

#endif /* RNNOISE_TPU_H */
