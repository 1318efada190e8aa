/* Test-only shim exposing the reference implementation's internals as a
 * flat C ABI for ctypes.  Includes denoise.c to reach its static functions
 * (forward/inverse transform, band math, dct).  This file is part of the
 * golden-parity test harness; it is compiled against the read-only reference
 * tree and never ships. */

#include "denoise.c"   /* reference src/denoise.c, via -I */

#define EXPORT __attribute__((visibility("default")))

EXPORT void oracle_forward_transform(float *out_ri, const float *in960) {
  kiss_fft_cpx X[FREQ_SIZE];
  int i;
  forward_transform(X, in960);
  for (i = 0; i < FREQ_SIZE; i++) { out_ri[2*i] = X[i].r; out_ri[2*i+1] = X[i].i; }
}

EXPORT void oracle_inverse_transform(float *out960, const float *in_ri) {
  kiss_fft_cpx X[FREQ_SIZE];
  int i;
  for (i = 0; i < FREQ_SIZE; i++) { X[i].r = in_ri[2*i]; X[i].i = in_ri[2*i+1]; }
  inverse_transform(out960, X);
}

EXPORT void oracle_apply_window(float *x960) { apply_window(x960); }

EXPORT void oracle_band_energy(float *bandE, const float *X_ri) {
  kiss_fft_cpx X[FREQ_SIZE];
  int i;
  for (i = 0; i < FREQ_SIZE; i++) { X[i].r = X_ri[2*i]; X[i].i = X_ri[2*i+1]; }
  compute_band_energy(bandE, X);
}

EXPORT void oracle_band_corr(float *bandE, const float *X_ri, const float *P_ri) {
  kiss_fft_cpx X[FREQ_SIZE], P[FREQ_SIZE];
  int i;
  for (i = 0; i < FREQ_SIZE; i++) { X[i].r = X_ri[2*i]; X[i].i = X_ri[2*i+1]; }
  for (i = 0; i < FREQ_SIZE; i++) { P[i].r = P_ri[2*i]; P[i].i = P_ri[2*i+1]; }
  compute_band_corr(bandE, X, P);
}

EXPORT void oracle_interp_band_gain(float *g481, const float *bandE) {
  interp_band_gain(g481, bandE);
}

EXPORT void oracle_dct(float *out32, const float *in32) { dct(out32, in32); }

EXPORT void oracle_pitch_downsample(const float *buf, float *ds) {
  float tmp[PITCH_BUF_SIZE];
  float *pre[1];
  RNN_COPY(tmp, buf, PITCH_BUF_SIZE);
  pre[0] = tmp;
  rnn_pitch_downsample(pre, ds, PITCH_BUF_SIZE, 1);
}

EXPORT int oracle_pitch_search(const float *ds) {
  int pitch_index = 0;
  float tmp[PITCH_BUF_SIZE >> 1];
  RNN_COPY(tmp, ds, PITCH_BUF_SIZE >> 1);
  rnn_pitch_search(tmp + (PITCH_MAX_PERIOD >> 1), tmp, PITCH_FRAME_SIZE,
                   PITCH_MAX_PERIOD - 3 * PITCH_MIN_PERIOD, &pitch_index);
  return pitch_index;
}

EXPORT float oracle_remove_doubling(const float *ds, int *T0,
                                    int prev_period, float prev_gain) {
  float tmp[PITCH_BUF_SIZE >> 1];
  RNN_COPY(tmp, ds, PITCH_BUF_SIZE >> 1);
  return rnn_remove_doubling(tmp, PITCH_MAX_PERIOD, PITCH_MIN_PERIOD,
                             PITCH_FRAME_SIZE, T0, prev_period, prev_gain);
}

/* ---- state accessors ---- */
EXPORT int oracle_state_size(void) { return (int)sizeof(DenoiseState); }
EXPORT float *oracle_pitch_buf(DenoiseState *st) { return st->pitch_buf; }
EXPORT float *oracle_analysis_mem(DenoiseState *st) { return st->analysis_mem; }
EXPORT float *oracle_synthesis_mem(DenoiseState *st) { return st->synthesis_mem; }
EXPORT float *oracle_mem_hp(DenoiseState *st) { return st->mem_hp_x; }
EXPORT float *oracle_lastg(DenoiseState *st) { return st->lastg; }
EXPORT int oracle_last_period(DenoiseState *st) { return st->last_period; }
EXPORT float oracle_last_gain(DenoiseState *st) { return st->last_gain; }
EXPORT RNNState *oracle_rnn_state(DenoiseState *st) { return &st->rnn; }
EXPORT RNNoise *oracle_model(DenoiseState *st) { return &st->model; }
EXPORT int oracle_arch(DenoiseState *st) { return st->arch; }
EXPORT float *oracle_delayed_X(DenoiseState *st) { return (float *)st->delayed_X; }
EXPORT float *oracle_delayed_P(DenoiseState *st) { return (float *)st->delayed_P; }
EXPORT float *oracle_delayed_Ex(DenoiseState *st) { return st->delayed_Ex; }
EXPORT float *oracle_delayed_Ep(DenoiseState *st) { return st->delayed_Ep; }
EXPORT float *oracle_delayed_Exp(DenoiseState *st) { return st->delayed_Exp; }

EXPORT int oracle_frame_features(DenoiseState *st, float *X_ri, float *P_ri,
                                 float *Ex, float *Ep, float *Exp,
                                 float *features, const float *in) {
  kiss_fft_cpx X[FREQ_SIZE], P[FREQ_SIZE];
  int i, silence;
  silence = rnn_compute_frame_features(st, X, P, Ex, Ep, Exp, features, in);
  for (i = 0; i < FREQ_SIZE; i++) { X_ri[2*i] = X[i].r; X_ri[2*i+1] = X[i].i; }
  for (i = 0; i < FREQ_SIZE; i++) { P_ri[2*i] = P[i].r; P_ri[2*i+1] = P[i].i; }
  return silence;
}

EXPORT void oracle_compute_rnn(DenoiseState *st, float *gains, float *vad,
                               const float *features) {
  compute_rnn(&st->model, &st->rnn, gains, vad, features, st->arch);
}

EXPORT void oracle_pitch_filter(float *X_ri, const float *P_ri,
                                const float *Ex, const float *Ep,
                                const float *Exp, const float *g) {
  kiss_fft_cpx X[FREQ_SIZE], P[FREQ_SIZE];
  int i;
  for (i = 0; i < FREQ_SIZE; i++) { X[i].r = X_ri[2*i]; X[i].i = X_ri[2*i+1]; }
  for (i = 0; i < FREQ_SIZE; i++) { P[i].r = P_ri[2*i]; P[i].i = P_ri[2*i+1]; }
  rnn_pitch_filter(X, P, Ex, Ep, Exp, g);
  for (i = 0; i < FREQ_SIZE; i++) { X_ri[2*i] = X[i].r; X_ri[2*i+1] = X[i].i; }
}

EXPORT void oracle_compute_activation(float *output, const float *input,
                                      int N, int activation) {
  compute_activation_c(output, input, N, activation);
}
