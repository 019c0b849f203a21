/* C ABI of the audio-to-midi native host data plane.
 *
 * TPU-native replacement for the reference's Rust plugin
 * (rust-plugins/src/{python.rs,common.rs,cbinds.rs}): codec decode, loudness
 * normalization, f16 sample cache, CSV label parsing, frame rasterization,
 * train-time augmentations, crossfade stitching, eventization, and the
 * mobile-facing extract_midi_events ABI (cbinds.rs:52-91).
 *
 * All functions return 0 on success and a negative errno-style code on
 * failure unless documented otherwise.  Buffers returned through out-params
 * are owned by the caller and released with a2m_free().
 */

#ifndef A2M_NATIVE_H
#define A2M_NATIVE_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ------------------------------------------------------------------ memory */
void a2m_free(void *ptr);

/* ------------------------------------------------------------- audio I/O */
/* Decode WAV/AIFF to planar stereo f32 at `sample_rate` (resampled with a
 * polyphase windowed-sinc), WITHOUT loudness normalization.
 * *out has layout [2][*out_len]. */
int a2m_decode_audio(const char *path, int sample_rate, float **out,
                     int64_t *out_len);

/* Loudness-normalize planar stereo in place: unit variance over both
 * channels unless peak <= 0.05 (python.rs:236-264). */
void a2m_normalize_loudness(float *samples, int64_t len);

/* Decode + normalize + f16 disk cache (env SAMPLE_CACHE_DIR,
 * sha256(path)[:30]_{rate} sharded by 4 hex chars; python.rs:282-371).
 * Values round through f16 exactly as a cache hit would. */
int a2m_load_audio_sample(const char *path, int sample_rate, int skip_cache,
                          float **out, int64_t *out_len);

/* Same, but the result stays in the reference's f16 decode dtype — the
 * host->device wire format for serving (a cache hit is a plain memcpy).
 * *out has layout [2][*out_len] of IEEE binary16. */
int a2m_load_audio_sample_f16(const char *path, int sample_rate,
                              int skip_cache, uint16_t **out,
                              int64_t *out_len);

/* Bulk IEEE binary16 <-> binary32 conversion (F16C where available, scalar
 * fallback; round-to-nearest-even both ways). */
void a2m_f16_to_f32_buf(const uint16_t *src, float *dst, int64_t n);
void a2m_f32_to_f16_buf(const float *src, uint16_t *dst, int64_t n);

/* ------------------------------------------------------------- labels */
/* Parse `time,duration,key,velocity` CSV (no header, '%' comments, first
 * data row skipped) into quantized events; *events has 4*(*n) int32s:
 * (attack_frame, key, duration_frames, velocity).  python.rs:39-103. */
int a2m_parse_events_csv(const char *path, double duration_per_frame,
                         int32_t **events, int64_t *n);

/* Dense (num_frames, num_keys) f32 raster of an event list with the decay
 * envelope max(exp(-0.05 t), 0.6) and the pre-attack separator zero
 * (python.rs:423-447).  `out` must hold num_frames*num_keys floats. */
int a2m_rasterize(const int32_t *events, int64_t n_events, int32_t num_frames,
                  int32_t start_frame, int32_t backing_frames,
                  int32_t num_keys, float *out);

/* ------------------------------------------------------- augmentations */
/* Settings order matches DatasetTransfromSettings (python.rs:838-920):
 * pan, channel_switch, cut, rotate, random_erasing, mixup, gain, noise,
 * label_smoothing_alpha.  pan_parity!=0 reproduces the reference bug of
 * using channel_switch_probability for pan (python.rs:923).
 * audio: [batch][2][n_samples], labels: [batch][n_frames][n_keys]. */
int a2m_transform_for_training(float *audio, float *labels, int64_t batch,
                               int64_t n_samples, int64_t n_frames,
                               int64_t n_keys, const double *settings9,
                               int pan_parity, uint64_t seed);

/* ------------------------------------------------------------- stitching */
/* (windows, fpw, keys) f32 -> (*out_frames, keys) f32 with linear crossfade
 * in the overlap region (common.rs:13-45). */
int a2m_stitch_probs(const float *probs, int64_t windows, int64_t fpw,
                     int64_t keys, double overlap, double duration_per_frame,
                     float **out, int64_t *out_frames);

/* ------------------------------------------------------------ eventizer */
/* (frames, keys) f32 -> sorted events, 4 uint32 each:
 * (attack, key, duration, velocity) (common.rs:47-144). */
int a2m_extract_events(const float *probs, int64_t frames, int64_t keys,
                       uint32_t **events, int64_t *n);

/* ---------------------------------------------------- mobile C ABI (N10) */
typedef struct {
  uint64_t attack_time;
  uint8_t note;
  uint64_t duration;
  uint8_t velocity;
} A2mMidiEvent;

typedef struct {
  A2mMidiEvent *ptr;
  size_t length;
  size_t capacity;
} A2mMidiEventList;

typedef struct {
  uint64_t strides[3]; /* in elements */
  uint64_t dims[3];
  const uint8_t *data; /* f16 payload */
} A2mMultiArray3;

/* Stitch + eventize CoreML output (f16, possibly strided).  Caller frees
 * with free_midi_events. */
A2mMidiEventList *extract_midi_events(A2mMultiArray3 data, double overlap,
                                      double duration_per_frame);
void free_midi_events(A2mMidiEventList *list);

#ifdef __cplusplus
}
#endif

#endif /* A2M_NATIVE_H */
