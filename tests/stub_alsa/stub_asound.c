/* Hermetic libasound stub (VERDICT r2 item 8).
 *
 * Implements exactly the snd_* surface norma_audio.cpp dlopens (AlsaFns,
 * norma_audio.cpp:269-347) so the PRODUCTION native path — device
 * enumeration, hw-params config negotiation, ranked open, blocking capture
 * reads — executes on hosts with no sound stack at all.  Loaded via the
 * NTA_ALSA_LIB override; built on demand by tests/test_native_stub.py.
 *
 * Fake hardware model: one capture device "stubmic" advertising
 * S16_LE / S32_LE / FLOAT_LE, 1-2 channels, 16-48 kHz.  Reads produce a
 * 440 Hz sine paced to ~real time (so capture loops behave like a mic,
 * not a firehose).
 */

#define _GNU_SOURCE
#include <math.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>
#include <unistd.h>

/* snd_pcm_format_t codes (asound.h) */
#define F_S16_LE 2
#define F_S32_LE 10
#define F_FLOAT_LE 14

#define RATE_MIN 16000u
#define RATE_MAX 48000u
#define CH_MIN 1u
#define CH_MAX 2u

typedef struct {
  int open;
  int format;
  unsigned channels;
  unsigned rate;
  unsigned long phase; /* frames produced so far */
} stub_pcm;

static int fmt_ok(int f) {
  return f == F_S16_LE || f == F_S32_LE || f == F_FLOAT_LE;
}

/* ---- open/close/params ------------------------------------------------- */

int snd_pcm_open(void **pcmp, const char *name, int stream, int mode) {
  (void)mode;
  if (stream != 1) return -22; /* capture only */
  /* "default" always exists on real ALSA; alias it to the stub mic. */
  if (strcmp(name, "stubmic") != 0 && strcmp(name, "null") != 0 &&
      strcmp(name, "default") != 0)
    return -2;
  stub_pcm *p = calloc(1, sizeof(stub_pcm));
  p->open = 1;
  *pcmp = p;
  return 0;
}

int snd_pcm_close(void *pcm) {
  free(pcm);
  return 0;
}

int snd_pcm_set_params(void *pcm, int format, int access, unsigned channels,
                       unsigned rate, int soft_resample, unsigned latency) {
  (void)access;
  (void)soft_resample;
  (void)latency;
  stub_pcm *p = pcm;
  if (!fmt_ok(format)) return -22;
  if (channels < CH_MIN || channels > CH_MAX) return -22;
  if (rate < RATE_MIN || rate > RATE_MAX) return -22;
  p->format = format;
  p->channels = channels;
  p->rate = rate;
  return 0;
}

int snd_pcm_recover(void *pcm, int err, int silent) {
  (void)pcm;
  (void)silent;
  return err; /* nothing recoverable in the stub */
}

/* Presence of snd_pcm_wait makes the capture worker use the nonblocking
 * bounded-wait loop (stop flag stays live); data is always "ready" here —
 * real-time pacing happens inside readi. */
int snd_pcm_wait(void *pcm, int timeout) {
  (void)pcm;
  (void)timeout;
  return 1;
}

/* 440 Hz sine, amplitude 0.5, all channels identical; paced to real time. */
long snd_pcm_readi(void *pcm, void *buffer, unsigned long frames) {
  stub_pcm *p = pcm;
  if (!p->rate) return -77; /* not configured */
  for (unsigned long i = 0; i < frames; ++i) {
    double t = (double)(p->phase + i) / (double)p->rate;
    double s = 0.5 * sin(2.0 * M_PI * 440.0 * t);
    for (unsigned c = 0; c < p->channels; ++c) {
      unsigned long idx = i * p->channels + c;
      if (p->format == F_S16_LE)
        ((int16_t *)buffer)[idx] = (int16_t)(s * 32767.0);
      else if (p->format == F_S32_LE)
        ((int32_t *)buffer)[idx] = (int32_t)(s * 2147483647.0);
      else
        ((float *)buffer)[idx] = (float)s;
    }
  }
  p->phase += frames;
  struct timespec ts;
  uint64_t ns = (uint64_t)frames * 1000000000ull / p->rate;
  ts.tv_sec = ns / 1000000000ull;
  ts.tv_nsec = ns % 1000000000ull;
  nanosleep(&ts, NULL); /* ~real-time pacing */
  return (long)frames;
}

/* ---- device hints ------------------------------------------------------- */

int snd_device_name_hint(int card, const char *iface, void ***hints) {
  (void)card;
  (void)iface;
  /* One capture device; entries are opaque — only get_hint reads them. */
  void **h = calloc(2, sizeof(void *));
  h[0] = (void *)"stubmic";
  h[1] = NULL;
  *hints = h;
  return 0;
}

char *snd_device_name_get_hint(const void *hint, const char *id) {
  if (strcmp(id, "NAME") == 0) return strdup((const char *)hint);
  if (strcmp(id, "IOID") == 0) return strdup("Input");
  if (strcmp(id, "DESC") == 0) return strdup("Stub Microphone");
  return NULL;
}

int snd_device_name_free_hint(void **hints) {
  free(hints);
  return 0;
}

/* ---- hw params enumeration ---------------------------------------------- */

size_t snd_pcm_hw_params_sizeof(void) { return 64; }

int snd_pcm_hw_params_any(void *pcm, void *params) {
  (void)pcm;
  memset(params, 0, 64);
  return 0;
}

int snd_pcm_hw_params_test_format(void *pcm, void *params, int format) {
  (void)pcm;
  (void)params;
  return fmt_ok(format) ? 0 : -22;
}

int snd_pcm_hw_params_get_rate_min(const void *params, unsigned *rate,
                                   int *dir) {
  (void)params;
  if (dir) *dir = 0;
  *rate = RATE_MIN;
  return 0;
}

int snd_pcm_hw_params_get_rate_max(const void *params, unsigned *rate,
                                   int *dir) {
  (void)params;
  if (dir) *dir = 0;
  *rate = RATE_MAX;
  return 0;
}

int snd_pcm_hw_params_get_channels_min(const void *params, unsigned *ch) {
  (void)params;
  *ch = CH_MIN;
  return 0;
}

int snd_pcm_hw_params_get_channels_max(const void *params, unsigned *ch) {
  (void)params;
  *ch = CH_MAX;
  return 0;
}

int snd_pcm_hw_params_test_channels(void *pcm, void *params, unsigned ch) {
  (void)pcm;
  (void)params;
  return (ch >= CH_MIN && ch <= CH_MAX) ? 0 : -22;
}
