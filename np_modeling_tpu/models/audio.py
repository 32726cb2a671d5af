"""Audio frontend: Whisper's log-mel spectrogram, in jnp.

Raw 16 kHz waveform -> the [frames, n_mels] log-mel features
models.Whisper consumes — so speech-to-text runs end-to-end in this
framework with no external feature extractor. Matches
``transformers.WhisperFeatureExtractor`` (itself 1e-5-equal to the
original torch implementation): centered reflect-padded STFT (hann 400,
hop 160), power spectrum, slaney-scale/slaney-norm mel filterbank,
log10, per-clip floor at max-8, then (x + 4) / 4.

This is input PREPROCESSING (no gradient path — the model's first
trainable op is the conv stem), so it lives beside the model rather
than in ops/ (whose invariant is a hand-written VJP per op).
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp


def _hz_to_mel_slaney(f):
    """Slaney mel scale: linear below 1 kHz, log above."""
    f = np.asarray(f, np.float64)
    min_log_hz = 1000.0
    min_log_mel = 15.0                      # 3 * 1000 / 200
    logstep = 27.0 / np.log(6.4)
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(f / min_log_hz) * logstep,
                    3.0 * f / 200.0)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    1000.0 * np.exp(logstep * (m - min_log_mel)),
                    200.0 * m / 3.0)


@functools.lru_cache(maxsize=4)
def mel_filter_bank(n_freqs: int = 201, n_mels: int = 80,
                    sampling_rate: int = 16000, fmin: float = 0.0,
                    fmax: float = 8000.0) -> np.ndarray:
    """[n_freqs, n_mels] triangular slaney-scale filterbank with slaney
    area normalization (what Whisper/librosa use); fp32 numpy, cached."""
    fft_freqs = np.linspace(0.0, sampling_rate / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax),
                          n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)                 # [n_mels + 2]
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[None, :] - fft_freqs[:, None]        # [n_freqs, m + 2]
    lower = -ramps[:, :-2] / fdiff[None, :-1]
    upper = ramps[:, 2:] / fdiff[None, 1:]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])            # slaney norm
    return (fb * enorm[None, :]).astype(np.float32)


def log_mel_spectrogram(audio, n_fft: int = 400, hop_length: int = 160,
                        n_mels: int = 80, sampling_rate: int = 16000):
    """[b, n_samples] (or [n_samples]) raw waveform -> [b, frames, n_mels]
    Whisper-normalized log-mel features (time-major — feed straight into
    ``models.Whisper.encode``). ``frames == n_samples // hop_length``
    (the trailing STFT frame is dropped, as Whisper does); pad or trim
    the waveform to ``2 * num_audio_positions * hop_length`` samples
    first (30 s = 480000 at 16 kHz for the published checkpoints)."""
    x = jnp.asarray(audio, jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")   # centered STFT
    n_frames = 1 + (x.shape[-1] - n_fft) // hop_length
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(n_fft)[None, :])
    frames = x[:, idx]                                  # [b, frames, n_fft]
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    spec = jnp.abs(jnp.fft.rfft(frames * window, axis=-1)) ** 2
    fb = jnp.asarray(mel_filter_bank(n_fft // 2 + 1, n_mels, sampling_rate))
    mel = jnp.einsum("btf,fm->btm", spec, fb)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = log_spec[:, :-1]                         # drop the last frame
    floor = jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    log_spec = (jnp.maximum(log_spec, floor) + 4.0) / 4.0
    return log_spec[0] if squeeze else log_spec
