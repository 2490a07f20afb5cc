"""Audio analysis pipeline — pure-JAX port of AudioAnalyzer.{hpp,mm}.

The reference taps the microphone on a CoreAudio real-time thread and
updates shared state read (racily, SURVEY.md §3.3) by the render thread.
Here analysis is a pure function over 1024-sample chunks with an explicit
state pytree — the race is eliminated by construction, and a whole WAV
file analyzes as one ``lax.scan`` (one XLA program).

Faithful semantics (citations):
  * RMS over all channels (AudioAnalyzer.mm:49-65).
  * rollingAvg is the 120-entry window average BEFORE pushing the current
    chunk's RMS (processBuffer order, AudioAnalyzer.mm:28-31).
  * Spectrum: 1024-pt Hann(normalized)-windowed real FFT via vDSP
    ``fft_zrip`` whose packed output is 2x the mathematical DFT, then
    scaled by 2/N (AudioAnalyzer.mm:67-96) => magnitude[k] = 4|DFT_k|/N.
    (Bin 0 in the reference mixes DC and Nyquist through the packed
    format and bin 512 reads out of bounds; neither bin is consumed by
    any downstream feature, and here they are the plain |DFT| values.)
  * Band energies bass<155 Hz, mid<880, treble<4186, EMA alpha = 0.15
    (AudioAnalyzer.mm:102-127, AudioAnalyzer.hpp:61).
  * Pitch: normalized autocorrelation over the WINDOWED buffer, lag range
    sr/1500..sr/50, confidence = best correlation, first-strict-max wins
    (AudioAnalyzer.mm:129-166). Implemented with an FFT autocorrelation +
    prefix sums — identical sums up to f32 rounding, all MXU/VPU work.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass

FFT_SIZE = 1024            # AudioAnalyzer.hpp:58
SPECTRUM_SIZE = FFT_SIZE // 2 + 1
ROLLING_WINDOW = 120       # RollingAverage default (AudioAnalyzer.hpp:22)
BAND_SMOOTH_ALPHA = 0.15   # AudioAnalyzer.hpp:61
BASS_HIGH_HZ = 155.0
MID_HIGH_HZ = 880.0
TREBLE_HIGH_HZ = 4186.0
PITCH_MIN_HZ = 50.0
PITCH_MAX_HZ = 1500.0


def hann_norm_window(n=FFT_SIZE):
    """vDSP_HANN_NORM: periodic Hann scaled to unit RMS (factor
    sqrt(8/3) ~= 1.633)."""
    i = jnp.arange(n, dtype=jnp.float32)
    return jnp.sqrt(8.0 / 3.0) * 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * i / n))


@pytree_dataclass
class AnalyzerState:
    """Cross-chunk carry (the reference's mutable analyzer fields)."""

    rolling: jnp.ndarray        # f32[120] ring buffer of RMS values
    rolling_idx: jnp.ndarray    # i32 next write slot
    rolling_count: jnp.ndarray  # i32 filled entries
    rolling_sum: jnp.ndarray    # f32 running sum
    smoothed_bass: jnp.ndarray  # f32 EMA state
    smoothed_mid: jnp.ndarray
    smoothed_treble: jnp.ndarray

    @staticmethod
    def init():
        z = jnp.zeros((), jnp.float32)
        return AnalyzerState(
            rolling=jnp.zeros((ROLLING_WINDOW,), jnp.float32),
            rolling_idx=jnp.zeros((), jnp.int32),
            rolling_count=jnp.zeros((), jnp.int32),
            rolling_sum=z, smoothed_bass=z, smoothed_mid=z,
            smoothed_treble=z,
        )


@pytree_dataclass
class AnalysisResult:
    """Per-chunk features (AudioFeatures + BandEnergies + pitch + spectrum)."""

    rms: jnp.ndarray
    rolling_avg: jnp.ndarray
    spectrum: jnp.ndarray       # f32[513] magnitudes
    bass: jnp.ndarray           # EMA-smoothed band energies
    mid: jnp.ndarray
    treble: jnp.ndarray
    pitch_hz: jnp.ndarray
    pitch_confidence: jnp.ndarray


def _rolling_push(state: AnalyzerState, value):
    """RollingAverage::push (AudioAnalyzer.hpp:37-49): append until full,
    then overwrite round-robin."""
    full = state.rolling_count >= ROLLING_WINDOW
    slot = jnp.where(full, state.rolling_idx, state.rolling_count)
    old = state.rolling[slot]
    rolling = state.rolling.at[slot].set(value)
    new_sum = state.rolling_sum + value - jnp.where(full, old, 0.0)
    return state.replace(
        rolling=rolling,
        rolling_sum=new_sum,
        rolling_count=jnp.minimum(state.rolling_count + 1, ROLLING_WINDOW),
        rolling_idx=jnp.where(
            full, (state.rolling_idx + 1) % ROLLING_WINDOW,
            state.rolling_idx),
    )


def compute_spectrum(samples, window=None):
    """Windowed magnitudes, vDSP-zrip-scaled: 4|DFT_k|/N. samples: f32[1024]."""
    if window is None:
        window = hann_norm_window()
    windowed = samples * window
    fft = jnp.fft.rfft(windowed)
    return (4.0 / FFT_SIZE) * jnp.abs(fft).astype(jnp.float32), windowed


def band_energies(spectrum, sample_rate):
    """Raw band sums (AudioAnalyzer.mm:102-127). Bin ranges depend on the
    (traced) sample rate -> masked reductions over the static 513 bins."""
    n = SPECTRUM_SIZE
    max_bin = n - 1
    bass_end = jnp.clip((BASS_HIGH_HZ * FFT_SIZE / sample_rate)
                        .astype(jnp.int32), 1, max_bin)
    mid_end = jnp.clip((MID_HIGH_HZ * FFT_SIZE / sample_rate)
                       .astype(jnp.int32), bass_end, max_bin)
    treble_end = jnp.clip((TREBLE_HIGH_HZ * FFT_SIZE / sample_rate)
                          .astype(jnp.int32), mid_end, max_bin)
    k = jnp.arange(n)
    bass = jnp.sum(jnp.where((k >= 1) & (k <= bass_end), spectrum, 0.0))
    mid = jnp.sum(jnp.where((k > bass_end) & (k <= mid_end), spectrum, 0.0))
    treble = jnp.sum(jnp.where((k > mid_end) & (k <= treble_end),
                               spectrum, 0.0))
    return bass, mid, treble


def pitch_mpm(windowed, sample_rate):
    """Normalized autocorrelation pitch (AudioAnalyzer.mm:129-166).

    For each lag: corr = sum(x_i x_{i+lag}) / sqrt(sum_{i<N-lag} x_i^2 *
    sum_{i>=lag} x_i^2). The O(lags*N) reference loop becomes one FFT
    autocorrelation + two prefix sums.
    """
    n = FFT_SIZE
    x = windowed
    # Autocorrelation via zero-padded FFT (exact sumXY up to fp rounding).
    f = jnp.fft.rfft(x, 2 * n)
    ac = jnp.fft.irfft(f * jnp.conj(f), 2 * n)[:n].astype(jnp.float32)

    c = jnp.cumsum(x * x)
    total = c[n - 1]
    lags = jnp.arange(n)
    sum_x2 = c[jnp.clip(n - lags - 1, 0, n - 1)]          # i < N-lag
    sum_y2 = total - jnp.where(lags > 0, c[jnp.clip(lags - 1, 0, n - 1)], 0.0)

    denom = jnp.sqrt(sum_x2 * sum_y2)
    corr = jnp.where(denom > 1e-10, ac / jnp.maximum(denom, 1e-30), 0.0)

    min_lag = jnp.maximum((sample_rate / PITCH_MAX_HZ).astype(jnp.int32), 1)
    max_lag = jnp.minimum((sample_rate / PITCH_MIN_HZ).astype(jnp.int32),
                          n - 1)
    in_range = (lags >= min_lag) & (lags <= max_lag)
    corr_m = jnp.where(in_range, corr, -jnp.inf)
    best_lag = jnp.argmax(corr_m)          # first strict max, like the loop
    best_corr = corr_m[best_lag]

    valid = min_lag < max_lag
    pitch = jnp.where(valid, sample_rate / best_lag.astype(jnp.float32), 0.0)
    conf = jnp.where(valid, jnp.clip(best_corr, 0.0, 1.0), 0.0)
    return pitch, conf


def process_chunk(state: AnalyzerState, samples, sample_rate,
                  window=None):
    """One 1024-frame buffer through the full pipeline.

    samples: f32[1024] mono or f32[C, 1024] multichannel (RMS uses all
    channels; spectrum/pitch use channel 0, AudioAnalyzer.mm:71-73).
    Returns (new_state, AnalysisResult).
    """
    samples = jnp.asarray(samples, jnp.float32)
    multi = samples.ndim == 2
    ch0 = samples[0] if multi else samples
    sample_rate = jnp.asarray(sample_rate, jnp.float32)

    rms = jnp.sqrt(jnp.mean(jnp.square(samples)))
    rolling_avg = jnp.where(state.rolling_count > 0,
                            state.rolling_sum /
                            jnp.maximum(state.rolling_count, 1), 0.0)
    state = _rolling_push(state, rms)

    spectrum, windowed = compute_spectrum(ch0, window)
    pitch, conf = pitch_mpm(windowed, sample_rate)

    b, m, t = band_energies(spectrum, sample_rate)
    a = BAND_SMOOTH_ALPHA
    sb = a * b + (1 - a) * state.smoothed_bass
    sm = a * m + (1 - a) * state.smoothed_mid
    st = a * t + (1 - a) * state.smoothed_treble
    state = state.replace(smoothed_bass=sb, smoothed_mid=sm,
                          smoothed_treble=st)

    return state, AnalysisResult(
        rms=rms, rolling_avg=rolling_avg, spectrum=spectrum,
        bass=sb, mid=sm, treble=st,
        pitch_hz=pitch, pitch_confidence=conf,
    )


def analyze_stream(samples, sample_rate, state: AnalyzerState = None):
    """Analyze a whole signal: frames of 1024, one lax.scan (no per-chunk
    host round-trips). samples: f32[num_frames*1024] (trailing remainder
    dropped, like the reference's frameLength check at AudioAnalyzer.mm:69).
    Returns (final_state, AnalysisResult with leading time axis)."""
    samples = jnp.asarray(samples, jnp.float32)
    n_chunks = samples.shape[0] // FFT_SIZE
    chunks = samples[:n_chunks * FFT_SIZE].reshape(n_chunks, FFT_SIZE)
    if state is None:
        state = AnalyzerState.init()
    window = hann_norm_window()

    def step(st, chunk):
        return process_chunk(st, chunk, sample_rate, window)

    return jax.lax.scan(step, state, chunks)
