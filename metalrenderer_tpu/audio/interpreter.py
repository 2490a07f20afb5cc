"""Musical interpretation — pure-JAX port of MusicalInterpreter.mm and
MusicalContext.hpp.

Maps analyzer output to a ``MusicalContext`` {energy, brightness,
melancholy, dominantPitch, pitchConfidence} with the reference's exact
constants: energy = min(1, rollingAvg*150) (MusicalInterpreter.mm:19);
brightness = treble share of sqrt-boosted bands with boosts 5.0/0.8/1.0
(:23-31); melancholy = 0.6*minor-third-ratio + 0.2*darkness + 0.2*quiet
when pitch is confident, else 0.5/0.5 fallback (:42-77).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from .analyzer import FFT_SIZE, SPECTRUM_SIZE, AnalysisResult

ENERGY_SCALE = 150.0            # MusicalInterpreter.mm:7
PITCH_CONFIDENCE_THRESHOLD = 0.25   # :8
PITCH_MIN = 50.0                # :9
PITCH_MAX = 2000.0              # :10
SPECTRUM_WINDOW_RADIUS = 2      # :11
BASS_BOOST = 5.0                # :23
MID_BOOST = 0.8                 # :24
TREBLE_BOOST = 1.0              # :25
EPS = 1e-6                      # :30


@pytree_dataclass
class MusicalContext:
    energy: jnp.ndarray = 0.5
    brightness: jnp.ndarray = 0.5
    melancholy: jnp.ndarray = 0.5
    dominant_pitch: jnp.ndarray = 0.0
    pitch_confidence: jnp.ndarray = 0.0


def _sum_around_bin(spectrum, center_bin, radius=SPECTRUM_WINDOW_RADIUS):
    """sumAroundBin (MusicalInterpreter.mm:53-61): clamp window to
    [1, size-1] and sum."""
    k = jnp.arange(SPECTRUM_SIZE)
    lo = jnp.maximum(1, center_bin - radius)
    hi = jnp.minimum(SPECTRUM_SIZE - 1, center_bin + radius)
    return jnp.sum(jnp.where((k >= lo) & (k <= hi), spectrum, 0.0))


def interpret(result: AnalysisResult, sample_rate) -> MusicalContext:
    """MusicalInterpreter::interpret (MusicalInterpreter.mm:14-81)."""
    sample_rate = jnp.asarray(sample_rate, jnp.float32)

    energy = jnp.minimum(1.0, result.rolling_avg * ENERGY_SCALE)

    bass = jnp.sqrt(jnp.maximum(0.0, result.bass * BASS_BOOST))
    mid = jnp.sqrt(jnp.maximum(0.0, result.mid * MID_BOOST))
    treble = jnp.sqrt(jnp.maximum(0.0, result.treble * TREBLE_BOOST))
    total = bass + mid + treble
    brightness = jnp.where(total > EPS, treble / jnp.maximum(total, EPS), 0.5)

    pitch = result.pitch_hz
    conf = result.pitch_confidence
    use_pitch = (conf >= PITCH_CONFIDENCE_THRESHOLD) & \
                (pitch >= PITCH_MIN) & (pitch <= PITCH_MAX)

    minor_freq = pitch * (2.0 ** (3.0 / 12.0))
    major_freq = pitch * (2.0 ** (4.0 / 12.0))
    to_bin = lambda f: (f * FFT_SIZE / sample_rate).astype(jnp.int32)
    minor_e = _sum_around_bin(result.spectrum, to_bin(minor_freq))
    major_e = _sum_around_bin(result.spectrum, to_bin(major_freq))
    ratio = minor_e / (major_e + minor_e + EPS)
    mel_pitch = jnp.clip(
        0.6 * ratio + 0.2 * (1.0 - brightness) + 0.2 * (1.0 - energy),
        0.0, 1.0)
    mel_fallback = 0.5 * (1.0 - brightness) + 0.5 * (1.0 - energy)
    melancholy = jnp.where(use_pitch, mel_pitch, mel_fallback)

    return MusicalContext(
        energy=energy, brightness=brightness, melancholy=melancholy,
        dominant_pitch=pitch, pitch_confidence=conf,
    )
