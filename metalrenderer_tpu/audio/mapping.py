"""Audio -> visual mapping: pitch-to-hue light color, peak-hold brightness
envelope, vertex displacement scalar.

Pure-JAX port of the per-frame logic in
MtlEngine::updateSharedTransformData (mtl_engine.mm:715-762) and hueToRGB
(mtl_engine.mm:10-25), with the reference's exact constants:

  * hue = semitones-from-A1(55 Hz)/12 + 0.08*(1-melancholy), wrapped,
    gated by rms > 0.003, confidence >= 0.25, 50..2000 Hz; low-confidence
    fallback hue 0.55 + 0.15*(1-melancholy); silence -> gray 1/3.
  * brightness envelope: instant attack to min(1, (0.7*energy +
    0.3*brightness)*3), decay *0.96, floor 0.08 (mtl_engine.mm:745-752,
    mtl_engine.hpp:158-159 initial 0.3).
  * lightColor = hueRGB * brightness; displacement = rollingAvg * 25
    (mtl_engine.mm:753, :761).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from .interpreter import MusicalContext

REF_FREQ = 55.0                  # kRefFreq (mtl_engine.mm:719)
CONFIDENCE_THRESHOLD = 0.25      # :720
VOLUME_THRESHOLD = 0.003         # :721
MIN_PITCH = 50.0                 # :722
MAX_PITCH = 2000.0               # :723
BRIGHTNESS_FLOOR = 0.08          # :745
DECAY_FACTOR = 0.96              # :746
DISPLACEMENT_SCALE = 25.0        # :761
INITIAL_ENVELOPE = 0.3           # mtl_engine.hpp:159


def hue_to_rgb(hue):
    """hueToRGB (mtl_engine.mm:10-25): six-sector piecewise map."""
    h = hue * 6.0
    i = jnp.floor(h).astype(jnp.int32) % 6
    f = h - jnp.floor(h)
    q = 1.0 - f
    t = f
    one = jnp.ones_like(f)
    zero = jnp.zeros_like(f)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [one, q, zero, zero, t, one], one / 3)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, one, one, q, zero, zero], one / 3)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [zero, zero, t, one, one, q], one / 3)
    return jnp.stack([r, g, b], axis=-1)


@pytree_dataclass
class VisualState:
    """Cross-frame carry: the peak-hold brightness envelope."""

    brightness_envelope: jnp.ndarray = INITIAL_ENVELOPE

    @staticmethod
    def init():
        return VisualState(
            brightness_envelope=jnp.asarray(INITIAL_ENVELOPE, jnp.float32))


@pytree_dataclass
class VisualParams:
    """Per-frame scene parameters derived from audio."""

    light_color: jnp.ndarray     # f32[3]
    light_intensity: jnp.ndarray  # f32 (the envelope brightness)
    displacement: jnp.ndarray    # f32 vertex displacement scalar


def map_audio_to_visual(state: VisualState, ctx: MusicalContext,
                        rms, rolling_avg):
    """mtl_engine.mm:715-762. Returns (new_state, VisualParams)."""
    rms = jnp.asarray(rms, jnp.float32)
    rolling_avg = jnp.asarray(rolling_avg, jnp.float32)

    # Pitched hue.
    semitones = 12.0 * jnp.log2(
        jnp.maximum(ctx.dominant_pitch, 1e-6) / REF_FREQ)
    hue_p = semitones / 12.0 + 0.08 * (1.0 - ctx.melancholy)
    hue_p = jnp.mod(hue_p, 1.0)
    hue_p = jnp.where(hue_p < 0.0, hue_p + 1.0, hue_p)
    # Unpitched fallback hue.
    hue_f = 0.55 + 0.15 * (1.0 - ctx.melancholy)
    hue_f = jnp.where(hue_f > 1.0, hue_f - 1.0, hue_f)

    pitched = (ctx.pitch_confidence >= CONFIDENCE_THRESHOLD) & \
              (ctx.dominant_pitch >= MIN_PITCH) & \
              (ctx.dominant_pitch <= MAX_PITCH)
    rgb = jnp.where(pitched, hue_to_rgb(hue_p), hue_to_rgb(hue_f))
    gray = jnp.full((3,), 1.0 / 3.0, jnp.float32)
    rgb = jnp.where(rms > VOLUME_THRESHOLD, rgb, gray)

    raw = jnp.minimum(1.0, (ctx.energy * 0.7 + ctx.brightness * 0.3) * 3.0)
    envelope = jnp.maximum(raw, state.brightness_envelope * DECAY_FACTOR)
    brightness = jnp.maximum(BRIGHTNESS_FLOOR, envelope)

    return VisualState(brightness_envelope=envelope), VisualParams(
        light_color=rgb * brightness,
        light_intensity=brightness,
        displacement=rolling_avg * DISPLACEMENT_SCALE,
    )
