"""Frame-loop engine: the TPU-native counterpart of MtlEngine::run.

The reference's per-frame loop (mtl_engine.mm:68-87) interleaves host-side
uniform rebuilds with two blocking GPU submissions. Here the whole
audio-reactive sequence — analysis, musical interpretation, audio->visual
mapping, scene update, shadow pass, main pass, MSAA resolve — compiles
into ONE XLA program over a batch of frames (zero host round-trips,
north-star requirement), optionally sharded across devices
(parallel/sharding.py).

Frame cadence matches the reference's data flow: one 1024-sample audio
chunk produces one frame's worth of scene parameters (the audio tap fires
every ~21 ms at 48 kHz, SURVEY.md §3.3).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..audio import analyzer, interpreter, mapping
from ..config import RenderConfig, ShadowConfig
from ..passes.pipeline import render_frame
from ..scene.lights import Lighting, PointLight
from . import audio_app


def audio_visual_track(samples, sample_rate,
                       analyzer_state: analyzer.AnalyzerState = None,
                       visual_state: mapping.VisualState = None):
    """Audio samples -> per-frame VisualParams (batched over frames).

    Runs the full L5 pipeline (AudioAnalyzer -> MusicalInterpreter ->
    updateSharedTransformData mapping) as two scans. Returns
    (analyzer_state, visual_state, VisualParams[batch], MusicalContext[batch]).
    """
    sample_rate = jnp.asarray(sample_rate, jnp.float32)
    a_state, results = analyzer.analyze_stream(samples, sample_rate,
                                               analyzer_state)
    ctxs = jax.vmap(lambda r: interpreter.interpret(r, sample_rate))(results)

    if visual_state is None:
        visual_state = mapping.VisualState.init()

    def env_step(vs, inp):
        ctx, rms, ravg = inp
        return mapping.map_audio_to_visual(vs, ctx, rms, ravg)

    v_state, params = jax.lax.scan(
        env_step, visual_state, (ctxs, results.rms, results.rolling_avg))
    return a_state, v_state, params, ctxs


# One jitted entry shared by the offline sequence and the streaming
# chunks: per-frame numerics are identical either way (the scan body is
# trip-count-invariant), and repeated chunk calls hit the jit cache
# instead of re-tracing the whole analysis pipeline every chunk.
_track_jit = jax.jit(audio_visual_track)


def render_camera_path(scene, lighting, key_poses, frames_per_segment=8,
                       config: RenderConfig = RenderConfig(),
                       shadow_config: ShadowConfig = ShadowConfig(),
                       displacement=0.0, shadow_target=(0.0, 0.0, 0.0),
                       backend="pallas"):
    """Camera flythrough: quaternion-slerp between key poses, one compiled
    program for the whole sequence. Returns f32[F, H, W, 4] with
    F = (len(key_poses) - 1) * frames_per_segment + 1.

    ``key_poses``: sequence of PoseCamera (or OrbitCamera, converted via
    .pose()). Orientation interpolates on the quaternion sphere
    (AAPLMathUtilities.h:242 semantics) so the camera never gimbal-flips
    between keys.
    """
    from ..scene.camera import PoseCamera

    poses = [p if isinstance(p, PoseCamera) else p.pose() for p in key_poses]
    if len(poses) < 2:
        raise ValueError("need at least two key poses")
    # Stack keys into one batched pytree; per-frame (segment, t) indices.
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *poses)
    n_seg = len(poses) - 1
    fps = frames_per_segment
    idx = jnp.arange(n_seg * fps + 1)
    seg = jnp.minimum(idx // fps, n_seg - 1)
    t = (idx - seg * fps).astype(jnp.float32) / fps

    def frame_cam(s, tt):
        a = jax.tree.map(lambda x: x[s], stacked)
        b = jax.tree.map(lambda x: x[s + 1], stacked)
        return a.slerp(b, tt)

    from ..passes.pipeline import (fused_batch_eligible, px_batch_eligible,
                                   render_frame_batch_fused,
                                   render_frame_batch_px)
    if backend == "pallas" and (fused_batch_eligible(scene, lighting, config)
                                or px_batch_eligible(scene, lighting,
                                                     config)):
        # Batched serving shape: slerp all poses (vmapped), render the
        # whole flythrough in a fixed number of kernel launches.
        cams = jax.vmap(frame_cam)(seg, t)
        nf = seg.shape[0]
        disps = jnp.full((nf,), displacement, jnp.float32)
        zeros = jnp.zeros((nf,), jnp.float32)
        batch_fn = (render_frame_batch_fused
                    if fused_batch_eligible(scene, lighting, config)
                    else render_frame_batch_px)
        fb, _ = batch_fn(scene, poses[0], lighting, config, shadow_config,
                         disps, zeros, shadow_target=shadow_target,
                         cameras=cams)
        return fb

    def frame(inp):
        s, tt = inp
        cam = frame_cam(*inp)
        fb, _ = render_frame(scene, cam, lighting, config, shadow_config,
                             displacement, shadow_target, backend)
        return fb

    return jax.lax.map(frame, (seg, t))


def stream_audio_reactive(samples, sample_rate, chunk_frames=16,
                          camera=None,
                          cube_position=(0.0, 0.0, -1.0),
                          light_position=(0.0, 2.0, 0.0),
                          config: RenderConfig = RenderConfig(),
                          shadow_config: ShadowConfig = ShadowConfig(),
                          backend="pallas"):
    """Streaming serving mode: yield rendered frames as audio arrives.

    The faithful analog of the reference's live path — the CoreAudio tap
    delivers a 1024-sample buffer every ~21 ms @48 kHz
    (AudioInputLayer.mm:22, SURVEY.md §3.3) and each buffer drives one
    frame. Here ``chunk_frames`` buffers are batched per render (bounded
    latency = chunk_frames x 21 ms of audio + one program dispatch) and
    every chunk reuses the SAME compiled batch program (static shapes).

    Analyzer/visual state carries across chunks (lax.scan is causal), so
    the concatenated stream output equals the offline
    render_audio_reactive_sequence exactly.

    Yields (frames f32[<=chunk_frames, H, W, 4], telemetry dict) per
    chunk; the last chunk is zero-padded for compile reuse and trimmed
    before yielding.
    """
    from ..passes.pipeline import (fused_batch_eligible,
                                   render_frame_batch_fused)

    if camera is None:
        camera = audio_app.default_camera(config.width, config.height)
    cube_position = jnp.asarray(cube_position, jnp.float32)
    light_position = jnp.asarray(light_position, jnp.float32)

    def scene_of(p: mapping.VisualParams):
        return audio_app.build_scene(cube_position, light_position,
                                     p.light_color)

    def lighting_of(p: mapping.VisualParams):
        return Lighting(
            light=PointLight(position=light_position, color=p.light_color,
                             intensity=p.light_intensity),
            ambient_intensity=jnp.asarray(0.1, jnp.float32),
            shininess=jnp.asarray(32.0, jnp.float32),
        )

    samples = jnp.asarray(samples, jnp.float32)
    chunk_samples = chunk_frames * analyzer.FFT_SIZE
    n_frames = samples.shape[0] // analyzer.FFT_SIZE
    if n_frames == 0:
        return

    # Per-chunk programs are built ONCE (jit caches key on function
    # identity): fresh closures inside the loop would re-trace — and on
    # this platform potentially re-compile — every chunk, breaking the
    # bounded-latency contract for the non-fused path.
    sample_rate = jnp.asarray(sample_rate, jnp.float32)
    a_state = analyzer.AnalyzerState.init()
    v_state = mapping.VisualState.init()
    render_chunk = None
    for start in range(0, n_frames, chunk_frames):
        nf = min(chunk_frames, n_frames - start)
        block = samples[start * analyzer.FFT_SIZE:
                        start * analyzer.FFT_SIZE + nf * analyzer.FFT_SIZE]
        if nf < chunk_frames:   # pad the tail for compile reuse
            block = jnp.pad(block, (0, chunk_samples - block.shape[0]))
        a_state, v_state, params, ctxs = _track_jit(
            block, sample_rate, a_state, v_state)

        if render_chunk is None:
            template = jax.tree.map(lambda x: x[0], params)
            use_fused = (backend == "pallas" and fused_batch_eligible(
                scene_of(template), lighting_of(template), config, camera))
            if use_fused:
                # Raw call, exactly like the offline sequence's fused
                # branch (same ops -> bit-identical): the Pallas
                # kernels dominate and their executables are cached;
                # only the thin prep re-traces per chunk.
                def render_chunk(params):
                    rgba, _ = render_frame_batch_fused(
                        scene_of(template), camera, lighting_of(template),
                        config, shadow_config, params.displacement,
                        jnp.full((chunk_frames,), camera.theta,
                                 jnp.float32),
                        shadow_target=cube_position,
                        scene_fn=scene_of, lighting_fn=lighting_of,
                        frame_params=params)
                    return rgba
            else:
                @jax.jit
                def render_chunk(params):
                    def frame(p: mapping.VisualParams):
                        fb, _ = render_frame(
                            scene_of(p), camera, lighting_of(p),
                            config, shadow_config, p.displacement,
                            cube_position, backend)
                        return fb

                    return jax.lax.map(frame, params)

        frames = render_chunk(params)
        telemetry = {
            "light_color": params.light_color[:nf],
            "light_intensity": params.light_intensity[:nf],
            "displacement": params.displacement[:nf],
            "energy": ctxs.energy[:nf],
            "brightness": ctxs.brightness[:nf],
            "melancholy": ctxs.melancholy[:nf],
            "pitch_hz": ctxs.dominant_pitch[:nf],
            "pitch_confidence": ctxs.pitch_confidence[:nf],
        }
        yield frames[:nf], telemetry


def render_audio_reactive_sequence(
        samples, sample_rate,
        camera=None,
        cube_position=(0.0, 0.0, -1.0),
        light_position=(0.0, 2.0, 0.0),
        config: RenderConfig = RenderConfig(),
        shadow_config: ShadowConfig = ShadowConfig(),
        backend="pallas", max_frames=None):
    """WAV/array in, frame stack out: f32[F, H, W, 4] plus telemetry.

    Equivalent to running the reference app against recorded audio: the
    light cube's color/brightness follow pitch/spectrum and the main
    cube's vertices pulse with loudness (mtl_engine.mm:715-762).
    """
    if camera is None:
        camera = audio_app.default_camera(config.width, config.height)

    _, _, params, ctxs = _track_jit(
        samples, jnp.asarray(sample_rate, jnp.float32),
        analyzer.AnalyzerState.init(), mapping.VisualState.init())
    if max_frames is not None:
        params = jax.tree.map(lambda x: x[:max_frames], params)
        ctxs = jax.tree.map(lambda x: x[:max_frames], ctxs)

    cube_position = jnp.asarray(cube_position, jnp.float32)
    light_position = jnp.asarray(light_position, jnp.float32)

    def scene_of(p: mapping.VisualParams):
        return audio_app.build_scene(cube_position, light_position,
                                     p.light_color)

    def lighting_of(p: mapping.VisualParams):
        return Lighting(
            light=PointLight(position=light_position, color=p.light_color,
                             intensity=p.light_intensity),
            ambient_intensity=jnp.asarray(0.1, jnp.float32),
            shininess=jnp.asarray(32.0, jnp.float32),
        )

    from ..passes.pipeline import fused_batch_eligible
    template0 = jax.tree.map(lambda x: x[0], params)
    fused_batch_ok = (
        backend == "pallas"
        and fused_batch_eligible(scene_of(template0),
                                 lighting_of(template0), config, camera))
    if fused_batch_ok:
        # Serving shape: the whole sequence in two kernel launches
        # (batched shadow pass + frame-folded fused raster/shade) with
        # per-frame audio-driven scene/lighting.
        from ..passes.pipeline import render_frame_batch_fused
        nf = params.displacement.shape[0]
        frames, _ = render_frame_batch_fused(
            scene_of(template0), camera, lighting_of(template0),
            config, shadow_config, params.displacement,
            jnp.full((nf,), camera.theta, jnp.float32),
            shadow_target=cube_position,
            scene_fn=scene_of, lighting_fn=lighting_of,
            frame_params=params)
    else:
        def frame(p: mapping.VisualParams):
            fb, _ = render_frame(scene_of(p), camera, lighting_of(p),
                                 config, shadow_config,
                                 p.displacement, cube_position, backend)
            return fb

        # Same jit(map(frame)) shape as the stream's per-chunk program:
        # per-frame numerics are trip-count-invariant, which is what
        # keeps stream == offline bit-exact.
        frames = jax.jit(lambda ps: jax.lax.map(frame, ps))(params)
    telemetry = {
        "light_color": params.light_color,
        "light_intensity": params.light_intensity,
        "displacement": params.displacement,
        "energy": ctxs.energy,
        "brightness": ctxs.brightness,
        "melancholy": ctxs.melancholy,
        "pitch_hz": ctxs.dominant_pitch,
        "pitch_confidence": ctxs.pitch_confidence,
    }
    return frames, telemetry
