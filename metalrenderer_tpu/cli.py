"""Command-line entry points — replacement for the reference's Cocoa app
shell (main.m / AppDelegate.mm) and the standalone Metal-Tutorial CLI
(Engine/main.mm). The swapchain becomes PNG files; the ImGui telemetry
panel becomes a JSON stream.

Usage:
  python -m metalrenderer_tpu.cli render   [--width W --height H ...]
  python -m metalrenderer_tpu.cli audioapp --wav in.wav --out-dir frames/
  python -m metalrenderer_tpu.cli analyze  --wav in.wav
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np


def _add_render_args(p):
    p.add_argument("--width", type=int, default=800)    # mtl_engine.mm:133
    p.add_argument("--height", type=int, default=600)
    p.add_argument("--msaa", type=int, default=4)
    p.add_argument("--shadow-map-size", type=int, default=1024)
    p.add_argument("--backend", default="pallas",
                   choices=["pallas", "reference"])
    p.add_argument("--radius", type=float, default=5.0)
    p.add_argument("--theta", type=float, default=2.5)
    p.add_argument("--phi", type=float, default=1.2)
    p.add_argument("--cube-pos", type=float, nargs=3, default=[0, 0, -1])
    p.add_argument("--light-pos", type=float, nargs=3, default=[0, 2, 0])
    p.add_argument("--light-color", type=float, nargs=3, default=[1, 1, 1])
    p.add_argument("--displacement", type=float, default=0.0)


def cmd_render(args):
    from .config import RenderConfig
    from .engine import audio_app
    from .io import png
    from .scene.camera import OrbitCamera

    cfg = RenderConfig(width=args.width, height=args.height, msaa=args.msaa,
                       shadow_map_size=args.shadow_map_size)
    cam = OrbitCamera(radius=args.radius, theta=args.theta, phi=args.phi,
                      aspect=args.width / args.height)
    if args.frames > 1:
        # Orbit turntable sequence through the frame-batched serving
        # path (mr.render_batch: the whole sequence in a fixed number of
        # kernel launches).
        import jax.numpy as jnp
        from .passes.pipeline import render_batch
        from .scene.lights import Lighting

        scene = audio_app.build_scene(tuple(args.cube_pos),
                                      tuple(args.light_pos),
                                      tuple(args.light_color))
        nf = args.frames
        disps = jnp.full((nf,), args.displacement, jnp.float32)
        thetas = args.theta + jnp.linspace(0.0, args.orbit, nf)
        fbs, stats = render_batch(
            scene, cam, Lighting.default(), disps, thetas, config=cfg,
            shadow_target=tuple(args.cube_pos), backend=args.backend)
        out = pathlib.Path(args.out)
        stem, suffix = out.stem, (out.suffix or ".png")
        fbs = np.asarray(fbs)
        for i in range(nf):
            png.write_png(str(out.with_name(f"{stem}_{i:04d}{suffix}")),
                          fbs[i])
        print(json.dumps({k: np.asarray(v).tolist()
                          for k, v in stats.items()}))
        print(f"wrote {nf} frames to {stem}_*{suffix}", file=sys.stderr)
        return
    fb, stats = audio_app.render_audio_app(
        cube_position=tuple(args.cube_pos),
        light_position=tuple(args.light_pos),
        light_color=tuple(args.light_color),
        displacement=args.displacement,
        camera=cam, config=cfg, backend=args.backend)
    png.write_png(args.out, np.asarray(fb))
    print(json.dumps({k: float(v) for k, v in stats.items()}))
    print(f"wrote {args.out}", file=sys.stderr)


def cmd_audioapp(args):
    from .config import RenderConfig
    from .engine.renderer import (render_audio_reactive_sequence,
                                  stream_audio_reactive)
    from .io import png, wav
    from .scene.camera import OrbitCamera

    samples, rate = wav.read_wav(args.wav)
    mono = samples[0]
    cfg = RenderConfig(width=args.width, height=args.height, msaa=args.msaa,
                       shadow_map_size=args.shadow_map_size)
    cam = OrbitCamera(radius=args.radius, theta=args.theta, phi=args.phi,
                      aspect=args.width / args.height)
    if args.stream:
        # Streaming serving mode: frames land incrementally, one batch
        # per --chunk-frames audio buffers (~21 ms each at 48 kHz) —
        # the analog of the reference's live tap cadence
        # (AudioInputLayer.mm:22). Telemetry is one JSON line per chunk
        # with the wall-clock latency of that chunk's render.
        import time

        from .audio import analyzer

        out = pathlib.Path(args.out_dir)
        out.mkdir(parents=True, exist_ok=True)
        if args.max_frames is not None:
            mono = mono[:args.max_frames * analyzer.FFT_SIZE]
        i = 0
        stream = stream_audio_reactive(
            mono, rate, chunk_frames=args.chunk_frames, camera=cam,
            config=cfg, backend=args.backend,
            cube_position=tuple(args.cube_pos),
            light_position=tuple(args.light_pos))
        while True:
            # Timer wraps the generator pull: tracing/dispatch (and the
            # first chunk's compile) happen inside the generator, so
            # starting the clock after it resumes would understate the
            # chunk's real latency.
            t0 = time.perf_counter()
            try:
                frames, telem = next(stream)
            except StopIteration:
                break
            frames = np.asarray(frames)   # device sync: chunk is done
            latency_ms = (time.perf_counter() - t0) * 1e3
            for f in range(frames.shape[0]):
                png.write_png(out / f"frame_{i + f:05d}.png", frames[f])
            print(json.dumps({
                "chunk_first_frame": i, "frames": int(frames.shape[0]),
                "fetch_ms": round(latency_ms, 2),
                "light_intensity":
                    np.asarray(telem["light_intensity"]).tolist(),
            }), flush=True)
            i += frames.shape[0]
        print(f"streamed {i} frames to {out}", file=sys.stderr)
        return
    frames, telemetry = render_audio_reactive_sequence(
        mono, rate, camera=cam, config=cfg, backend=args.backend,
        max_frames=args.max_frames,
        cube_position=tuple(args.cube_pos),
        light_position=tuple(args.light_pos))
    out = pathlib.Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    frames = np.asarray(frames)
    for i in range(frames.shape[0]):
        png.write_png(out / f"frame_{i:05d}.png", frames[i])
    telem = {k: np.asarray(v).tolist() for k, v in telemetry.items()}
    (out / "telemetry.json").write_text(json.dumps(telem, indent=1))
    print(f"wrote {frames.shape[0]} frames to {out}", file=sys.stderr)


def cmd_flythrough(args):
    """Quaternion-slerp camera flythrough of the AudioApp scene: key
    orbit poses -> PoseCamera path -> one compiled program for the whole
    sequence (engine.renderer.render_camera_path)."""
    from .config import RenderConfig
    from .engine import audio_app
    from .engine.renderer import render_camera_path
    from .io import png
    from .scene.camera import OrbitCamera
    from .scene.lights import Lighting

    cfg = RenderConfig(width=args.width, height=args.height, msaa=args.msaa,
                       shadow_map_size=args.shadow_map_size)
    aspect = args.width / args.height
    keys = []
    for spec in args.pose:
        r, t, p_ = (float(x) for x in spec.split(","))
        keys.append(OrbitCamera(radius=r, theta=t, phi=p_, aspect=aspect))
    if len(keys) < 2:
        raise SystemExit("--pose must be given at least twice (r,theta,phi)")
    scene = audio_app.build_scene(cube_position=tuple(args.cube_pos),
                                  light_position=tuple(args.light_pos))
    frames = render_camera_path(
        scene, Lighting.default(), keys,
        frames_per_segment=args.frames_per_segment, config=cfg,
        displacement=args.displacement,
        shadow_target=tuple(args.cube_pos), backend=args.backend)
    out = pathlib.Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    frames = np.asarray(frames)
    for i in range(frames.shape[0]):
        png.write_png(out / f"fly_{i:05d}.png", frames[i])
    print(f"wrote {frames.shape[0]} frames to {out}", file=sys.stderr)


def cmd_analyze(args):
    """Telemetry parity with the ImGui overlay (mtl_engine.mm:880-933):
    RMS, rolling average, band energies, pitch + confidence, and the
    MusicalContext per 1024-sample chunk, as JSON lines."""
    import jax.numpy as jnp

    from .audio import analyzer, interpreter
    from .io import wav

    samples, rate = wav.read_wav(args.wav)
    _, res = analyzer.analyze_stream(jnp.asarray(samples[0]), float(rate))
    import jax
    ctxs = jax.vmap(lambda r: interpreter.interpret(r, float(rate)))(res)
    n = res.rms.shape[0]
    for i in range(n):
        print(json.dumps({
            "chunk": i,
            "rms": float(res.rms[i]),
            "rolling_avg": float(res.rolling_avg[i]),
            "bass": float(res.bass[i]),
            "mid": float(res.mid[i]),
            "treble": float(res.treble[i]),
            "pitch_hz": float(res.pitch_hz[i]),
            "pitch_confidence": float(res.pitch_confidence[i]),
            "energy": float(ctxs.energy[i]),
            "brightness": float(ctxs.brightness[i]),
            "melancholy": float(ctxs.melancholy[i]),
        }))
    if args.dashboard:
        # PNG dashboard per chunk (SURVEY §5: the ImGui spectrum/band
        # panel as images; utils/dashboard.py).
        import pathlib

        from .io import png as png_mod
        from .utils import dashboard
        out = pathlib.Path(args.dashboard)
        out.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = dashboard.render_result_dashboard(
                res, i, context=ctxs, sample_rate=float(rate))
            png_mod.write_png(out / f"dash_{i:05d}.png", img)
        print(f"wrote {n} dashboards to {out}", file=sys.stderr)


def cmd_session(args):
    """Interactive loop analog (MtlEngine::run + GLFW callbacks): JSON
    input events -> camera/scene state -> frames, from stdin or a
    script file. One telemetry JSON line per frame on stdout."""
    from .config import RenderConfig
    from .engine.session import InteractiveSession
    from .io import png
    from .scene.camera import OrbitCamera

    cfg = RenderConfig(width=args.width, height=args.height, msaa=args.msaa,
                       shadow_map_size=args.shadow_map_size)
    cam = OrbitCamera(radius=args.radius, theta=args.theta, phi=args.phi,
                      aspect=args.width / args.height)
    sess = InteractiveSession(
        config=cfg, camera=cam, backend=args.backend,
        cube_pos=tuple(args.cube_pos), light_pos=tuple(args.light_pos),
        light_color=tuple(args.light_color),
        displacement=args.displacement)

    out_dir = pathlib.Path(args.out_dir) if args.out_dir else None
    if out_dir is not None:
        out_dir.mkdir(parents=True, exist_ok=True)

    def on_frame(fb, telem):
        if out_dir is not None and telem["frame"] % args.png_every == 0:
            png.write_png(str(out_dir / f"frame_{telem['frame']:05d}.png"),
                          np.asarray(fb))

    lines = (pathlib.Path(args.events).read_text().splitlines()
             if args.events else sys.stdin)
    for _, telem in sess.run(lines, on_frame=on_frame):
        print(json.dumps(telem), flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="metalrenderer_tpu")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force the JAX platform. NOTE: the JAX_PLATFORMS "
                         "env var is silently ignored when a TPU plugin "
                         "is installed; this flag uses jax.config, which "
                         "is honored")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser(
        "render", help="render AudioApp frame(s) to PNG "
        "(--frames N: batched orbit turntable sequence)")
    _add_render_args(p)
    p.add_argument("--out", default="frame.png")
    p.add_argument("--frames", type=int, default=1)
    p.add_argument("--orbit", type=float, default=0.8,
                   help="total orbit angle across --frames (radians)")
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("audioapp",
                       help="render an audio-reactive sequence from a WAV")
    _add_render_args(p)
    p.add_argument("--wav", required=True)
    p.add_argument("--out-dir", default="frames")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--stream", action="store_true",
                   help="render incrementally as audio chunks arrive "
                        "(bounded latency; one compiled batch program "
                        "reused per chunk)")
    p.add_argument("--chunk-frames", type=int, default=16,
                   help="frames (1024-sample buffers) per streamed batch")
    p.set_defaults(fn=cmd_audioapp)

    p = sub.add_parser(
        "flythrough",
        help="quaternion-slerp camera flythrough (PNG sequence)")
    _add_render_args(p)
    p.add_argument("--pose", action="append", default=[],
                   help="orbit key pose 'radius,theta,phi' (repeat >= 2x)")
    p.add_argument("--frames-per-segment", type=int, default=24)
    p.add_argument("--out-dir", default="flythrough")
    p.set_defaults(fn=cmd_flythrough)

    p = sub.add_parser(
        "session",
        help="interactive loop: JSON input events (stdin or --events "
             "file) -> camera/scene updates -> frames + telemetry")
    _add_render_args(p)
    p.add_argument("--events", default=None,
                   help="event script file (default: read stdin)")
    p.add_argument("--out-dir", default=None,
                   help="write PNG frames here (default: telemetry only)")
    p.add_argument("--png-every", type=int, default=1,
                   help="write every Nth frame's PNG")
    p.set_defaults(fn=cmd_session)

    p = sub.add_parser("analyze", help="audio feature telemetry (JSON lines)")
    p.add_argument("--wav", required=True)
    p.add_argument("--dashboard", default=None, metavar="DIR",
                   help="also render a PNG telemetry dashboard per chunk "
                        "(the ImGui overlay panel as images)")
    p.set_defaults(fn=cmd_analyze)

    args = ap.parse_args(argv)
    # Cache/env first, explicit flag second: a --platform on the
    # command line must beat the METALRENDERER_PLATFORM env override
    # that enable_persistent_cache applies.
    from .utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    return args.fn(args)


if __name__ == "__main__":
    main()
