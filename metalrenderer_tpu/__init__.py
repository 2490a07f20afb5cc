"""metalrenderer_tpu — a TPU-native real-time rasterization framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
JellyBoonz/MetalRenderer (a metal-cpp Blinn-Phong renderer with shadow
mapping, 4x MSAA, an orbit camera and an audio-reactive scene), redesigned
TPU-first: the vertex stage is batched MXU matmuls, the fixed-function
rasterizer is a tile-binned Pallas kernel, shading is fused elementwise XLA,
and a whole frame (shadow pass + main pass + resolve) is ONE compiled XLA
program with zero per-frame host round-trips.
"""

from .config import RenderConfig, ShadowConfig
from .scene.camera import OrbitCamera, PoseCamera
from .scene.lights import DirectionalLight, Lighting, PointLight
from .scene.materials import (BLINN_PHONG, BLINN_PHONG_SHADOW, EMISSIVE,
                              Material)
from .scene.mesh import Mesh, cube, plane, square, triangle, uv_sphere
from .scene.scene import Instance, Scene
from .passes.pipeline import render, render_batch, render_frame

__version__ = "0.1.0"

__all__ = [
    "RenderConfig", "ShadowConfig", "OrbitCamera", "PoseCamera",
    "Lighting", "PointLight",
    "DirectionalLight", "Material", "BLINN_PHONG", "BLINN_PHONG_SHADOW",
    "EMISSIVE", "Mesh", "cube", "plane", "square", "triangle", "uv_sphere",
    "Instance", "Scene", "render", "render_batch", "render_frame",
]
