"""dist_renderer_tpu — a TPU-native differentiable sphere-tracing framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
B1ueber2y/DIST-Renderer (DIST, CVPR 2020, arXiv 1911.13225): differentiable
rendering of latent-conditioned neural SDFs (DeepSDF decoders) into depth,
surface-normal, silhouette, and color maps, with inverse-rendering drivers
(latent shape fitting, multi-view reconstruction, camera pose refinement).

Design (see SURVEY.md §7):
  - dense fixed-shape ray batches + convergence masks (lax.while_loop) instead
    of the reference's dynamic active-ray index sets
    (reference: core/sdfrenderer/renderer.py — dynamic synchronized inference)
  - last-step / implicit-function-theorem gradients instead of unrolling the
    march (memory flat in step count)
  - Pallas fused MLP kernels for the hot decoder eval
  - shard_map over jax.sharding.Mesh axes (rays / views / latents) for
    multi-chip scale-out
"""

from dist_renderer_tpu.config import (
    DecoderConfig,
    GradConfig,
    LossConfig,
    MarchConfig,
    OptimConfig,
    RenderConfig,
)
from dist_renderer_tpu.models.decoder import (
    DeepSDFDecoder,
    decode_sdf,
    decoder_apply,
    make_precise_sdf,
)
from dist_renderer_tpu.models.checkpoint import (
    load_decoder,
    load_latent_codes,
    save_deepsdf_experiment,
)
from dist_renderer_tpu.ops.camera import Camera
from dist_renderer_tpu.ops.renderer import (
    SDFRenderer,
    SDFRendererColor,
    make_march_factory,
    render,
    render_rays,
)

__version__ = "0.1.0"
__all__ = [
    "Camera", "DecoderConfig", "DeepSDFDecoder", "GradConfig", "LossConfig",
    "MarchConfig", "OptimConfig", "RenderConfig", "SDFRenderer",
    "SDFRendererColor", "decode_sdf", "decoder_apply", "load_decoder",
    "load_latent_codes", "make_march_factory", "make_precise_sdf", "render",
    "render_rays", "save_deepsdf_experiment",
]
