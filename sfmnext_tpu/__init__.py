"""sfmnext_tpu — a TPU-native (JAX/Flax/Pallas) rebuild of SQLdepth.

Capability target: hisfog/SfMNeXt-Impl (self-supervised monocular depth with
a Self-Query-Layer transformer decoder), re-designed TPU-first:

- NHWC layout everywhere (TPU conv-friendly), static shapes, single jit'd
  functional train step.
- Geometry / warping / SSIM as pure shape-polymorphic functions (the
  reference freezes batch size into module buffers, layers.py:189-208).
- Data parallelism via a ``jax.sharding.Mesh`` with a ``data`` axis; batch
  sharded over ICI, params replicated (the reference uses
  ``torch.nn.DataParallel``, trainer.py:74).
- The hot SQL cross-attention (FullQueryLayer, networks/layers.py:4-21) has
  a fused Pallas kernel with an XLA reference fallback.
"""

__version__ = "0.1.0"
