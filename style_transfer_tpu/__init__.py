"""style_transfer_tpu — a TPU-native neural style transfer framework.

A from-scratch rebuild of the capabilities of ``crowsonkb/style_transfer``
(Gatys-style iterative stylization: VGG-19 content loss, Gram-matrix style
losses with multi-style blending, total-variation regularization, a
coarse-to-fine multi-scale scheduler, Adam / L-BFGS image optimizers, CLI and
live web monitor) designed TPU-first on JAX/XLA/Pallas:

- the whole optimizer step (VGG forward + backward, losses, update) runs as a
  single jitted, donated device computation — no host round-trips in the hot
  loop (SURVEY.md section 1, "TPU-native restatement"),
- the native tier is Pallas (``ops/pallas``): a streaming-VMEM Gram kernel
  and fused loss-epilogue kernels (content/style/TV, each producing the
  loss term and its top-gradient in one pass), all custom-VJP'd and checked
  against the plain-jnp oracle in ``ops/losses``; production dispatch per
  code path is decided by in-context measurement — currently the fused TV
  kernel runs by default on TPU and the rest are opt-in (numbers either
  way in ARCHITECTURE.md),
- scaling happens by spatial sharding over a ``jax.sharding.Mesh`` with XLA
  collectives over ICI (``parallel/``), replacing the reference's
  multi-process per-GPU layer-split IPC scheme (SURVEY.md section 2 row 10).

See SURVEY.md for the structural analysis of the reference this build targets.
"""

__version__ = "0.1.0"

from style_transfer_tpu.api import StyleTransfer, StylizeConfig  # noqa: F401
from style_transfer_tpu.models.vgg import VGG, VGG19, LAYER_NAMES  # noqa: F401

__all__ = ["StyleTransfer", "StylizeConfig", "VGG", "VGG19", "LAYER_NAMES", "__version__"]
