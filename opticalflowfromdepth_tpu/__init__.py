"""opticalflowfromdepth_tpu — TPU-native optical-flow-from-depth framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
"Skin the sheep not only once" (IROS 2024) pipeline: synthesizing optical-flow
training data from depth datasets and training adjusted RAFT / GMFlow models
with an auxiliary augmentation classifier.

Layers (bottom-up):
  core/     pure-jnp geometry & flow algebra (backprojection, SE(3), conversions)
  ops/      TPU kernels: z-buffer forward warp, correlation, inpainting, sampling
  models/   RAFT, GMFlow, auxiliary classifier (flax.linen, bf16-friendly)
  synth/    the jit-compiled data-synthesis engine (depth -> flow pairs)
  data/     input pipeline: shard IO, augmentors, benchmark datasets
  train/    losses, optimizers, train loops, checkpointing
  eval/     validators, metrics, submission writers, inference
  parallel/ mesh construction, sharding rules, multi-host utilities
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Some environments pre-import jax (sitecustomize), after which the
    # JAX_PLATFORMS env var is silently ignored; re-apply it so CLI users
    # can still force e.g. JAX_PLATFORMS=cpu.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
