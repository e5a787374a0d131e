"""PEMP-TPU: a TPU-native few-shot semantic segmentation framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of the PEMP
reference (Prior-Enhanced network with Meta-Prototypes, few-shot semantic
segmentation on PASCAL-5i / COCO-20i), designed TPU-first:

- NHWC convolutional backbones compiled by XLA onto the MXU.
- Fused prototype extraction / matching ops with Pallas kernels for the
  hot paths and jnp reference implementations for testing.
- Episodic data pipeline on the TPU-VM host with device prefetch.
- Data-parallel episodes over a 1-D ``jax.sharding.Mesh`` (whole episodes
  stay device-local because of the episode communication modules).

Layout (mirrors the reference's layer map, see SURVEY.md section 1):

- ``pemp_tpu.config``   -- dataclass config tree + ``train with k=v`` CLI.
- ``pemp_tpu.utils``    -- logging, timers, misc.
- ``pemp_tpu.ops``      -- resize / dropblock / prototype / EDT ops
  (jnp reference + Pallas TPU kernels).
- ``pemp_tpu.models``   -- Flax backbones and the 7 model families.
- ``pemp_tpu.core``     -- losses, metrics, solver, trainer/evaluator.
- ``pemp_tpu.data``     -- episodic samplers and loaders.
- ``pemp_tpu.parallel`` -- mesh setup and sharded train/eval steps.
"""

__version__ = "0.1.0"
