"""carel-tpu: a TPU-native framework with the capabilities of CAREL-VAE.

Rebuilds the reference (tk1363704/CAREL-VAE, a cross-domain Emotion-Cause Pair
Extraction research codebase, see /root/reference and SURVEY.md) as one idiomatic
JAX / Flax / optax / Pallas / pjit framework:

- ``carel_tpu.data``      jit-friendly ECPE ingest (parser, pair construction, BoW,
                          tokenizers, fixed-shape batching)
- ``carel_tpu.models``    Flax encoder + VAE heads + stage-1 doc model + adapters
- ``carel_tpu.ops``       Pallas TPU kernels (MMD / HSIC / fused BoW recon / entmax)
- ``carel_tpu.losses``    disentanglement-regularizer registry + VAE/classifier losses
- ``carel_tpu.parallel``  mesh / sharding helpers (DP over ICI, hooks for TP)
- ``carel_tpu.train``     jitted train/eval steps, loops, metrics, checkpointing
- ``carel_tpu.selftrain`` self-training strategies for domain adaptation
- ``carel_tpu.infer``     batched pair-inference API
- ``carel_tpu.cli``       entry points; every reference file fork is a config preset
"""

__version__ = "0.1.0"

from carel_tpu.config import (  # noqa: F401
    AdapterKind,
    DataConfig,
    EncoderConfig,
    ModelConfig,
    Regularizer,
    SelfStrategy,
    TrainConfig,
    CarelConfig,
)
