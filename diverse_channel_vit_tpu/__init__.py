"""diverse_channel_vit_tpu — a TPU-native (JAX/Flax/pjit/Pallas) framework for
channel-adaptive vision transformers.

Re-implements the capabilities of the DiChaViT reference codebase
(NeurIPS 2024, "Enhancing Feature Diversity Boosts Channel-Adaptive Vision
Transformers") as a TPU-first stack:

- one generic channel-token ViT core with pluggable channel-kernel providers,
  channel-embedding policies, channel-sampling policies (HCS/DCS) and
  diversity losses (reference: ``models/channel_vit.py``, ``models/dichavit.py``)
- static shapes for XLA: channel sampling is done with Gumbel top-k under
  ``jit``, one compiled specialization per channel count
- Pallas flash attention for the C x N token grid (reference used
  xFormers ``memory_efficient_attention``, ``models/vit.py:232-249``)
- data parallelism via ``jax.sharding.Mesh`` + jit-inferred collectives
  (reference used NCCL DDP / DataParallel, ``main.py:17-20``)
"""

__version__ = "0.1.0"
