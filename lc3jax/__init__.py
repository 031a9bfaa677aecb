"""lc3jax: a TPU-native LC3 audio codec framework.

Public surface:
- lc3jax.api         reference-parity Lc3Encoder/Lc3Decoder + buffer calcs
- lc3jax.config      Lc3Config / SamplingFrequency / FrameDuration
- lc3jax.dsp         batched XLA kernels (decode_step/encode_step/streaming)
- lc3jax.coding      bitstream layer (host python, native C++, on-device)
- lc3jax.parallel    stream-axis sharding over device meshes
- lc3jax.ref         float32-faithful oracle (bit-exact vs the reference)
- lc3jax.runner      WAV I/O + CLI
"""

from .config import FrameDuration, Lc3Config, SamplingFrequency

__all__ = ["FrameDuration", "Lc3Config", "SamplingFrequency"]
__version__ = "0.1.0"
