"""Batched TPU-native DSP kernels (JAX / XLA / Pallas).

Every function here is batch-first: arrays carry a leading stream axis
`[S, ...]` so thousands of concurrent audio streams amortise the tiny 10 ms
frames and keep the MXU busy (SURVEY.md section 2.5 / 7.1). Per-frame
recurrent state is a pytree threaded through `lax.scan` over the frame axis;
sharding over chips is a `jax.sharding` NamedSharding on the stream axis
(see lc3jax/parallel.py).
"""
