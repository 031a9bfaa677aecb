"""Reference-exact (float32-faithful) NumPy implementation of LC3.

This sub-package is the *oracle* of the framework: a host implementation
whose arithmetic reproduces, operation for operation, the float32 behaviour
of the reference implementation (/root/reference, ninjasource/lc3-codec) so
that its golden test vectors pass bit-exactly. The batched TPU path in
lc3jax.dsp is validated against this oracle.
"""
