"""Bitstream domain: the inherently bit-serial parts of LC3.

Side-info parsing and the arithmetic (range) codec are sequential with
data-dependent trip counts; they run on host (numpy/CPython today, C++
planned) and exchange fixed-shape integer tensors with the batched TPU DSP
(lc3jax/dsp). See SURVEY.md section 7.1 "Bit-serial stages".
"""
