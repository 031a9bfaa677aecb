"""Bitstream domain: the inherently bit-serial parts of LC3.

Side-info parsing and the arithmetic (range) codec are sequential with
data-dependent trip counts. Four implementations coexist:

- `host` — the numpy reference parser/packer (correctness anchor).
- `native` — threaded C++ (liblc3bitstream.so) for host-pipelined serving.
- `device` — the XLA formulation of the range decoder (CPU fallback of
  the device path) and the `device_parse`/`decode_bytes_step` entries.
- `pallas_parse` / `pallas_pack` — the gather-free TPU kernels behind the
  fully fused bytes<->PCM programs (17,636x parse / byte-exact pack).

See SURVEY.md section 7.3 and the module docstrings.
"""
