#!/usr/bin/env python3
"""Extract golden test vectors from the reference's inline unit tests.

The reference pins every codec stage with hard-coded input/expected arrays
inside `#[cfg(test)]` modules (SURVEY.md section 4). These arrays are *test
data* (captured from a real music frame); we lift them into .npz fixtures so
the new framework can assert bit-exact parity per stage.

Usage: python tools/extract_goldens.py   (writes tests/goldens/*.npz)
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

REF = Path("/root/reference/src")
OUT = Path(__file__).resolve().parent.parent / "tests" / "goldens"


def find_arrays(src: str, var: str) -> list[str]:
    """Return the bracketed bodies of every `let <var>... = [ ... ];`."""
    bodies = []
    for m in re.finditer(rf"let (?:mut )?{var}(?::[^=]+)?\s*=\s*\[", src):
        start = m.end() - 1
        depth = 0
        for i in range(start, len(src)):
            if src[i] == "[":
                depth += 1
            elif src[i] == "]":
                depth -= 1
                if depth == 0:
                    bodies.append(src[start + 1 : i])
                    break
    return bodies


def parse_body(body: str) -> np.ndarray:
    body = re.sub(r"//[^\n]*", "", body)
    toks = [t.strip() for t in body.split(",") if t.strip()]
    if toks and toks[0] in ("true", "false"):
        return np.array([t == "true" for t in toks], dtype=bool)
    if any("." in t or "e" in t.lower() for t in toks):
        return np.array([float(t) for t in toks], dtype=np.float32)
    return np.array([int(t) for t in toks], dtype=np.int64)


def grab(path: str, var: str, occurrence: int = 0) -> np.ndarray:
    src = (REF / path).read_text()
    bodies = find_arrays(src, var)
    return parse_body(bodies[occurrence])


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    fixtures: dict[str, dict[str, np.ndarray]] = {}

    fixtures["kissfft"] = {
        "in_i": grab("common/kissfft.rs", "i"),
        "in_r": grab("common/kissfft.rs", "r"),
        "out_i": grab("common/kissfft.rs", "i_expected"),
        "out_r": grab("common/kissfft.rs", "r_expected"),
    }
    fixtures["dct_iv"] = {
        "buf": grab("common/dct_iv.rs", "buf"),
        "expected": grab("common/dct_iv.rs", "output_expected"),
    }
    fixtures["imdct"] = {
        "frame0": grab("decoder/modified_dct.rs", "x_hat", 0),
        "frame1": grab("decoder/modified_dct.rs", "x_hat", 1),
        "expected": grab("decoder/modified_dct.rs", "freq_buf_expected"),
    }
    fixtures["decode_frame"] = {
        "buf_in": grab("decoder/lc3_decoder.rs", "buf_in", 0),
        "pcm_expected": grab("decoder/lc3_decoder.rs", "samples_out_expected", 0),
    }
    fixtures["side_info"] = {
        "buf": grab("decoder/side_info_reader.rs", "buf", 0),
    }
    fixtures["arith_decode"] = {
        "buf": grab("decoder/arithmetic_codec.rs", "buf"),
        "residual_bits": grab("decoder/arithmetic_codec.rs", "residual_bits", 0)
        if find_arrays((REF / "decoder/arithmetic_codec.rs").read_text(), "residual_bits")
        else np.array([]),
    }
    fixtures["residual_decode"] = {
        "residual_bits": grab("decoder/residual_spectrum.rs", "residual_bits"),
        "x_hat": grab("decoder/residual_spectrum.rs", "x_hat"),
        "expected": grab("decoder/residual_spectrum.rs", "x_hat_expected"),
    }
    fixtures["noise_filling"] = {
        "x_float": grab("decoder/noise_filling.rs", "spec_lines_float"),
        "x_int": grab("decoder/noise_filling.rs", "spec_lines_int"),
        "expected": grab("decoder/noise_filling.rs", "x_hat_expected"),
    }
    fixtures["tns_decode"] = {
        "x": grab("decoder/temporal_noise_shaping.rs", "spec_lines", 0),
        "expected": grab("decoder/temporal_noise_shaping.rs", "spec_lines_expected", 0),
    }
    fixtures["sns_decode"] = {
        "x": grab("decoder/spectral_noise_shaping.rs", "spec_lines", 0),
        "expected": grab("decoder/spectral_noise_shaping.rs", "spec_lines_expected", 0),
    }
    ltpf = {"activated_in": grab("decoder/long_term_post_filter.rs", "freq_samples", 0)}
    for k in range(6):  # full_cycle test: 6 frames through the transition cases
        ltpf[f"frame_in_{k}"] = grab("decoder/long_term_post_filter.rs", "freq_samples", k + 1)
        ltpf[f"frame_out_{k}"] = grab(
            "decoder/long_term_post_filter.rs", "freq_samples_expected", k
        )
    fixtures["ltpf_decode"] = ltpf

    # ---------------- encoder fixtures
    fixtures["encode_frame"] = {
        "samples_in": grab("encoder/lc3_encoder.rs", "samples_in", 0),
        "expected": grab("encoder/lc3_encoder.rs", "buf_out_expected", 0),
    }
    fixtures["mdct_encode"] = {
        "frame0": grab("encoder/modified_dct.rs", "samples_in", 0),
        "frame1": grab("encoder/modified_dct.rs", "samples_in", 1),
        "expected_output": grab("encoder/modified_dct.rs", "output_expected", 0),
        "expected_energy": grab("encoder/modified_dct.rs", "energy_bands_expected", 0),
    }
    for name, var_map in {
        "bandwidth_encode": [("encoder/bandwidth_detector.rs", "e_b", "e_b", 0)],
        "attack_encode": [("encoder/attack_detector.rs", "x_s", "x_s", 0)],
        "sns_encode": [
            ("encoder/spectral_noise_shaping.rs", "x", "x", 0),
            ("encoder/spectral_noise_shaping.rs", "e_b", "e_b", 0),
            ("encoder/spectral_noise_shaping.rs", "x_s_expected", "x_s_expected", 0),
            ("encoder/spectral_noise_shaping.rs", "scf", "scf", 0),
            ("encoder/spectral_noise_shaping.rs", "scfq_expected", "scfq_expected", 0),
        ],
        "tns_encode": [
            ("encoder/temporal_noise_shaping.rs", "x_s", "x_s", 0),
            ("encoder/temporal_noise_shaping.rs", "x_f_expected", "x_f_expected", 0),
            ("encoder/temporal_noise_shaping.rs", "lag_window", "lag_window", 0),
        ],
        "ltpf_encode": [
            (
                "encoder/long_term_post_filter.rs",
                "x_s",
                f"x_s_{occ}",
                occ,
            )
            for occ in range(9)
        ],
        "quant_encode": [
            ("encoder/spectral_quantization.rs", "x_f", "x_f", 0),
            ("encoder/spectral_quantization.rs", "x_q_expected", "x_q_expected", 0),
        ],
        "noise_level": [
            ("encoder/noise_level_estimation.rs", "x_f", "x_f", 0),
            ("encoder/noise_level_estimation.rs", "x_q", "x_q", 0),
        ],
        "bitstream_encode": [
            ("encoder/bitstream_encoding.rs", "x_q", "x_q", 0),
            ("encoder/bitstream_encoding.rs", "res_bits", "res_bits", 0),
            ("encoder/bitstream_encoding.rs", "buf_out_expected", "buf_out_expected", 0),
        ],
        "residual_encode": [
            ("encoder/residual_spectrum.rs", "x_f", "x_f", 0),
            ("encoder/residual_spectrum.rs", "x_q", "x_q", 0),
        ],
    }.items():
        d = {}
        for path, var, key, occ in var_map:
            try:
                d[key] = grab(path, var, occ)
            except (IndexError, ValueError) as e:
                print(f"  !! {name}.{key} from {path}: {e}")
        if d:
            fixtures[name] = d

    for name, arrays in fixtures.items():
        np.savez_compressed(OUT / f"{name}.npz", **arrays)
        shapes = {k: v.shape for k, v in arrays.items()}
        print(f"{name}: {shapes}")


if __name__ == "__main__":
    main()
