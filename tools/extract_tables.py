#!/usr/bin/env python3
"""Extract LC3 spec constant tables from the reference Rust sources into an npz.

The LC3 codec (Bluetooth SIG, rev 1.0 2020-09-15) is defined in terms of
tabulated constants: low-delay MDCT windows, SNS band indices, trained VQ
codebooks, arithmetic-coder frequency models and LTPF filter coefficients.
Any conformant implementation must embed the exact same numbers; they are
spec *data*, not code. This tool parses the `pub const` arrays out of
`/root/reference/src/tables/*.rs` (see SURVEY.md section 2.4) and writes them
to `lc3jax/data/tables.npz` so the Python framework is standalone.

Derivable tables (MPVQ_OFFSETS, the DCT-16 rotation matrix D, the
*_CUMFREQ prefix sums) are additionally re-generated from first principles
in lc3jax/tables.py and verified against the extracted values in tests.
"""

import re
import sys
from pathlib import Path

import numpy as np

REF = Path("/root/reference/src/tables")
OUT = Path(__file__).resolve().parent.parent / "lc3jax" / "data" / "tables.npz"

DECL_RE = re.compile(
    r"pub const (?P<name>[A-Z0-9_]+):\s*(?P<type>[\[\]A-Za-z0-9_; ]+?)\s*=\s*(?P<body>.*?);",
    re.DOTALL,
)
COMMENT_RE = re.compile(r"//[^\n]*")


def parse_literal(tok: str) -> float:
    tok = tok.strip()
    if "/" in tok:  # e.g. "8915.0 / 4096.0" — keep exact f32 semantics downstream
        num, den = tok.split("/")
        return float(np.float32(np.float32(float(num)) / np.float32(float(den))))
    if tok.startswith("0x"):
        return int(tok, 16)
    return float(tok)


def parse_array(body: str):
    """Parse a (possibly nested) Rust array literal into a python list tree."""
    body = body.strip()
    assert body.startswith("[") and body.endswith("]"), body[:40]
    inner = body[1:-1]
    # Split at top level commas.
    items, depth, cur = [], 0, []
    for ch in inner:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        items.append("".join(cur))
    out = []
    for it in items:
        it = it.strip()
        if not it:
            continue
        if it.startswith("["):
            out.append(parse_array(it))
        else:
            out.append(parse_literal(it))
    return out


def main() -> None:
    tables = {}
    for path in sorted(REF.glob("*.rs")):
        src = COMMENT_RE.sub("", path.read_text())
        for m in DECL_RE.finditer(src):
            name, typ, body = m.group("name"), m.group("type"), m.group("body")
            body = body.strip()
            if not body.startswith("["):
                # scalar const like TNS_NUMFILTERS_MAX
                tables[name] = np.asarray(parse_literal(body))
                continue
            tree = parse_array(body)
            is_float = "Scaler" in typ or "f32" in typ or "f64" in typ
            arr = np.asarray(tree, dtype=np.float32 if is_float else np.int64)
            tables[name] = arr
    assert "W_N480_10MS" in tables and tables["W_N480_10MS"].shape == (960,)
    assert tables["AC_SPEC_LOOKUP"].shape == (4096,)
    assert tables["LFCB"].shape == (32, 8)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **tables)
    print(f"wrote {OUT} with {len(tables)} tables:")
    for k in sorted(tables):
        print(f"  {k}: shape={tables[k].shape} dtype={tables[k].dtype}")


if __name__ == "__main__":
    sys.exit(main())
