"""Parse the C data tables out of the reference engine's constants.h.

Used only by the test-suite (and one-off tooling) to verify that the
generated tables in ``vvc_mip_gpu_tpu.constants`` reproduce the reference's
hand-maintained tables bit-for-bit.  No code is taken from the reference;
this extracts the numeric data only.
"""

from __future__ import annotations

import re
from pathlib import Path

REFERENCE_DIR = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE_DIR / "constants.h").is_file()


def _strip_comments(text: str) -> str:
    text = re.sub(r"//.*", "", text)
    return re.sub(r"/\*.*?\*/", "", text, flags=re.S)


def extract_array(name: str, source: str):
    """Extract (possibly nested) C initializer ``name[...] = {...}`` as lists."""
    m = re.search(re.escape(name) + r"\s*\[[^=]*=[^{]*\{", source)
    if m is None:
        raise KeyError(name)
    start = m.end() - 1
    depth = 0
    end = None
    for i in range(start, len(source)):
        if source[i] == "{":
            depth += 1
        elif source[i] == "}":
            depth -= 1
            if depth == 0:
                end = i + 1
                break
    body = _strip_comments(source[start:end])
    return eval(body.replace("{", "[").replace("}", "]"))  # noqa: S307


def load_constants_h() -> str:
    return (REFERENCE_DIR / "constants.h").read_text()
