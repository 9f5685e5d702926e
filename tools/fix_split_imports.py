"""One-shot helper for the round-6 registry split: repeatedly import the
registry package, and for each cross-slice NameError insert an explicit
`from .<defining_slice> import <name>` into the failing module."""

import re
import subprocess
import sys
from pathlib import Path

PKG = Path("kinesis_stream_reader_spark/registry")
ANCHOR = "from ._shared import _FLAT_COLS, _nested_events  # noqa: F401\n"

for _ in range(60):
    proc = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0,'.'); "
         "from kinesis_stream_reader_spark import registry"],
        capture_output=True, text=True,
    )
    if proc.returncode == 0:
        print("import OK")
        break
    err = proc.stderr
    m = re.search(r"name '(\w+)' is not defined", err)
    if not m:
        print("OTHER ERROR:\n", err[-3000:])
        break
    name = m.group(1)
    mods = re.findall(r"registry/(r\w+)\.py", err)
    if not mods:
        print("no module in traceback:\n", err[-2000:])
        break
    mod = mods[-1]
    defs = [
        p.stem for p in sorted(PKG.glob("r*.py"))
        if re.search(rf"^(def {name}\b|{name}(?:\s*:\s*\w+)?\s*=|class {name}\b)",
                     p.read_text(), re.M) and p.stem != mod
    ]
    if not defs:
        print(f"NO DEF for {name} (used in {mod})")
        break
    src = PKG / f"{mod}.py"
    text = src.read_text()
    line = f"from .{defs[0]} import {name}  # noqa: F401\n"
    src.write_text(text.replace(ANCHOR, ANCHOR + line, 1))
    print(f"{mod}: + {line.strip()}")
