#!/usr/bin/env python3
"""Compile and run the golden-fixture generator against /root/reference.

The generator #includes the reference's in-tree STL-only sources in place
(nothing copied into this repo) — see tools/golden/gen_golden.cpp.  The
resulting fixtures are committed under tests/golden/ so the test suite does
not need the reference tree or a compiler at run time; re-run this script to
regenerate them when the fixture grid changes.
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
REF = os.environ.get("TAXOR_REFERENCE", "/root/reference")
OUT = os.path.join(REPO, "tests", "golden")


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    exe = os.path.join(HERE, "gen_golden")
    cmd = [
        "g++", "-O2", "-std=c++20",
        "-I", os.path.join(HERE, "shims"),
        "-I", os.path.join(REF, "src", "hashing"),
        "-I", os.path.join(REF, "src", "main"),
        "-I", os.path.join(REF, "src", "hixf", "search"),
        os.path.join(HERE, "gen_golden.cpp"),
        "-o", exe,
    ]
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)
    subprocess.run([exe, OUT], check=True)
    for f in sorted(os.listdir(OUT)):
        p = os.path.join(OUT, f)
        print(f"  {f}: {os.path.getsize(p)} bytes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
