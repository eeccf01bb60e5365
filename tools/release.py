#!/usr/bin/env python3
"""Release helper, mirroring the reference's `release` script (reference
release:1-90): verify a clean git tree, run the test suite, check the
requested version matches the package metadata, then create the git tag.

Usage: python tools/release.py 0.2.0 [--dry-run]
"""

from __future__ import annotations

import argparse
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run(cmd: list[str], **kw) -> str:
    return subprocess.run(
        cmd, cwd=ROOT, check=True, capture_output=True, text=True, **kw
    ).stdout


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("version")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    version = args.version.lstrip("v")

    if run(["git", "status", "--porcelain"]).strip():
        print("error: git tree is dirty; commit or stash first", file=sys.stderr)
        return 1

    pyproject = (ROOT / "pyproject.toml").read_text()
    m = re.search(r'^version\s*=\s*"([^"]+)"', pyproject, re.M)
    if not m or m.group(1) != version:
        print(
            f"error: pyproject.toml version {m.group(1) if m else '?'} != {version}",
            file=sys.stderr,
        )
        return 1
    init = (ROOT / "smafa_tpu" / "__init__.py").read_text()
    m = re.search(r'^__version__\s*=\s*"([^"]+)"', init, re.M)
    if not m or m.group(1) != version:
        print(
            f"error: smafa_tpu/__init__.py __version__ {m.group(1) if m else '?'} != {version}",
            file=sys.stderr,
        )
        return 1

    print("Running test suite ..")
    subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q"], cwd=ROOT, check=True
    )

    tag = f"v{version}"
    if args.dry_run:
        print(f"dry-run: would create tag {tag}")
        return 0
    run(["git", "tag", "-a", tag, "-m", f"smafa-tpu {tag}"])
    print(f"Tagged {tag}. Push with: git push origin {tag}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
