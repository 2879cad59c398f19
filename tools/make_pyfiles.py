"""Build the ``--py-files`` artifact for cluster deployment.

The production invocation the README documents —

    spark-submit --py-files ovalspark.zip -m ovalspark.cli validate ...

— ships the library to every executor as one zip on the Python path
(mirroring how the reference ships a single static binary to its worker
hosts, ``/root/reference/README.md`` deploy section). This builds that
zip DETERMINISTICALLY: only ``ovalspark/**/*.py``, sorted paths, zeroed
timestamps — so re-running on unchanged sources is byte-identical and
the artifact can be content-addressed by a deploy pipeline.

Usage: python tools/make_pyfiles.py [out.zip]   (default: ovalspark.zip
in the CWD). Prints the zip path and its sha256.
"""

from __future__ import annotations

import hashlib
import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    pkg = os.path.join(REPO, "ovalspark")
    members: list[tuple[str, str]] = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                members.append((full, os.path.relpath(full, REPO)))
    tmp = f"{out}.tmp.{os.getpid()}"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in members:
            with open(full, "rb") as f:
                data = f.read()
            # fixed timestamp: identical sources => identical artifact
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, data, zipfile.ZIP_DEFLATED)
    os.replace(tmp, out)
    return out


def main() -> int:
    out = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else "ovalspark.zip")
    build(out)
    with open(out, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    print(f"{out} sha256={digest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
