"""Build the ``__list_object__.txt`` manifest for an object-store "directory"
(reference tools/create_oss_list_objects.py): tasks that point train_data at
``oss://bucket/dir/`` read this manifest to discover the shard objects.

The reference shells out to ``ossutil64``; here the lister is pluggable —
``ossutil``/``ossutil64`` if present on PATH, else an injected callable
(tests / other object stores) — and the manifest is written next to a local
mirror via cached-path fetchers, keeping the tool air-gap friendly.

Usage: ``python -m ofasys_tpu.tools.create_oss_list_objects oss://bucket/dir/``
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from typing import Callable, List, Optional

MANIFEST = "__list_object__.txt"


def _ossutil_list(path: str) -> List[str]:
    exe = shutil.which("ossutil64") or shutil.which("ossutil")
    if exe is None:
        raise RuntimeError(
            "no ossutil/ossutil64 on PATH — pass list_fn= or install the CLI"
        )
    out = subprocess.check_output([exe, "ls", path, "-s"], text=True)
    return out.splitlines()


def list_objects(path: str, list_fn: Optional[Callable[[str], List[str]]] = None) -> List[str]:
    """Return the object URLs under ``path`` (a trailing-slash oss:// dir),
    skipping sub-directories and ``__``-prefixed bookkeeping objects —
    reference filter semantics (create_oss_list_objects.py:23-25)."""
    if not (path.startswith("oss://") and path.endswith("/")):
        raise ValueError("oss path must be an explicit directory (oss://.../)")
    lines = (list_fn or _ossutil_list)(path)
    keep = []
    for line in lines:
        line = line.strip()
        if not line.startswith(path) or line.endswith("/"):
            continue
        if os.path.basename(line).startswith("__"):
            continue
        keep.append(line)
    return keep


def write_manifest(path: str, out_dir: str = ".",
                   list_fn: Optional[Callable[[str], List[str]]] = None,
                   put_fn: Optional[Callable[[str, str], None]] = None) -> str:
    """Write the manifest locally and, when a ``put_fn(local, remote)`` is
    given (or ossutil exists), upload it beside the listed objects."""
    objs = list_objects(path, list_fn=list_fn)
    local = os.path.join(out_dir, MANIFEST)
    with open(local, "w", encoding="utf-8") as f:
        for o in objs:
            print(o, file=f)
    remote = path + MANIFEST
    if put_fn is not None:
        put_fn(local, remote)
    else:
        exe = shutil.which("ossutil64") or shutil.which("ossutil")
        if exe is not None:
            subprocess.check_call([exe, "cp", "-f", local, remote])
    return local


def main(argv):
    if len(argv) != 1:
        print(__doc__)
        return 2
    local = write_manifest(argv[0])
    with open(local, encoding="utf-8") as f:
        n = sum(1 for _ in f)
    print(f"{local}: {n} objects listed under {argv[0]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
