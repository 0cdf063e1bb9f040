"""Session-scoped scratch layouts for registry faces.

Several faces exercise a READ path over a layout that must first be
written (manifest tables, bucketed copies, format round-trips).  The
layout is a write-once decision — repeated registry/bench runs in one
session reuse the first write — but a session that switches ``sf_dir``
must not leave the previous scale's copy on disk (round-3 advisory:
the old module-global caches abandoned the directory without cleanup).
``scoped_scratch`` owns that lifecycle: build once per (name, sf_dir),
remove the superseded directory when the scale changes.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from collections.abc import Callable

#: face name → (sf_dir it was built for, directory path)
_SCRATCH: dict[str, tuple[str, str]] = {}


@atexit.register
def _cleanup_scratch() -> None:
    """Remove every live scratch layout at interpreter exit: without
    this, each PROCESS leaks one tempdir per scratch face (the
    in-session lifecycle above only removes a dir when its sf_dir is
    superseded within the same run)."""
    while _SCRATCH:
        _, (_, path) = _SCRATCH.popitem()
        shutil.rmtree(path, ignore_errors=True)


def scoped_scratch(name: str, sf_dir: str,
                   build: Callable[[str], None]) -> str:
    """Return a scratch directory holding ``name``'s layout for
    ``sf_dir``, building it with ``build(path)`` on first use.  A call
    with a DIFFERENT sf_dir removes the stale directory before
    rebuilding, so a multi-scale session never accumulates copies."""
    cur = _SCRATCH.get(name)
    if cur is not None and cur[0] == sf_dir and os.path.isdir(cur[1]):
        return cur[1]
    if cur is not None:
        shutil.rmtree(cur[1], ignore_errors=True)
        del _SCRATCH[name]
    path = tempfile.mkdtemp(prefix=f"{name}_")
    try:
        build(path)
    except BaseException:
        shutil.rmtree(path, ignore_errors=True)
        raise
    _SCRATCH[name] = (sf_dir, path)
    return path
