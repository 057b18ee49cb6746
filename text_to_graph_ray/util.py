"""Small shared utilities."""

from __future__ import annotations

import os
import shutil


def ensure_dir_once(out: str, build) -> str:
    """Idempotent atomic directory materialization: if ``out/_SUCCESS`` exists
    return immediately; otherwise run ``build(tmp_dir)`` against a
    CALLER-UNIQUE tmp dir and atomically rename into place. Concurrent
    callers each build in their own tmp (pid+random suffix) so they never
    write into each other's directory; the rename loser discards its copy."""
    import uuid

    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    tmp = f"{out}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    build(tmp)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    if not os.path.exists(done):
        try:
            os.rename(tmp, out)
        except OSError:  # lost a race with a concurrent builder
            shutil.rmtree(tmp, ignore_errors=True)
    else:
        shutil.rmtree(tmp, ignore_errors=True)
    return out
