"""Small shared runtime utilities."""

from __future__ import annotations

_TMP_ROOTS: dict[str, str] = {}


def session_tmpdir(tag: str) -> str:
    """One temp working dir per (process, tag), removed at interpreter
    exit. Catalog queries that need a scratch table/checkpoint reuse the
    same root across invocations instead of leaking a fresh mkdtemp per
    run (a bench sweep runs each query three times); checkpointed
    entries additionally become incremental no-ops on re-run."""
    import atexit
    import shutil
    import tempfile

    d = _TMP_ROOTS.get(tag)
    if d is None:
        d = tempfile.mkdtemp(prefix=f"{tag}_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _TMP_ROOTS[tag] = d
    return d
