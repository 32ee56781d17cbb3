"""PID-owned scratch directories for operators that materialize state.

Naming: ``<prefix>pid<PID>_<random>``. A sibling is reclaimed only when
its owning process is GONE (plus a short grace period against PID-reuse
races) — never by age alone, so a concurrent live session's lazily-read
backing parquet cannot be deleted under it (r7 advice #3). Legacy
un-owned dirs (the r7 naming, no ``pid`` segment) keep the old >1h age
rule. Centralised so the query bank stays pure (r7 verdict #7 — no
filesystem lifecycle inside query functions); consumers:
``rollup_table.scratch_rollup_path`` and
``incremental_dedup.scratch_index_path``.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile
import time


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def scratch_dir(prefix: str) -> str:
    """Create a unique scratch directory named ``<prefix>pid<PID>_…``
    and reap ORPHANED same-prefix siblings."""
    owned_re = re.compile(re.escape(prefix) + r"pid(\d+)_")
    base = tempfile.gettempdir()
    try:
        names = os.listdir(base)
    except OSError:
        names = []
    for name in names:
        if not name.startswith(prefix):
            continue
        full = os.path.join(base, name)
        try:
            age = time.time() - os.path.getmtime(full)
        except OSError:
            continue
        m = owned_re.match(name)
        if m:
            if not _pid_alive(int(m.group(1))) and age > 60:
                shutil.rmtree(full, ignore_errors=True)
        elif age > 3600:  # legacy r7-format dir, owner unknowable
            shutil.rmtree(full, ignore_errors=True)
    return tempfile.mkdtemp(prefix=f"{prefix}pid{os.getpid()}_")
