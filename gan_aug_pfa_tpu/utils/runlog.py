"""Machine-readable run logging: one JSON object per line.

The reference's only observability channel is ``print()`` + tqdm (SURVEY.md
§5.5 — reference train.py:134,146, train_gan.py:51,74).  The framework
matches those printed formats; this module adds the ``[extension]``
``--log-jsonl`` channel: an append-only JSONL stream of run events
(``run_start``, ``epoch``, ``checkpoint``, ``sample``, ``preemption``,
``run_end``) that survives ``--resume`` (which appends to the same file)
and is trivially consumed by ``jq`` / pandas / plotting dashboards without
scraping stdout.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional


def _coerce(v: Any):
    """JSON fallback for numpy scalars/arrays and other non-JSON leaves."""
    if hasattr(v, "item") and getattr(v, "ndim", None) in (None, 0):
        return v.item()
    if hasattr(v, "tolist"):
        return v.tolist()
    return str(v)


class JsonlRunLog:
    """Append-only JSONL event stream.

    Each event is one line: ``{"ts": <unix seconds>, "event": <name>,
    ...fields}``.  Every write is flushed, so a crash or preemption loses
    at most the in-flight line and a tail -f follows training live."""

    def __init__(self, path: str, append: bool = False):
        self.path = path
        parent = os.path.dirname(os.path.abspath(path))
        os.makedirs(parent, exist_ok=True)
        self._f = open(path, "a" if append else "w")

    def log(self, event: str, **fields: Any) -> None:
        rec = {"ts": round(time.time(), 3), "event": event, **fields}
        self._f.write(json.dumps(rec, default=_coerce) + "\n")
        self._f.flush()

    def close(self) -> None:
        if not self._f.closed:
            self._f.close()

    def __enter__(self) -> "JsonlRunLog":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def open_run_log(path: Optional[str], append: bool = False
                 ) -> Optional[JsonlRunLog]:
    """A JsonlRunLog when `path` is set, else None (logging disabled)."""
    return JsonlRunLog(path, append=append) if path else None
