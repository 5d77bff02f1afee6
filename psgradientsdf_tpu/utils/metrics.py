"""Structured metrics logging: JSONL file + stdout mirror.

Formalizes the reference's optimizer_doc.txt energy log
(cpp/include/ps_optimizer/OptimizerAux.cpp:259-269) into machine-readable
per-iteration records.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, IO, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.echo = echo
        self._fh: Optional[IO[str]] = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a")

    def log(self, event: str, **fields: Any) -> Dict[str, Any]:
        rec = {"t": time.time(), "event": event, **fields}
        if self._fh:
            self._fh.write(json.dumps(rec, default=float) + "\n")
            self._fh.flush()
        if self.echo:
            shown = ", ".join(f"{k}={_fmt(v)}" for k, v in fields.items())
            print(f"[{event}] {shown}")
        return rec

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


def _fmt(v: Any) -> str:
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)
