"""Checkpoint/resume: gzip key-value store with phase gates.

Same design as the reference (/root/reference/checkpoint.h:53: a
gzip-compressed key->string map in a .ckp.gz file, hierarchical keys via
startStruct/endStruct, CheckpointFactory mixin with
saveCheckpoint/restoreCheckpoint, phase flags finishedModelInit/... and
periodic throttled dumps) with JSON values so arrays and nested state
serialize naturally.
"""

from __future__ import annotations

import gzip
import json
import os
import time
from typing import Any, Dict, List, Optional

import numpy as np


class _NumpyEncoder(json.JSONEncoder):
    def default(self, o):
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, (np.integer,)):
            return int(o)
        if isinstance(o, (np.floating,)):
            return float(o)
        return super().default(o)


class Checkpoint:
    """key -> JSON value map persisted as .ckp.gz."""

    def __init__(self, path: str, dump_interval: float = 30.0):
        self.path = path
        self.data: Dict[str, Any] = {}
        self.dump_interval = dump_interval
        self._last_dump = 0.0
        self._prefix: List[str] = []

    # -- persistence ---------------------------------------------------
    def load(self) -> bool:
        if not os.path.exists(self.path):
            return False
        with gzip.open(self.path, "rt") as f:
            self.data = json.load(f)
        return True

    def dump(self, force: bool = True) -> None:
        now = time.time()
        if not force and now - self._last_dump < self.dump_interval:
            return
        tmp = self.path + ".tmp"
        with gzip.open(tmp, "wt") as f:
            json.dump(self.data, f, cls=_NumpyEncoder)
        os.replace(tmp, self.path)
        self._last_dump = now

    # -- hierarchical keys (startStruct/endStruct, checkpoint.h:287) ----
    def start_struct(self, name: str) -> None:
        self._prefix.append(name)

    def end_struct(self) -> None:
        self._prefix.pop()

    def _key(self, key: str) -> str:
        return ".".join(self._prefix + [key])

    def put(self, key: str, value: Any) -> None:
        self.data[self._key(key)] = value

    def get(self, key: str, default: Any = None) -> Any:
        return self.data.get(self._key(key), default)

    def has(self, key: str) -> bool:
        return self._key(key) in self.data

    # -- phase gates (finishedModelInit etc., phyloanalysis.cpp) -------
    def mark_finished(self, phase: str) -> None:
        self.put(f"finished.{phase}", True)
        self.dump(force=False)

    def is_finished(self, phase: str) -> bool:
        return bool(self.get(f"finished.{phase}", False))
