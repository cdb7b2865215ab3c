"""Fault-injection helpers for resilience testing (importable in Ray workers —
test-module classes are not on worker sys.path)."""

from __future__ import annotations

import os

import pyarrow as pa


class CrashOnce:
    """Pipeline hook that hard-kills its worker process the first time it runs
    (marker file = has-crashed flag shared across retries). Used to prove that
    a task-level worker death mid-stage is retried by Ray and the
    deterministic-overwrite apply keeps exactly-once semantics."""

    def __init__(self, marker: str):
        self.marker = marker

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not os.path.exists(self.marker):
            with open(self.marker, "w") as f:
                f.write("crashed")
            os._exit(1)          # kill the worker mid-task, no cleanup
        return batch
