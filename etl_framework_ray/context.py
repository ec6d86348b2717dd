"""Run context + environment configuration.

Reference precedent: env-var settings (/root/reference/src/settings.py:8-20)
and job/run ids injected into metadata rows
(/root/reference/src/models/data_quality_evaluator.py:70-79,104-111).
"""

from __future__ import annotations

import datetime as _dt
import os
import uuid
from dataclasses import dataclass, field


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


LAKE_ROOT = _env("ETL_LAKE_ROOT", "/tmp/etl_lake")
DEFAULT_NUM_PARTITIONS = int(_env("ETL_NUM_PARTITIONS", "32"))
DEFAULT_SEGMENT_ROWS = int(_env("ETL_SEGMENT_ROWS", "100000"))


@dataclass(frozen=True)
class RunContext:
    """Identity of one engine run, stamped into metrics/lineage rows."""

    job_id: str = "local"
    run_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])
    run_date: _dt.date = field(default_factory=_dt.date.today)

    def as_dict(self) -> dict:
        return {
            "job_id": self.job_id,
            "run_id": self.run_id,
            "date": self.run_date.isoformat(),
        }
