"""Provenance sidecar — the audit document (reference ``provenance.py``,
``metadata.py:336-437``): sources, owners, processing history, free-form
description. Stored as ``provenance`` JSON next to ``info``."""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from datetime import datetime, timezone


@dataclass
class Provenance:
    description: str = ""
    owners: list = field(default_factory=list)
    sources: list = field(default_factory=list)
    processing: list = field(default_factory=list)

    def add_processing(self, method: str, **params) -> None:
        """Append an audit entry (reference appends dicts with 'method'
        and 'by'); timestamp recorded in UTC ISO-8601."""
        entry = {
            "method": method,
            "date": datetime.now(timezone.utc).isoformat(),
        }
        entry.update(params)
        self.processing.append(entry)

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "Provenance":
        d = json.loads(text)
        return cls(
            description=d.get("description", ""),
            owners=list(d.get("owners", [])),
            sources=list(d.get("sources", [])),
            processing=list(d.get("processing", [])),
        )

    def commit(self, base_path: str) -> None:
        # PathOps, not raw open(): VolumeInfo.commit writes `info`
        # through the store layer — a gs://-rooted volume would
        # otherwise get its audit sidecar written to a LOCAL
        # './gs:/...' directory, silently diverging from the info
        from cloud_volume_spark.fs import PathOps
        from cloud_volume_spark.paths import resolve_cloudpath

        base_path = resolve_cloudpath(base_path)
        ops = PathOps(base_path)
        ops.makedirs(base_path)
        ops.write_bytes(f"{base_path}/provenance",
                        self.to_json().encode("utf-8"))

    @classmethod
    def load(cls, base_path: str) -> "Provenance":
        from cloud_volume_spark.fs import PathOps
        from cloud_volume_spark.paths import resolve_cloudpath

        base_path = resolve_cloudpath(base_path)
        ops = PathOps(base_path)
        if not ops.exists(f"{base_path}/provenance"):
            return cls()
        return cls.from_json(
            ops.read_bytes(f"{base_path}/provenance").decode("utf-8"))
