"""Provenance sidecar — the audit document (reference ``provenance.py``,
``metadata.py:336-437``): sources, owners, processing history, free-form
description. Stored as ``provenance`` JSON next to ``info``."""

from __future__ import annotations

import json
import os
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
        os.makedirs(base_path, exist_ok=True)
        with open(os.path.join(base_path, "provenance"), "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, base_path: str) -> "Provenance":
        path = os.path.join(base_path, "provenance")
        if not os.path.exists(path):
            return cls()
        with open(path) as f:
            return cls.from_json(f.read())
