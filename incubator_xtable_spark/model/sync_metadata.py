"""TableSyncMetadata — the persisted sync bookmark.

Reference parity: model/metadata/TableSyncMetadata.java:43-112. Serialized
as JSON and stored in the TARGET table's properties under the key
``XTABLE_METADATA`` (Delta: metaData.configuration; Iceberg: table
properties; Hudi: commit extraMetadata).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Optional

XTABLE_METADATA_KEY = "XTABLE_METADATA"
CURRENT_VERSION = 1


@dataclass
class TableSyncMetadata:
    last_instant_synced: str
    instants_to_consider_for_next_sync: list[str] = field(default_factory=list)
    version: int = CURRENT_VERSION
    source_table_format: Optional[str] = None
    source_identifier: Optional[str] = None

    def to_json(self) -> str:
        return json.dumps(
            {
                "lastInstantSynced": self.last_instant_synced,
                "instantsToConsiderForNextSync": self.instants_to_consider_for_next_sync,
                "version": self.version,
                "sourceTableFormat": self.source_table_format,
                "sourceIdentifier": self.source_identifier,
            },
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, raw: str) -> "TableSyncMetadata":
        d = json.loads(raw)
        return cls(
            last_instant_synced=d["lastInstantSynced"],
            instants_to_consider_for_next_sync=d.get("instantsToConsiderForNextSync") or [],
            version=d.get("version", CURRENT_VERSION),
            source_table_format=d.get("sourceTableFormat"),
            source_identifier=d.get("sourceIdentifier"),
        )
