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
    # True when the sync that wrote this bookmark ran with row-delete
    # exposure (original paths + delete files) rather than purged shadows;
    # a mode flip between syncs forces a FULL restatement (the two
    # representations use different effective paths)
    row_deletes_mode: bool = False
    # True when the sync ran with the equality-delete channel active
    # (content=2 files re-registered instead of lowered to positions);
    # a flip forces a FULL restatement like row_deletes_mode
    equality_deletes_mode: bool = False
    # non-default source view the sync ran under (e.g. Hudi MOR
    # "snapshot" = log-merged compaction shadows); a view flip between
    # syncs changes every log-bearing slice's effective path, so it
    # forces a FULL restatement like a row-delete-mode flip
    source_view: Optional[str] = None

    def to_json(self) -> str:
        return json.dumps(
            {
                "lastInstantSynced": self.last_instant_synced,
                "instantsToConsiderForNextSync": self.instants_to_consider_for_next_sync,
                "version": self.version,
                "sourceTableFormat": self.source_table_format,
                "sourceIdentifier": self.source_identifier,
                "rowDeletesMode": self.row_deletes_mode,
                "equalityDeletesMode": self.equality_deletes_mode,
                "sourceView": self.source_view,
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
            row_deletes_mode=bool(d.get("rowDeletesMode", False)),
            equality_deletes_mode=bool(d.get("equalityDeletesMode", False)),
            source_view=d.get("sourceView"),
        )
