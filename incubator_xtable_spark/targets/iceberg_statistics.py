"""Iceberg table statistics: Puffin files with
``apache-datasketches-theta-v1`` NDV blobs + the `statistics` field of
the table metadata (Iceberg table spec "Table statistics" section).

The reference writes no statistics files (its conversions carry only
per-file column stats); this goes beyond it so converted tables feed
cost-based optimizers: Trino/Spark read exactly this blob type for NDV.

Layout written here, all from the public specs:
- one Puffin file `metadata/<snapshot-id>-<uuid>.stats` with one theta
  blob per requested column, `fields` = [iceberg field id], blob
  property `ndv` = the rounded estimate (the convention engines read);
- a new metadata.json version whose `statistics` list carries the
  snapshot's entry (statistics-path, file-size-in-bytes,
  file-footer-size-in-bytes, blob-metadata).

Scale: the sketch build is distinct-per-column + k-min pre-reduction
(see functions/theta_sketch.build_column_sketches); the statistics
commit itself is metadata-sized.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Optional

from incubator_xtable_spark.functions.theta_sketch import (
    DEFAULT_LG_K,
    ThetaSketch,
    build_column_sketches,
)
from incubator_xtable_spark.model.puffin import read_blob, read_puffin_footer, write_puffin
from incubator_xtable_spark.targets.iceberg_target import (
    current_metadata_version,
    metadata_dir,
    read_table_metadata,
)

THETA_BLOB_TYPE = "apache-datasketches-theta-v1"


def write_ndv_statistics(
    spark,
    base_path: str,
    columns: Optional[list[str]] = None,
    lg_k: int = DEFAULT_LG_K,
) -> str:
    """Build theta sketches over the CURRENT snapshot's rows and commit
    them as the snapshot's statistics file. Returns the puffin path."""
    from incubator_xtable_spark.sources.iceberg_source import (
        IcebergConversionSource,
        read_iceberg_as_df,
    )

    meta = read_table_metadata(base_path)
    if meta is None:
        raise ValueError(f"not an iceberg table: {base_path}")
    snapshot_id = meta["current-snapshot-id"]
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == snapshot_id)
    seq = int(snap.get("sequence-number") or 0)

    table = IcebergConversionSource(spark, base_path).get_current_table()
    field_ids = {
        f.name: (f.metadata or {}).get("xtable.fieldId") for f in table.read_schema.fields
    }
    cols = columns or [
        f.name
        for f in table.read_schema.fields
        # sketchable leaf types only — nested/binary columns are skipped
        if f.dataType.typeName()
        in ("string", "long", "integer", "short", "byte", "double", "float", "boolean", "date")
    ]
    df = read_iceberg_as_df(spark, base_path)
    sketches = build_column_sketches(spark, df.select(*cols), columns=cols, lg_k=lg_k)

    blobs = []
    for col, sk in sketches.items():
        blobs.append(
            (
                THETA_BLOB_TYPE,
                sk.to_bytes(),
                {"ndv": str(round(sk.estimate()))},
                [field_ids[col]] if field_ids.get(col) is not None else [],
            )
        )
    stats_path = os.path.join(
        metadata_dir(base_path), f"{snapshot_id}-{uuid.uuid4().hex[:12]}.stats"
    )
    metas = write_puffin(
        stats_path,
        blobs,
        file_properties={"created-by": "incubator_xtable_spark"},
        snapshot_id=snapshot_id,
        sequence_number=seq,
    )
    read_puffin_footer(stats_path)  # validates what we just wrote
    file_size = os.path.getsize(stats_path)
    # spec: footer size = everything after the last blob (FooterPayload
    # + its framing magics/size/flags)
    last_end = max((m["offset"] + m["length"] for m in metas), default=4)
    footer_size = file_size - last_end

    entry = {
        "snapshot-id": snapshot_id,
        "statistics-path": stats_path,
        "file-size-in-bytes": file_size,
        "file-footer-size-in-bytes": footer_size,
        "blob-metadata": metas,
    }
    _commit_statistics_entry(base_path, entry)
    return stats_path


def _commit_statistics_entry(base_path: str, entry: dict) -> None:
    """New metadata.json version: replace any prior statistics entry for
    the same snapshot, keep others (spec: one entry per snapshot). A
    replaced entry's puffin file is unreferenced the moment the new
    metadata version lands — unlink it (orphans would otherwise grow
    one per re-collection)."""
    meta = read_table_metadata(base_path)
    replaced = [
        s for s in meta.get("statistics", []) if s["snapshot-id"] == entry["snapshot-id"]
    ]
    stats = [
        s for s in meta.get("statistics", []) if s["snapshot-id"] != entry["snapshot-id"]
    ]
    meta["statistics"] = stats + [entry]
    v = current_metadata_version(base_path) + 1
    final = os.path.join(metadata_dir(base_path), f"v{v}.metadata.json")
    tmp = final + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(meta, fh)
    try:
        os.link(tmp, final)
    except FileExistsError as exc:
        raise RuntimeError(f"concurrent iceberg commit at version {v}") from exc
    finally:
        os.unlink(tmp)
    with open(os.path.join(metadata_dir(base_path), "version-hint.text"), "w") as fh:
        fh.write(str(v))
    # only after the new version landed: the replaced puffin is garbage
    for s in replaced:
        p = s.get("statistics-path")
        if p and p != entry["statistics-path"] and os.path.exists(p):
            os.unlink(p)


def has_statistics_for_current_snapshot(base_path: str) -> bool:
    """Cheap skip probe for schedulers: True when the CURRENT snapshot
    already carries a statistics entry (a no-op sync needs no
    re-collection — sketching scans every sketchable column)."""
    meta = read_table_metadata(base_path)
    if meta is None:
        return False
    sid = meta.get("current-snapshot-id")
    return any(s["snapshot-id"] == sid for s in meta.get("statistics", []))


def read_ndv_statistics(base_path: str, snapshot_id: Optional[int] = None) -> dict[str, dict]:
    """{column-ish key: {"ndv": int, "sketch": ThetaSketch}} for the
    given (default: current) snapshot, decoded with our own deserializer.
    Keys are field ids rendered as `field:<id>` (the blob names fields by
    id, not name — resolve names via the table schema if needed)."""
    meta = read_table_metadata(base_path)
    if meta is None:
        raise ValueError(f"not an iceberg table: {base_path}")
    sid = snapshot_id if snapshot_id is not None else meta["current-snapshot-id"]
    entry = next((s for s in meta.get("statistics", []) if s["snapshot-id"] == sid), None)
    if entry is None:
        return {}
    out = {}
    for bm in entry["blob-metadata"]:
        if bm["type"] != THETA_BLOB_TYPE:
            continue
        sk = ThetaSketch.from_bytes(read_blob(entry["statistics-path"], bm["offset"], bm["length"]))
        key = f"field:{bm['fields'][0]}" if bm.get("fields") else f"blob:{bm['offset']}"
        out[key] = {"ndv": int(bm["properties"].get("ndv", round(sk.estimate()))), "sketch": sk}
    return out
