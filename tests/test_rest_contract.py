"""REST service contract conformance (VERDICT r10 #5): parse the
reference's formal OpenAPI contract
(/root/reference/spec/rest-service-open-api.yaml) and assert the
engine's ConversionService request/response shapes carry exactly the
contract's field names — the facade (`service.py`) mirrors
ConversionService.java behaviorally, this pins it STRUCTURALLY against
the published spec.

The environment ships no PyYAML, so a ~40-line indentation parser
covers the YAML subset this one file uses (nested mappings, scalar
lists, `|` block scalars). The parser itself is pinned by asserting
known contract facts (paths, required lists) before any engine check.
"""

from __future__ import annotations

import os

import pytest

SPEC = "/root/reference/spec/rest-service-open-api.yaml"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPEC), reason="reference OpenAPI spec not present"
)


def _parse_yaml_subset(text: str):
    """Indentation-based parser for the spec's YAML subset: mappings,
    lists of scalars ('- x'), scalar values, and '|' block scalars
    (consumed as opaque strings). Comments and blank lines skipped."""
    lines = []
    for raw in text.splitlines():
        stripped = raw.split("#", 1)[0].rstrip() if raw.lstrip().startswith("#") is False else ""
        # keep inline '#' inside quoted values intact — this spec has none
        # in positions we read; a full-line comment strips to empty
        if raw.lstrip().startswith("#"):
            continue
        if not raw.strip():
            continue
        lines.append(raw.rstrip("\n"))

    def indent(s: str) -> int:
        return len(s) - len(s.lstrip(" "))

    def parse_block(i: int, ind: int):
        """Parse the block whose entries sit at indentation ``ind``,
        starting at line i. Returns (value, next_i)."""
        # list?
        if i < len(lines) and indent(lines[i]) == ind and lines[i].lstrip().startswith("- "):
            out = []
            while i < len(lines) and indent(lines[i]) == ind and lines[i].lstrip().startswith("- "):
                item = lines[i].lstrip()[2:].strip()
                if item.endswith(":") or ": " in item:
                    # list of mappings: re-parse the item as a mapping whose
                    # first key is inline (used by 'servers:' — we don't
                    # read those, so consume conservatively)
                    j = i + 1
                    while j < len(lines) and indent(lines[j]) > ind:
                        j += 1
                    out.append(item)
                    i = j
                else:
                    out.append(item.strip("'\""))
                    i += 1
            return out, i
        # mapping
        out = {}
        while i < len(lines) and indent(lines[i]) == ind:
            line = lines[i].lstrip()
            if line.startswith("- "):
                break
            key, _, rest = line.partition(":")
            key = key.strip().strip("'\"")
            rest = rest.strip()
            if rest == "|" or rest == ">":
                # block scalar: consume deeper lines as one string
                j = i + 1
                buf = []
                while j < len(lines) and indent(lines[j]) > ind:
                    buf.append(lines[j].strip())
                    j += 1
                out[key] = " ".join(buf)
                i = j
            elif rest:
                out[key] = rest.strip("'\"")
                i += 1
            else:
                j = i + 1
                if j < len(lines) and indent(lines[j]) > ind:
                    out[key], i = parse_block(j, indent(lines[j]))
                else:
                    out[key] = None
                    i = j
        return out, i

    val, _ = parse_block(0, indent(lines[0]))
    return val


@pytest.fixture(scope="module")
def spec():
    with open(SPEC, encoding="utf-8") as fh:
        doc = _parse_yaml_subset(fh.read())
    # parser self-check against facts read straight off the spec text
    assert doc["openapi"].startswith("3."), doc.get("openapi")
    assert "/v1/conversion/table" in doc["paths"]
    assert "/v1/conversion/table/{conversion-id}" in doc["paths"]
    return doc


def _schema(spec, name: str) -> dict:
    return spec["components"]["schemas"][name]


def test_contract_request_schema_matches_service_reads(spec):
    req = _schema(spec, "ConvertTableRequest")
    assert set(req["required"]) == {
        "source-format",
        "source-table-name",
        "source-table-path",
        "target-formats",
    }
    props = set(req["properties"])
    assert props == {
        "source-format",
        "source-table-name",
        "source-table-path",
        "target-formats",
        "configurations",
    }


def test_contract_response_schema_shapes(spec):
    resp = _schema(spec, "ConvertTableResponse")
    assert resp["required"] == ["conversions"]
    assert set(resp["properties"]) == {"conversions"}
    tt = _schema(spec, "TargetTable")
    assert set(tt["required"]) == {"target-format", "target-metadata-path"}
    assert set(tt["properties"]) == {
        "target-format",
        "target-metadata-path",
        "target-schema",
    }
    err = _schema(spec, "ErrorModel")
    assert set(err["required"]) == {"message", "type", "code"}


# engine extensions beyond the contract's TargetTable (OpenAPI objects
# without additionalProperties:false admit extra fields); anything NOT
# in this set and NOT in the contract is a conformance failure
_ENGINE_EXTENSIONS = {"sync-status", "sync-mode", "error"}


def test_service_response_conforms_to_contract(spark, tmp_path, spec):
    from incubator_xtable_spark.service import ConversionService

    from .conftest import SF_SMOKE

    d = str(tmp_path / "contract_table")
    spark.read.parquet(f"{SF_SMOKE}/region.parquet").coalesce(1).write.parquet(d)
    svc = ConversionService(spark)
    req_schema = _schema(spec, "ConvertTableRequest")
    # request built from EXACTLY the contract's required field names
    request = {
        "source-format": "PARQUET",
        "source-table-name": "contract_t",
        "source-table-path": d,
        "target-formats": ["DELTA", "ICEBERG"],
    }
    assert set(request) == set(req_schema["required"])
    resp = svc.convert_table(request)

    resp_schema = _schema(spec, "ConvertTableResponse")
    assert set(resp) == set(resp_schema["required"]) == {"conversions"}
    tt = _schema(spec, "TargetTable")
    tt_required = set(tt["required"])
    tt_props = set(tt["properties"])
    assert len(resp["conversions"]) == 2
    for entry in resp["conversions"]:
        missing = tt_required - set(entry)
        assert not missing, f"contract-required fields absent: {missing}"
        extra = set(entry) - tt_props - _ENGINE_EXTENSIONS
        assert not extra, f"fields neither in contract nor declared extensions: {extra}"
        assert isinstance(entry["target-format"], str)
        assert os.path.exists(entry["target-metadata-path"])
        assert isinstance(entry["target-schema"], str) and entry["target-schema"]
