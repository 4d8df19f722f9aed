"""Parse the reference's OWN fixture batch file through our source.

`/root/reference/src/navigator_data_ingest/tests/fixtures/small/
new_and_updated_documents.json` is the real input format the reference
consumes (LawPolicyGenerator, utils.py:19) — nested BackendDocuments,
and an updated_documents map whose Update.s3_value/db_value are
POLYMORPHIC (string or whole-document object). This pins that our
explicit schema reads the production format, not just our synthetic
derivation.
"""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from navigator_data_ingest_spark.operators.ingest import ACTION_OF_TYPE
from navigator_data_ingest_spark.sources.pipeline_updates import (
    read_pipeline_updates,
)

FIXTURE = (
    "/root/reference/src/navigator_data_ingest/tests/fixtures/small/"
    "new_and_updated_documents.json"
)


@pytest.fixture(scope="module")
def raw():
    with open(FIXTURE) as f:
        return json.load(f)


def test_new_documents_parse(spark, raw):
    new_docs, _ = read_pipeline_updates(spark, FIXTURE)
    rows = {r.import_id: r for r in new_docs.collect()}
    assert len(rows) == len(raw["new_documents"])
    for want in raw["new_documents"]:
        got = rows[want["import_id"]]
        assert got.name == want["name"]
        assert got.source_url == want["source_url"]
        assert got.geography == want["geography"]
        assert got.slug == want["slug"]
        assert list(got.languages) == want["languages"]
        assert got.publication_ts.isoformat() == want["publication_ts"]
        assert list(got.metadata.keywords or []) == want["metadata"]["keywords"]


def test_updates_parse_with_polymorphic_values(spark, raw):
    _, updates = read_pipeline_updates(spark, FIXTURE)
    got = {
        (r.document_id, r.seq): r
        for r in updates.collect()
    }
    n_expected = sum(len(v) for v in raw["updated_documents"].values())
    assert len(got) == n_expected
    for doc_id, upds in raw["updated_documents"].items():
        for i, want in enumerate(upds, start=1):
            r = got[(doc_id, i)]
            assert r.update_type == want["type"]
            if isinstance(want["s3_value"], str):
                assert r.s3_value == want["s3_value"]
            else:
                # object captured losslessly as raw JSON text
                assert json.loads(r.s3_value) == want["s3_value"]
            if isinstance(want["db_value"], dict):
                assert json.loads(r.db_value) == want["db_value"]


def test_fixture_update_types_map_to_actions(spark, raw):
    """Every update type in the fixture is covered by the action map."""
    _, updates = read_pipeline_updates(spark, FIXTURE)
    types = {r.update_type for r in updates.select("update_type").distinct().collect()}
    assert types, "fixture has no updates"
    unmapped = types - set(ACTION_OF_TYPE)
    assert not unmapped, f"update types with no action mapping: {unmapped}"


PIPELINE_OUT = (
    "/root/reference/src/navigator_data_ingest/tests/fixtures/pipeline_out"
)


def test_cdn_object_construction_matches_pipeline_out(spark):
    """Rebuild each pipeline_out cdn_object from its inputs.

    The recorded ``document_cdn_object`` is
    ``{geography}/{year(publication_ts)}/{slugify(name)}_{md5}.pdf``
    (new_document_actions.py:30-32 + api_client.py:120). Using the
    fixture's own md5 (we cannot re-download the bytes), our slugify +
    prefix + trimmed-filename expressions must reproduce the recorded
    path byte-for-byte on the reference's REAL document names.
    """
    import glob as globmod

    inp = json.load(
        open(f"{PIPELINE_OUT}/input/2022-11-01T21.53.26.945831/new_and_updated_documents.json")
    )
    by_id = {d["import_id"]: d for d in inp["new_documents"]}
    cases = []
    for path in sorted(globmod.glob(f"{PIPELINE_OUT}/parser_input/*.json")):
        out = json.load(open(path))
        doc = by_id.get(out["document_id"])
        if doc is None or not out.get("document_cdn_object"):
            continue
        cases.append(
            (
                out["document_id"],
                doc["name"],
                doc["geography"],
                doc["publication_ts"][:4],
                out["document_md5_sum"],
                out["document_cdn_object"],
            )
        )
    assert len(cases) >= 10, "expected enriched parser_input fixtures"
    df = spark.createDataFrame(
        [(c[0], c[1], f"{c[2]}/{c[3]}", c[4]) for c in cases],
        "document_id string, name string, prefix string, md5 string",
    )
    from navigator_data_ingest_spark.functions.content import upload_file_name
    from navigator_data_ingest_spark.functions.text import slugify_col

    got = {
        r.document_id: r.cdn
        for r in df.select(
            "document_id",
            upload_file_name(
                F.col("prefix"), slugify_col(F.col("name")), F.col("md5"), F.lit(".pdf")
            ).alias("cdn"),
        ).collect()
    }
    for c in cases:
        assert got[c[0]] == c[5], f"{c[0]}: {got[c[0]]!r} != {c[5]!r}"


def test_archive_plan_covers_pipeline_out_tree(spark, raw):
    """Every file the reference actually archived is predicted by our
    rename plan (tree ⊆ plan; the plan is a superset because it lists
    candidate objects — existence is the mover's concern, and one
    fixture doc errors out before archiving)."""
    import os
    import re

    from navigator_data_ingest_spark.operators.ingest import (
        expand_archive_paths,
        map_update_actions,
        order_update_actions,
    )

    inp = json.load(
        open(f"{PIPELINE_OUT}/input/2022-11-01T21.53.26.945831/new_and_updated_documents.json")
    )
    rows = [
        (doc_id, i + 1, u["type"])
        for doc_id, upds in inp["updated_documents"].items()
        for i, u in enumerate(upds)
    ]
    upd = spark.createDataFrame(rows, "document_id string, seq int, update_type string")
    plan = expand_archive_paths(order_update_actions(map_update_actions(upd)))
    predicted = {
        (r.prefix, r.document_id, r.suffix, r.variant) for r in plan.collect()
    }
    actual = set()
    root = f"{PIPELINE_OUT}/archive"
    for prefix in os.listdir(root):
        for doc_id in os.listdir(f"{root}/{prefix}"):
            for f in os.listdir(f"{root}/{prefix}/{doc_id}"):
                m = re.match(r"[\d-]+\.(json|npy)\s*$", f)
                assert m, f
                actual.add((prefix, doc_id, m.group(1), ""))
    missing = actual - predicted
    assert not missing, f"archived files our plan does not predict: {missing}"
    # and the parse/reparse prefix rules really bite: reparse-only doc
    # 6.6 must NOT plan a parser_input rename
    assert ("parser_input", "TESTCCLW.executive.6.6", "json", "") not in predicted


def test_run_batch_on_reference_fixture(spark, raw, tmp_path):
    """The CLI batch entrypoint processes the reference's real input
    file end-to-end and writes the three output datasets."""
    from navigator_data_ingest_spark.main import run_batch

    out = str(tmp_path / "batch_out")
    counts = run_batch(spark, FIXTURE, out)
    assert counts["parser_input"] == len(raw["new_documents"])
    assert counts["report"] >= 1
    assert counts["archive_plan"] > 0
    pi = spark.read.json(f"{out}/parser_input")
    assert pi.count() == counts["parser_input"]
    assert "document_slug" in pi.columns
    plan = spark.read.parquet(f"{out}/archive_plan")
    assert {r.document_id for r in plan.select("document_id").distinct().collect()} \
        <= set(raw["updated_documents"])
    rep = spark.read.json(f"{out}/report")
    assert rep.where("ingest_type = 'updated'").count() == 1
