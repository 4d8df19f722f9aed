"""Pipeline-cache JSON source.

The reference's pipeline state lives as S3 JSON objects named
``{prefix}/{document_id}.json`` / ``{document_id}_translated_en.json``
(prefixes parser_input / embeddings_input / indexer_input — see
`updated_document_actions.py:89-288`), each holding a ParserInput-shaped
payload. Per-file GET/PUT is the reference's bottleneck; here the cache
is read as ONE DataFrame with an explicit schema so a 100 TB cache scans
in parallel with column pruning, and "rewrite field X of every object"
becomes a join + projection writing a new table version instead of
millions of point PUTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# ParserInput payload (reference types.py ParserInput; cache fixture:
# tests/fixtures/pipeline_out/parser_input/*.json)
PARSER_INPUT_FIELDS = (
    "document_id",
    "document_slug",
    "document_name",
    "document_description",
    "document_source_url",
    "document_type",
    "document_geography",
    "document_cdn_object",
    "document_content_type",
    "document_md5_sum",
)

PARSER_INPUT_SCHEMA = StructType(
    [StructField(f, StringType()) for f in PARSER_INPUT_FIELDS]
)


def read_json_cache(spark: SparkSession, path: str) -> DataFrame:
    """Read cache JSON (JSON-lines or one-object-per-file) as a table.

    The translated-variant flag is recovered from the file name, mirroring
    the reference's ``{id}_translated_en.json`` naming — metadata-column
    derivation, no extra I/O.
    """
    df = spark.read.schema(PARSER_INPUT_SCHEMA).json(path)
    return df.withColumn(
        "translated",
        F.col("_metadata.file_path").contains("_translated_en"),
    )


def src_json_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip query: parser inputs -> JSON sink -> cache source.

    Writes the ingest_parser_input projection through the JSON sink and
    reads it back through the cache source; value-equality with the
    ingest_parser_input oracle proves the sink+source pair is lossless.
    """
    from navigator_data_ingest_spark.operators.ingest import ingest_parser_input
    from navigator_data_ingest_spark.sources.sinks import sink_path, write_parser_input

    out = sink_path("json_cache", sf_dir)
    write_parser_input(ingest_parser_input(spark, sf_dir), out, fmt="json")
    return (
        read_json_cache(spark, out)
        .select(*PARSER_INPUT_FIELDS)
        .orderBy("document_id")
    )
