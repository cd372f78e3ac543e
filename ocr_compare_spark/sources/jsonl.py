"""Dolma-shaped JSONL corpus interchange (documents + attributes).

The open-data LLM pipelines (Dolma, RedPajama, FineWeb releases)
exchange corpora as gzipped JSONL: a ``documents/`` tree of
``{"id", "text", "source", "metadata": {...}}`` records, plus
parallel ``attributes/<attr_set>/`` trees carrying per-document
annotation records ``{"id", "attributes": {...}}`` that later stages
join back by id WITHOUT rewriting the (huge) text files. This module
is that interchange on Spark:

- :func:`write_documents` / :func:`read_documents` — the documents
  tree, one directory per partition value (Hive-style ``lang=xx``),
  gzip-compressed JSON lines via Spark's native json writer (JVM-side
  serialization; no Python in the row path).
- :func:`write_attributes` / :func:`read_attributes` — an attribute
  set (e.g. quality scores, dedup flags) keyed by id; reading returns
  the flat columns again.
- :func:`join_attributes` — the Dolma consumption pattern: documents
  joined to one-or-more attribute sets by id (equi joins on the id
  hash — scale-safe; attribute records are slim).

Scale notes: JSONL-gz is a LINE format — splittable only at file
granularity (gzip), so shard counts = write parallelism decides read
parallelism; ``shards_per_partition`` controls that explicitly
instead of inheriting whatever the upstream partitioning was. Schema
is carried in the data (json), so readers pass an explicit schema or
accept one inference pass; read_documents takes the explicit-schema
path (inference over 100 TB is a full extra scan).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

#: Dolma document record schema (metadata stays a json STRING on the
#: Spark side so arbitrary per-corpus fields round-trip unmodified).
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("metadata", T.StringType(), True),
    ]
)


def write_documents(
    df: DataFrame,
    path: str,
    id_col: str = "id",
    text_col: str = "text",
    source_col: str | None = None,
    metadata_cols: list[str] | None = None,
    partition_by: str | None = None,
    shards_per_partition: int | None = None,
) -> None:
    """Write a Dolma documents tree: gzip JSONL, one record per doc.

    ``metadata_cols`` pack into the nested ``metadata`` object (JVM
    to_json — no Python serialization). ``partition_by`` makes
    Hive-style subdirectories (``lang=en/``); ``shards_per_partition``
    repartitions by the partition key first so each directory gets a
    bounded, even file count (gzip files are the read-parallelism
    unit — see module notes)."""
    out = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(text_col).alias("text"),
        (F.col(source_col) if source_col else F.lit(None).cast("string")).alias("source"),
        (
            F.to_json(F.struct(*[F.col(c) for c in metadata_cols]))
            if metadata_cols
            else F.lit(None).cast("string")
        ).alias("metadata"),
        *( [F.col(partition_by)] if partition_by else [] ),
    )
    if shards_per_partition:
        keys = [F.col(partition_by)] if partition_by else []
        out = out.repartition(shards_per_partition, *keys, F.col("id"))
    w = out.write.mode("overwrite").option("compression", "gzip")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.json(path)


def read_documents(
    spark: SparkSession, path: str, partition_by: str | None = None
) -> DataFrame:
    """Read a documents tree back. Explicit schema (no inference
    scan); Hive partition columns come back from the directory names."""
    schema = DOCUMENTS_SCHEMA
    if partition_by:
        schema = schema.add(T.StructField(partition_by, T.StringType(), True))
    return spark.read.schema(schema).json(path)


def write_attributes(
    df: DataFrame,
    path: str,
    attr_cols: list[str],
    id_col: str = "id",
) -> None:
    """Write one attribute set: slim ``{"id", "attributes": {...}}``
    records (the Dolma annotate-without-rewriting-text contract)."""
    df.select(
        F.col(id_col).cast("string").alias("id"),
        F.to_json(F.struct(*[F.col(c) for c in attr_cols])).alias("attributes"),
    ).write.mode("overwrite").option("compression", "gzip").json(path)


def read_attributes(
    spark: SparkSession, path: str, attr_schema: T.StructType
) -> DataFrame:
    """Read an attribute set back to flat columns (id + one column
    per attribute). ``attr_schema`` types the attributes object —
    explicit, like read_documents."""
    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("attributes", T.StringType(), True),
        ]
    )
    raw = spark.read.schema(schema).json(path)
    parsed = raw.select(
        "id", F.from_json("attributes", attr_schema).alias("_a")
    )
    return parsed.select("id", *[F.col(f"_a.{f.name}").alias(f.name) for f in attr_schema.fields])


def join_attributes(docs: DataFrame, *attrs: DataFrame) -> DataFrame:
    """Documents + N attribute sets by id (left joins: a doc missing
    from an attribute set keeps nulls — annotation sets are allowed
    to be partial in Dolma)."""
    out = docs
    for a in attrs:
        out = out.join(a, "id", "left")
    return out


def metadata_field(df: DataFrame, field: str, dtype: str = "string") -> DataFrame:
    """Pull one typed field back out of the metadata json string."""
    return df.withColumn(
        field, F.get_json_object("metadata", f"$.{field}").cast(dtype)
    )


def py_document_record(id: str, text: str, source=None, metadata=None) -> str:
    """Reference single-record serializer (pytest mirror)."""
    rec = {"id": id, "text": text, "source": source,
           "metadata": metadata if metadata is not None else None}
    return json.dumps({k: v for k, v in rec.items() if v is not None})
