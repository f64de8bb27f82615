"""Reference-shaped text sources.

The reference engine's primary inputs (SURVEY.md §1):

- line-oriented text corpus, one line = one document, where the
  document id is the line's **byte offset** in the uncompressed file
  (reference: assignment3/src/main/BuildInvertedIndexCompressed.java:76,
  BooleanRetrievalCompressed.java:124-129);
- adjacency-list graph text: one line per node, whitespace-separated
  ints, first = node id, rest = out-neighbors (reference:
  assignment4/src/main/basic/BuildPageRankRecords.java:79-95);
- 4-column tweet TSV ``id \\t timestamp \\t user \\t message``
  (reference: assignment6/src/main/ExtractHourlyCountsAll.java:38-48).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

TWEETS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("timestamp", T.StringType(), True),
        T.StructField("user", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
    ]
)


def read_text_corpus(
    spark: SparkSession, path: str, doc_id: str = "unique"
) -> DataFrame:
    """Read a one-line-per-document corpus as ``(doc_id, text)``.

    ``doc_id='unique'`` (default) is the scale path: a pure-DataFrame
    scan (``spark.read.text`` + ``monotonically_increasing_id``) —
    every row stays JVM-side in whole-stage codegen, nothing crosses
    into Python. Ids are unique and stable for a given file layout but
    are NOT byte offsets; use this unless byte-offset parity with the
    reference is explicitly required.

    ``doc_id='offset'`` reproduces the reference's byte-offset document
    ids exactly (assignment3/BuildInvertedIndexCompressed.java:76) via
    Hadoop's TextInputFormat. This path serializes each row through the
    Python gateway — opt-in parity mode only, not the 100 TB path.

    ``doc_id='ordinal'`` assigns 0-based line ordinals (zipWithIndex —
    one extra job over the partitions; also a Python-row path).
    """
    if doc_id == "unique":
        return (
            spark.read.text(path)
            .select(
                F.monotonically_increasing_id().alias("doc_id"),
                F.col("value").alias("text"),
            )
        )
    if doc_id == "offset":
        rdd = spark.sparkContext.newAPIHadoopFile(
            path,
            "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
            "org.apache.hadoop.io.LongWritable",
            "org.apache.hadoop.io.Text",
        )
        return spark.createDataFrame(rdd, DOCS_SCHEMA)
    if doc_id == "ordinal":
        rdd = spark.read.text(path).rdd.map(lambda r: r[0]).zipWithIndex()
        return spark.createDataFrame(
            rdd.map(lambda kv: (kv[1], kv[0])), DOCS_SCHEMA
        )
    raise ValueError(f"doc_id must be 'unique', 'offset' or 'ordinal', got {doc_id!r}")


def read_adjacency_text(spark: SparkSession, path: str) -> DataFrame:
    """Read adjacency-list text → ``(id INT, adj ARRAY<INT>)``.

    A one-token line is a dangling node (empty ``adj``), matching the
    reference's BuildPageRankRecords parse.
    """
    raw = spark.read.text(path)
    toks = F.filter(F.split(F.trim(F.col("value")), r"\s+"), lambda x: F.length(x) > 0)
    return (
        raw.where(F.length(F.trim("value")) > 0)
        .select(
            F.element_at(toks, 1).cast("int").alias("id"),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
            .cast("array<int>")
            .alias("adj"),
        )
    )


def read_tweets_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Read the 4-column tweet TSV, dropping malformed (<4 field) rows
    like the reference does (ExtractHourlyCountsAll.java:39,71-73)."""
    return spark.read.csv(
        path, sep="\t", schema=TWEETS_SCHEMA, mode="DROPMALFORMED"
    ).where(F.col("message").isNotNull())


DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSONL (one JSON object per line) document corpus with an
    enforced schema — the interchange format training corpora actually
    ship in.

    Ingestion contract for web-scale crawls: lines that are not valid
    JSON are DROPPED (``mode=DROPMALFORMED``, the same policy as
    :func:`read_tweets_tsv`), and parseable objects missing the id are
    dropped by the not-null filter — garbage never reaches downstream
    operators as half-formed rows. Schema is enforced up front (no
    inference pass over 100 TB; a declared schema also means one scan,
    not Spark's two-pass sampling inference).
    """
    return (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .json(path)
        .where(F.col("doc_id").isNotNull())
    )


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read a headerless CSV document corpus with the same enforced
    schema and DROPMALFORMED ingestion contract as
    :func:`read_documents_jsonl` — the other interchange format
    corpora ship in.

    Quoting is RFC-4180 (``"`` quotes, doubled-``"`` escapes — the
    Spark writer's own convention, so write→read round-trips fields
    containing commas and quotes). Deliberately NOT ``multiLine``:
    multi-line CSV records destroy input-split parallelism (one
    reader per file instead of per block — a non-starter at 100 TB),
    so the contract is that embedded newlines must be escaped
    upstream; rows that consequently fail to parse are dropped, not
    guessed at.
    """
    return (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
        .where(F.col("doc_id").isNotNull())
    )


def read_documents_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC document corpus — the third interchange format
    (after JSONL and CSV) and the first COLUMNAR one: schema enforced
    at read (no inference pass), column pruning and predicate pushdown
    reach the ORC stripe level exactly as they do for parquet (both
    are asserted in tests), and zstd stripes split by block, so
    100 TB of corpus parallelizes per-stripe.

    Unlike the text formats there is no DROPMALFORMED leg: ORC is
    self-describing and checksummed, so a malformed row cannot exist —
    corruption fails the read loudly instead of vanishing rows, which
    is the format's contract (and the reason curated corpora graduate
    from JSONL to a columnar format at rest).
    """
    return spark.read.schema(DOCUMENTS_JSONL_SCHEMA).orc(path)


def read_documents_csv_permissive(spark: SparkSession, path: str) -> DataFrame:
    """PERMISSIVE twin of :func:`read_documents_csv`: instead of
    dropping malformed rows it KEEPS every line and annotates parse
    failures in a ``_corrupt`` column — the quarantine/dead-letter
    ingestion mode. A row whose field fails type conversion surfaces
    with ``_corrupt`` set (and the field nulled); a row that parses
    but violates the CONTRACT (missing doc_id) stays ``_corrupt``-NULL
    — the reader reports, the caller decides. Same RFC-4180 quoting
    and single-line contract as the strict reader.
    """
    # StructType.add MUTATES the receiver — build a fresh copy so the
    # strict readers keep their 5-field schema
    schema = T.StructType(
        list(DOCUMENTS_JSONL_SCHEMA.fields)
        + [T.StructField("_corrupt", T.StringType())]
    )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
