"""mapreduce_assignments_spark — a PySpark-native analytics engine.

A brand-new, DataFrame-first engine reproducing the query and
data-processing capabilities of the reference repo
``jgbradley1/MapReduce-assignments`` (Hadoop MapReduce course
assignments: word/bigram counts, windowed co-occurrence, PMI,
compressed inverted index + boolean retrieval, PageRank /
personalized PageRank, hourly tweet-count ETL), plus the
large-scale training-data-pipeline operators a 100 TB corpus needs
(dedup, similarity search, text analysis, multimodal plumbing).

Design principles (see SURVEY.md):
- Declare logical plans with the DataFrame/SQL API; let Catalyst +
  Tungsten pick physical strategy (partial aggregation replaces
  hand-written combiners, broadcast-join selection replaces
  Configuration side-channels, etc.).
- Stay JVM-side: built-in ``pyspark.sql.functions`` and higher-order
  array functions in the hot path; Pandas UDFs only where built-ins
  genuinely cannot express the semantics (multimodal decode).
- Partitioning-aware: iterative graph state is hash-partitioned once
  and cached; big aggregations rely on map-side partial agg; small
  dimension joins are broadcast.
"""

__version__ = "0.1.0"
