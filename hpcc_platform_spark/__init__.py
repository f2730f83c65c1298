"""hpcc_platform_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of HPCC-Platform (reference: hpcc-systems/HPCC-Platform).

This is NOT a port of the reference's C++ engines (hthor/Thor/Roxie). It
re-expresses the ECL-level *capabilities* — the operator surface catalogued in
SURVEY.md §2 (ground truth: ``rtl/include/eclhelper.hpp`` ThorActivityKind
enum in the reference tree) — as idiomatic Spark DataFrame combinators, letting
Catalyst/Tungsten/AQE pick physical strategies the reference hand-implements
(distributed merge sort, broadcast trees, hash distribution, spilling).

Layout
------
- ``session``    : tuned SparkSession factory (AQE on, UTC, arrow).
- ``operators``  : the §2 operator inventory as DataFrame → DataFrame fns.
- ``sources``    : readers/writers (CSV dialects, JSON/XML, index-as-parquet,
                   superfiles, PIPE, inline tables, workunit results).
- ``functions``  : scalar library (Std.Str/Date/Math/Metaphone/hash → F.*).
- ``plans``      : PERSIST content-hash cache, dataset-CSE auto-persist.
- ``streaming``  : Structured Streaming parity (Kafka-shaped, windows).
- ``pipeline``   : LLM-data-pipeline extras: dedup (exact/minhash/simhash),
                   similarity search, text analysis, multimodal columns.
"""

from hpcc_platform_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]

__version__ = "0.1.0"
