"""stock_market_etl_spark — a PySpark-native analytics engine.

A brand-new, idiomatic Spark implementation of the query and
data-processing capabilities of the reference ETL pipeline
(``swang99/stock-market-etl``): partitioned-parquet lake I/O, windowed
stock metrics (daily return, rolling volatility), incremental
high-watermark loads with idempotent merge semantics, a dashboard query
library, plus large-scale training-data operators (dedup, similarity
search, text analysis, multimodal plumbing) and a Structured Streaming
surface.

Design stance (SURVEY.md §7): pure DataFrame/SQL declarative plans so
Catalyst/AQE handle optimization; broadcast joins for small dimensions;
partition-pruned scans instead of hand-built object keys; no driver-side
collects in any data path; Pandas UDFs only where built-ins cannot
express the semantics.
"""

from stock_market_etl_spark.session import get_spark, prepare_session

__all__ = ["get_spark", "prepare_session"]
