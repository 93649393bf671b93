"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ``bencejdanko/flink-window-dgim-traffic``
(Flink DGIM windowed traffic counting), rebuilt Spark-first.

Layout:
- ``dgim``        — pure-Python DGIM sliding-window bit-count sketch
- ``session``     — SparkSession builder tuned for this engine
- ``operators/``  — batch DataFrame operators (windows, parsing,
                    relational, dedup, similarity, text, multimodal)
- ``functions/``  — column-level helpers (vector math, text metrics)
- ``sources/``    — deterministic traffic generator + readers
- ``streaming/``  — Structured Streaming jobs (tumble/hop, upsert sink,
                    stateful incremental DGIM)
- ``plans/``      — plan-inspection utilities (explain audits)
"""

from flink_window_dgim_traffic_spark.dgim import DGIM, dgim_estimate_stream

__all__ = ["DGIM", "dgim_estimate_stream"]
__version__ = "0.1.0"
