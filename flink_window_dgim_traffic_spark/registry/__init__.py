"""Registry package: per-family query/oracle modules composed by
__spark_entry__.py (round 11 split).  Each family module exposes
``queries()`` and ``oracles()``; the composition order and the
driver first-50 window live in __spark_entry__._ORDER."""
