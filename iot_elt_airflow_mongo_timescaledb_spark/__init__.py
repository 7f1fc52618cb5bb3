"""PySpark-native analytics engine with the query & data-processing
capabilities of ``demiurgente/iot-elt-airflow-mongo-timescaledb``.

The reference is an IoT ELT pipeline (Mongo -> dlt -> TimescaleDB -> dbt
models, orchestrated by Airflow).  This package re-expresses everything it
computes as idiomatic PySpark:

- ``sources``    document ingest, BSON-style type normalization, the
                 nested-document flattener (dlt normalize step), and the
                 incremental cursor protocol.
- ``functions``  scalar expression helpers (epoch casts, date keys,
                 age-group bucketing, watermark coalesce).
- ``operators``  join/agg idioms from the reference plus the
                 training-data-pipeline operators (dedup, similarity
                 search, text analysis, tokenization, multimodal
                 plumbing) and the TimescaleDB hyperfunction surface
                 (gapfill/LOCF/interpolate, first/last, OHLC, counter
                 rates, time-weighted averages, LTTB).
- ``plans``      the 13 stage/agg models + 3 example views, the
                 incremental-materialization helper, and the query
                 registry used by ``__spark_entry__.py``.
- ``streaming``  Structured Streaming wrapper for the 15-minute
                 micro-batch sync.

Design target: a 1000-executor cluster reading ~100 TB.  Everything is
declared through the DataFrame/SQL API so Catalyst handles pushdown,
pruning, and join planning; Python never touches row data except in
clearly-marked Pandas-UDF paths.
"""

__version__ = "0.1.0"
