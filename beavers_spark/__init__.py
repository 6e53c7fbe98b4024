"""beavers_spark — a PySpark-native incremental analytics engine.

A from-scratch re-expression of the capabilities of tradewelltech/beavers
(reference at /root/reference, studied for semantics only) on top of
Apache Spark DataFrame / SQL / Structured Streaming:

- ``beavers_spark.dag``        — the incremental dataflow kernel (Dag/Node,
  stream/state duality, cycle driver; reference: beavers/dag.py).
- ``beavers_spark.operators``  — tabular operators (last_by_keys, filters,
  unions, keyed state; reference: beavers/pyarrow_wrapper.py,
  beavers/polars_wrapper.py) expressed as Catalyst-visible DataFrame ops.
- ``beavers_spark.sources``    — parquet replay sources, Kafka source/sink
  config mapping (reference: beavers/replay.py, beavers/kafka.py).
- ``beavers_spark.streaming``  — replay driver with virtual clock, timers,
  cutoff/silence change-suppression (reference: beavers/replay.py,
  beavers/dag.py TimerManager).
- ``beavers_spark.functions``  — analytics function library: text stats,
  dedup (exact/minhash/simhash), embedding similarity, multimodal plumbing
  (beyond-reference surface for large-scale training-data pipelines).
- ``beavers_spark.plans``      — named query plans over the test tables,
  each paired with a DuckDB oracle for correctness checking.
- ``beavers_spark.serving``    — HTTP latest-state dashboard serving
  (reference: beavers/perspective_wrapper.py), Arrow IPC wire format.

Design stance: DataFrame-first so Catalyst gets predicate pushdown, column
pruning, join planning and whole-stage codegen; Python only at the driver
(cycle orchestration) and in clearly-marked Pandas-UDF slow paths.
"""

from beavers_spark.dag import Dag, Node  # noqa: F401
from beavers_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
