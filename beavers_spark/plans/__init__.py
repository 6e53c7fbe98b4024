"""Named query plans, each paired with a DuckDB oracle SQL string.

Every operator claimed in SURVEY.md §2 gets an entry here; the driver runs
the Spark plan and the oracle side-by-side and hash-compares the results.

Conventions for hash-match robustness (the driver sorts columns by name and
hashes values):
- every computed column is aliased identically on both sides;
- double aggregates are ``round(x, 4)`` on both sides (sum order across
  engines differs in the last bits);
- per-row double arithmetic is ``round(x, 6)`` (bitwise identical, rounded
  defensively);
- timestamps in outputs are converted to epoch microseconds
  (``unix_micros`` / ``epoch_us``) so precision semantics can't diverge;
- integer sums are cast to BIGINT in the oracle (DuckDB widens to INT128).
"""

from beavers_spark.plans.registry import ORACLES, QUERIES, query  # noqa: F401

# Import registers the plans.
from beavers_spark.plans import relational  # noqa: E402,F401
from beavers_spark.plans import tpch  # noqa: E402,F401
from beavers_spark.plans import llmops  # noqa: E402,F401
from beavers_spark.plans import curation  # noqa: E402,F401
from beavers_spark.plans import streaming_parity  # noqa: E402,F401
from beavers_spark.plans import views_setops  # noqa: E402,F401
from beavers_spark.plans import analytics  # noqa: E402,F401
from beavers_spark.plans import storage  # noqa: E402,F401
from beavers_spark.plans import selection  # noqa: E402,F401
from beavers_spark.plans import classifier  # noqa: E402,F401
from beavers_spark.plans import pca  # noqa: E402,F401
from beavers_spark.plans import bpe  # noqa: E402,F401
