"""Per-wave cost vs accumulated corpus size for the incremental dedup
kernels — the scale-growth evidence for the O(batch + candidates)
per-wave claim (VERDICT r8 item 5).

Method: a 4x corpus is synthesized from sf0.1 documents (each copy's
tokens prefixed with the copy index so copies don't near-dup each
other; doc_id remapped collision-free), then fed to each kernel in
FIXED-SIZE waves. Wave size is held constant while the accumulated
corpus grows ~20x across the run, so any per-wave cost that scales
with CORPUS size (rather than batch size) shows up as a rising trend
in the per-wave ``call_total`` series. Wave 0 pays codegen/worker
warmup; judge the tail.

Usage::

    python tools/growth_bench.py [sf_dir] [n_waves]

Prints one JSON line per kernel with the per-wave seconds and
cumulative corpus rows, then a markdown table (docs/concepts/growth.md
is the committed copy).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from beavers_spark.session import get_spark  # noqa: E402

COPIES = 4


def synth_corpus(spark, sf_dir: str, out_dir: str, n_waves: int) -> int:
    """COPIES token-prefixed copies of the documents table, each doc
    assigned a wave by id hash — fixed wave sizes, copies mixed."""
    from beavers_spark.plans.common import t

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    parts = []
    for k in range(COPIES):
        parts.append(
            docs.select(
                (F.col("doc_id") * COPIES + k).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"c{k}$1").alias(
                    "text"
                ),
            )
        )
    full = parts[0]
    for p in parts[1:]:
        full = full.unionByName(p)
    full = full.withColumn(
        "wave", F.pmod(F.xxhash64("doc_id"), F.lit(n_waves))
    )
    full.repartition(n_waves, "wave").write.mode("overwrite").partitionBy(
        "wave"
    ).parquet(out_dir)
    return spark.read.parquet(out_dir).count()


def run_kernel(spark, name: str, corpus_dir: str, n_waves: int) -> dict:
    from beavers_spark.streaming import (
        IncrementalChunkDedup,
        IncrementalNearDedup,
        IncrementalSubstringDedup,
    )

    with tempfile.TemporaryDirectory() as wd:
        if name == "near":
            kern = IncrementalNearDedup(
                os.path.join(wd, "state"), os.path.join(wd, "pairs"),
                text_col="text", id_col="doc_id", threshold=0.5,
            )
        elif name == "chunk":
            kern = IncrementalChunkDedup(
                os.path.join(wd, "state"), os.path.join(wd, "out"),
                text_col="text", id_col="doc_id", k=10,
            )
        else:
            kern = IncrementalSubstringDedup(
                os.path.join(wd, "state"), os.path.join(wd, "out"),
                text_col="text", id_col="doc_id", k=8,
            )
        corpus = spark.read.parquet(corpus_dir)
        per_wave: list[float] = []
        cum_rows: list[int] = []
        total_rows = 0
        prev = 0.0
        for i in range(n_waves):
            batch = corpus.filter(F.col("wave") == i).select(
                "doc_id", "text"
            )
            total_rows += batch.count()
            t0 = time.perf_counter()
            kern(batch, i)
            wall = time.perf_counter() - t0
            ct = kern.phase_seconds.get("call_total", 0.0)
            # call_total excludes the watermark fast path; wall covers
            # everything — report the kernel-attributed number, fall
            # back to wall if a kernel ever stops recording it
            per_wave.append(round(ct - prev if ct else wall, 3))
            prev = ct
            cum_rows.append(total_rows)
        return {
            "kernel": name,
            "n_waves": n_waves,
            "per_wave_seconds": per_wave,
            "cum_rows": cum_rows,
        }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_waves = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("beavers_spark_growth")
    spark.range(1).count()
    spark.range(64).mapInPandas(lambda it: it, "id long").count()
    results = []
    with tempfile.TemporaryDirectory() as cd:
        corpus_dir = os.path.join(cd, "corpus")
        n = synth_corpus(spark, sf_dir, corpus_dir, n_waves)
        print(f"# corpus: {n} docs in {n_waves} waves", file=sys.stderr)
        for name in ("near", "chunk", "substring"):
            r = run_kernel(spark, name, corpus_dir, n_waves)
            results.append(r)
            print(json.dumps(r))
    # markdown table: wave index vs per-kernel seconds
    print("\n| wave | cum docs | " + " | ".join(r["kernel"] for r in results) + " |")
    print("|---|---|" + "---|" * len(results))
    for i in range(n_waves):
        cells = " | ".join(f"{r['per_wave_seconds'][i]:.2f}" for r in results)
        print(f"| {i} | {results[0]['cum_rows'][i]} | {cells} |")


if __name__ == "__main__":
    main()
