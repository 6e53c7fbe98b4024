"""Per-wave cost vs accumulated corpus size for the incremental dedup
kernels — the scale-growth evidence for the O(batch + candidates)
per-wave claim (VERDICT r8 item 5), with per-PHASE attribution and a
compaction cadence so any rising term is NAMED and its maintenance
answer is measured in the same run (VERDICT r9 item 2).

Method: an N-copy corpus is synthesized from sf0.1 documents (each
copy's tokens prefixed with the copy index so copies don't near-dup
each other; doc_id remapped collision-free; copy count scales with the
requested wave count so wave size stays ~1,000 docs), then fed to each
kernel in FIXED-SIZE waves. Wave size is held constant while the
accumulated corpus grows across the run, so any per-wave cost that
scales with CORPUS size (rather than batch size) shows up as a rising
trend in the per-wave ``call_total`` series — and the per-wave
``phase_seconds`` deltas say WHICH phase is rising. Wave 0 pays
codegen/worker warmup; judge the tail.

With ``--compact-every N`` the kernels run their own
``compact_every_waves`` cadence (the round-10 auto-compaction knob):
the table shows whether post-compaction per-wave cost returns to the
early-wave plateau — i.e. whether the slope is the un-compacted wave
count and nothing else.

Usage::

    python tools/growth_bench.py [sf_dir] [n_waves] [--compact-every N]
        [--kernels near,chunk,substring]   # or --kernels forget for
        # the GDPR sweep-vs-corpus-size table (run_forget_growth)

Prints one JSON line per kernel with the per-wave seconds, per-wave
phase deltas and cumulative corpus rows, then a markdown summary
(docs/concepts/growth.md is the committed copy).
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

#: target docs per wave — the fixed batch size the claim is about
WAVE_DOCS = 1000


def synth_corpus(spark, sf_dir: str, out_dir: str, n_waves: int) -> int:
    """Token-prefixed copies of the documents table, enough to keep
    ~WAVE_DOCS docs per wave; each doc assigned a wave by id hash —
    fixed wave sizes, copies mixed."""
    from beavers_spark.plans.common import t

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.count()
    copies = max(4, -(-n_waves * WAVE_DOCS // base))  # ceil division
    parts = []
    for k in range(copies):
        parts.append(
            docs.select(
                (F.col("doc_id") * copies + k).alias("doc_id"),
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


def _avi_payloads(batch):
    """(doc_id, payload) frame-AVI batch from a (doc_id, text) one —
    the bench/_synth_frame_avis generator shape (3-8 frames of 20-36
    bytes, byte j = (d*11 + f*13 + j) % 256) over the growth corpus's
    remapped ids: 256*5 content classes, so frames duplicate heavily
    across copies — the regime the frame registry exists for."""
    from beavers_spark.functions.multimodal import synth_avi, synth_movi

    nf = 3 + F.pmod("doc_id", F.lit(6))

    def frame_bytes(f):
        size = F.lit(20) + F.pmod(f, F.lit(5)) * 4
        return F.array_join(
            F.transform(
                F.sequence(
                    F.lit(0).cast("bigint"), (size - 1).cast("bigint")
                ),
                lambda j: F.lpad(
                    F.hex(
                        F.pmod(
                            F.col("doc_id") * 11 + f * 13 + j,
                            F.lit(256),
                        )
                    ),
                    2,
                    "0",
                ),
            ),
            "",
        )

    return batch.select(
        "doc_id",
        synth_avi(
            synth_movi(nf, frame_bytes),
            F.lit(33333), nf, F.lit(64), F.lit(48),
        ).alias("payload"),
    )


def run_kernel(
    spark, name: str, corpus_dir: str, n_waves: int, compact_every=None
) -> dict:
    from beavers_spark.streaming import (
        IncrementalChunkDedup,
        IncrementalFrameNearDedup,
        IncrementalNearDedup,
        IncrementalSubstringDedup,
    )
    from beavers_spark.streaming.maintenance import live_wave_count

    # pass the knob EXPLICITLY either way: the kernels now default to
    # compact_every_waves=16 (the production posture, r11), and the
    # no-flag run here must stay the NO-maintenance baseline
    kw = {"compact_every_waves": compact_every}
    with tempfile.TemporaryDirectory() as wd:
        if name == "near":
            kern = IncrementalNearDedup(
                os.path.join(wd, "state"), os.path.join(wd, "pairs"),
                text_col="text", id_col="doc_id", threshold=0.5, **kw,
            )
        elif name == "chunk":
            kern = IncrementalChunkDedup(
                os.path.join(wd, "state"), os.path.join(wd, "out"),
                text_col="text", id_col="doc_id", k=10, **kw,
            )
        elif name == "frame":
            # the MEDIA-tier growth evidence: per-wave payload decode
            # is batch-sized by construction; what could grow is the
            # band-registry probe — the default bloom_min_waves=8
            # gate opens mid-run, so the same table shows cost before
            # the probe, at gate-open (lazy backfill), and after
            kern = IncrementalFrameNearDedup(
                os.path.join(wd, "state"), os.path.join(wd, "pairs"),
                bucket_cap=8, **kw,
            )
        else:
            kern = IncrementalSubstringDedup(
                os.path.join(wd, "state"), os.path.join(wd, "out"),
                text_col="text", id_col="doc_id", k=8, **kw,
            )
        corpus = spark.read.parquet(corpus_dir)
        per_wave: list[float] = []
        cum_rows: list[int] = []
        phases: list[dict] = []
        live_waves: list[int] = []
        total_rows = 0
        prev_phases: dict[str, float] = {}
        for i in range(n_waves):
            batch = corpus.filter(F.col("wave") == i).select(
                "doc_id", "text"
            )
            if name == "frame":
                batch = _avi_payloads(batch)
            total_rows += batch.count()
            t0 = time.perf_counter()
            kern(batch, i)
            wall = time.perf_counter() - t0
            snap = dict(kern.phase_seconds)
            delta = {
                k: round(v - prev_phases.get(k, 0.0), 3)
                for k, v in snap.items()
                if v - prev_phases.get(k, 0.0) > 0.0005
            }
            prev_phases = snap
            ct = delta.get("call_total", 0.0)
            # call_total excludes the watermark fast path; wall covers
            # everything — report the kernel-attributed number, fall
            # back to wall if a kernel ever stops recording it
            per_wave.append(round(ct if ct else wall, 3))
            phases.append(delta)
            cum_rows.append(total_rows)
            live_waves.append(live_wave_count(kern.state_path))
        return {
            "kernel": name,
            "n_waves": n_waves,
            "compact_every": compact_every,
            "auto_compactions": getattr(kern, "auto_compactions", 0),
            "per_wave_seconds": per_wave,
            "cum_rows": cum_rows,
            "live_waves": live_waves,
            "per_wave_phases": phases,
        }


def run_forget_growth(
    spark, corpus_dir: str, n_waves: int, every: int = 10
) -> dict:
    """Forget-sweep cost vs accumulated corpus size (VERDICT r12 item
    6): ingest the chunk kernel's waves and, every ``every`` waves,
    forget a bounded victim sample drawn from the JUST-INGESTED wave —
    one home wave by construction — timing the sweep. The
    Bloom-targeting claim ("a handful of wave dirs at 100 TB") holds
    iff ``waves_rewritten`` stays at 2 (registry + output home wave)
    and sweep seconds stay ~flat while the live wave count grows; a
    sweep that scales with the corpus would rise with the checkpoint
    index. Victims are REAL deletions (not re-ingested), so each
    checkpoint's corpus is the accumulated stream minus prior
    requests — exactly a production table's shape. Raises RuntimeError
    if any sweep rewrites more than its O(request) bound."""
    from beavers_spark.streaming import IncrementalChunkDedup

    with tempfile.TemporaryDirectory() as wd:
        kern = IncrementalChunkDedup(
            os.path.join(wd, "state"), os.path.join(wd, "out"),
            text_col="text", id_col="doc_id", k=10,
            compact_every_waves=None,
        )
        corpus = spark.read.parquet(corpus_dir)
        checkpoints: list[dict] = []
        from beavers_spark.streaming.maintenance import live_wave_count

        for i in range(n_waves):
            batch = corpus.filter(F.col("wave") == i).select(
                "doc_id", "text"
            )
            kern(batch, i)
            if (i + 1) % every == 0:
                victims = [
                    r.doc_id
                    for r in batch.filter(
                        F.pmod("doc_id", F.lit(10)) == 3
                    ).limit(64).collect()
                ]
                t0 = time.perf_counter()
                rewritten = kern.forget(spark, victims)
                sweep = time.perf_counter() - t0
                live = live_wave_count(kern.state_path)
                checkpoints.append(
                    {
                        "after_wave": i,
                        "live_waves": live,
                        "victims": len(victims),
                        "waves_rewritten": rewritten,
                        "sweep_seconds": round(sweep, 3),
                    }
                )
                if rewritten > 2:
                    raise RuntimeError(
                        f"forget after wave {i} rewrote {rewritten} "
                        "wave dirs — the Bloom targeting must bound "
                        "this at 2 (registry + output home wave)"
                    )
        # the documented worst case, measured: compact() merges every
        # wave into w=-1 (OR-merged sidecar), so the next forget's
        # rewrite unit is the whole compacted table — still 2 wave
        # DIRS (registry + output w=-1), but the bytes are the corpus
        # (forget_doc_rows docstring "blast radius = the compaction
        # epoch"). The row quantifies that degradation beside the
        # targeted sweeps above.
        kern.compact(spark)
        victims = [
            r.doc_id
            for r in corpus.filter(F.col("wave") == n_waves - 1)
            .select("doc_id")
            .filter(F.pmod("doc_id", F.lit(10)) == 7)
            .limit(64)
            .collect()
        ]
        t0 = time.perf_counter()
        rewritten = kern.forget(spark, victims)
        checkpoints.append(
            {
                "after_wave": "post-compact",
                "live_waves": live_wave_count(kern.state_path),
                "victims": len(victims),
                "waves_rewritten": rewritten,
                "sweep_seconds": round(time.perf_counter() - t0, 3),
            }
        )
        return {"kernel": "forget", "n_waves": n_waves,
                "checkpoints": checkpoints}


def _mean(xs) -> float:
    return round(sum(xs) / max(len(xs), 1), 3)


def summarize(r: dict) -> None:
    """Early plateau vs late tail, per phase — names the rising term."""
    n = r["n_waves"]
    early = range(2, min(8, n))
    late = range(max(n - 6, min(8, n // 2)), n)
    keys = sorted({k for d in r["per_wave_phases"] for k in d})
    print(
        f"\n## {r['kernel']} (compact_every={r['compact_every']}, "
        f"auto_compactions={r['auto_compactions']})"
    )
    print("| phase | early mean (w2-7) | late mean (last 6) | delta |")
    print("|---|---|---|---|")
    for k in keys:
        e = _mean([r["per_wave_phases"][i].get(k, 0.0) for i in early])
        l = _mean([r["per_wave_phases"][i].get(k, 0.0) for i in late])
        print(f"| {k} | {e:.3f} | {l:.3f} | {l - e:+.3f} |")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_waves = int(args[1]) if len(args) > 1 else 20
    compact_every = None
    kernels = ("near", "chunk", "substring")
    for a in sys.argv[1:]:
        if a.startswith("--compact-every"):
            compact_every = int(a.split("=", 1)[1])
        elif a.startswith("--kernels"):
            kernels = tuple(a.split("=", 1)[1].split(","))
    spark = get_spark("beavers_spark_growth")
    spark.range(1).count()
    spark.range(64).mapInPandas(lambda it: it, "id long").count()
    results = []
    with tempfile.TemporaryDirectory() as cd:
        corpus_dir = os.path.join(cd, "corpus")
        n = synth_corpus(spark, sf_dir, corpus_dir, n_waves)
        print(f"# corpus: {n} docs in {n_waves} waves", file=sys.stderr)
        for name in kernels:
            if name == "forget":
                fr = run_forget_growth(spark, corpus_dir, n_waves)
                print(json.dumps(fr))
                print("\n| after wave | live waves | victims | "
                      "waves rewritten | sweep sec |")
                print("|---|---|---|---|---|")
                for c in fr["checkpoints"]:
                    print(
                        f"| {c['after_wave']} | {c['live_waves']} | "
                        f"{c['victims']} | {c['waves_rewritten']} | "
                        f"{c['sweep_seconds']:.2f} |"
                    )
                continue
            r = run_kernel(
                spark, name, corpus_dir, n_waves,
                compact_every=compact_every,
            )
            results.append(r)
            print(json.dumps(r))
    # markdown table: wave index vs per-kernel seconds
    if results:
        print(
            "\n| wave | cum docs | "
            + " | ".join(r["kernel"] for r in results)
            + " |"
        )
        print("|---|---|" + "---|" * len(results))
        for i in range(n_waves):
            cells = " | ".join(
                f"{r['per_wave_seconds'][i]:.2f}" for r in results
            )
            print(f"| {i} | {results[0]['cum_rows'][i]} | {cells} |")
    for r in results:
        summarize(r)


if __name__ == "__main__":
    main()
