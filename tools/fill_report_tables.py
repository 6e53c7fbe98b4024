"""Fill OPTIMIZATION_r13.md's checklist tables from bench artifacts.

Reads the before numbers from the pre-round committed history
(BENCH_r01..r12 summaries, i.e. BENCH_BEST minus this round's folds is
not recoverable — so we parse BENCH_r*.json directly) and the after
numbers from a final-run detail JSON.

Usage: python tools/fill_report_tables.py <final_detail.json>
"""

from __future__ import annotations

import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ACTIONS_STATE = {
    "inc_keyed_state": "left alone (bucketed upsert already minimal)",
    "inc_near_dedup": "rebalance sig write (no shrink job)",
    "inc_near_dedup_probed": "rebalance sig write",
    "inc_near_dedup_disjoint": "rebalance sig write",
    "inc_near_dedup_overcap": "rebalance sig write",
    "inc_ivf_index": "left alone (cell-partitioned ingest+search)",
    "inc_ivfpq_index": "left alone",
    "inc_clusters": "left alone (bounded union-find + broadcast)",
    "inc_chunk_dedup": "struct-min ownership; overlapped commits",
    "inc_chunk_dedup_probed": "struct-min ownership; overlapped commits",
    "inc_chunk_dedup_auto": "struct-min + overlap (cadence = contract)",
    "inc_forget": "struct-min + overlap ingest (sweep = contract)",
    "inc_substring_dedup": "struct-min ownership; overlapped commits",
    "inc_substring_dedup_probed": "struct-min ownership; overlapped commits",
    "inc_classifier": "pyarrow wave counts; fused GD setup; shared base",
    "inc_classifier_refit1": "pyarrow wave counts; fused GD setup; shared base",
    "inc_classifier_capped": "pyarrow wave counts; fused GD setup; shared base",
    "inc_tfidf_dedup": "left alone (r13-partial already AQE-coalesced)",
    "inc_tfidf_dedup_pruned": "left alone",
    "inc_frame_dedup": "cycle synth; bytes decode; struct-min; overlap",
    "inc_frame_dedup_probed": "cycle tagged synth; decode; struct-min; overlap",
    "inc_frame_neardup": "cycle synth; decode; rebalance sig write",
    "inc_audio_neardup": "cycle-constant WAV synth; rebalance sig write",
    "inc_image_neardup": "cycle-literal PPM synth; rebalance sig write",
}


def best_committed(sf: str) -> dict[str, float]:
    best: dict[str, float] = {}
    for path in sorted(glob.glob(os.path.join(HERE, "BENCH_r*.json"))):
        try:
            parsed = json.load(open(path)).get("parsed") or {}
        except Exception:
            continue
        if str(parsed.get("sf")) != sf:
            continue
        for n, v in (parsed.get("queries") or {}).items():
            if isinstance(v, (int, float)) and v > 0:
                best[n] = min(float(v), best.get(n, float("inf")))
    return best


def main() -> int:
    final = json.load(open(sys.argv[1]))
    after = final["queries"]
    before = best_committed("0.1")

    rows = []
    for n, act in ACTIONS_STATE.items():
        b = before.get(n)
        a = after.get(n)
        d = f"{(a - b) / b * 100:+.0f}%" if b and a else ""
        rows.append(
            f"| {n} | {b if b else '—'} | {a} | {d} | {act} |"
        )
    print("STATE TABLE:")
    print("| scenario | best r1-r12 | r13 | Δ | action |")
    print("|---|---|---|---|---|")
    print("\n".join(rows))

    import bench  # noqa: E402

    sys.path.insert(0, HERE)
    print("\nANALYTICS TABLE:")
    print("| query | r13 sec | note |")
    print("|---|---|---|")
    for n in bench.ANALYTICS:
        print(f"| {n} | {after.get(n)} |  |")
    print("\nBATCH TABLE:")
    print("| query | r13 sec |")
    print("|---|---|")
    for n in bench.HEADLINE:
        print(f"| {n} | {after.get(n)} |")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, HERE)
    raise SystemExit(main())
