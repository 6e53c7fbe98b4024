"""Synthesize the 10x state-tier scaling corpus (VERDICT r13 item 5).

The driver's deterministic testdata stops at sf0.1 (and is read-only),
so the larger-SF datapoint the scaling block needs is synthesized from
sf0.1: the three tables the state tier reads (``documents``,
``embeddings``, ``events``) are expanded 10x by disjoint id-shifted
copies; every other table is copied through unchanged. Pure pyarrow —
each table stays the single ``.parquet`` FILE ``plans/common.t()``
expects.

Workload-character honesty — the point is a bigger corpus with the
SAME duplication/token statistics per unit, not 10 literal clones:

- ``documents``: copy k shifts ``doc_id`` by ``k * ID_STRIDE`` and
  passes ``text`` through a copy-specific consonant rotation
  (``str.translate``). Within-copy near-dup structure is PRESERVED
  (both members of a pair rotate identically), cross-copy pairs are
  destroyed (every token differs), so pair/candidate volume scales
  ~linearly — the shape a 10x-bigger real corpus has.
- ``embeddings``: copy k shifts ``vec_id``; vectors pass through
  (index-ingest scenarios have no cross-copy dedup semantics).
- ``events``: copy k shifts ``event_id`` AND ``user_id`` (disjoint
  keys, so the keyed-state upsert's per-key cardinality is preserved
  while the key space grows 10x).

Purely a bench input for the committed scaling experiment — nothing
in any query path reads it, and it lives outside the repo (default
/tmp/sfbig).

Usage: python tools/make_sfbig.py [out_dir] [copies]
"""

from __future__ import annotations

import os
import shutil
import sys

ID_STRIDE = 1 << 32
CONS = "bcdfghjklmnpqrstvwxz"


def main() -> int:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out, exist_ok=True)

    def expanded(table: str, id_cols: list[str], text_col: str | None):
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        parts = []
        for k in range(copies):
            c = t
            for col in id_cols:
                shifted = pc.add(c.column(col), k * ID_STRIDE)
                c = c.set_column(
                    c.schema.get_field_index(col), col, shifted
                )
            if text_col is not None and k:
                rot = CONS[k:] + CONS[:k]
                tr = str.maketrans(CONS, rot)
                texts = [
                    None if v is None else v.translate(tr)
                    for v in c.column(text_col).to_pylist()
                ]
                c = c.set_column(
                    c.schema.get_field_index(text_col),
                    text_col,
                    pa.array(texts, type=pa.string()),
                )
            parts.append(c)
        u = pa.concat_tables(parts)
        pq.write_table(u, os.path.join(out, f"{table}.parquet"))
        print(f"{table}: {u.num_rows} rows")

    expanded("documents", ["doc_id"], "text")
    expanded("embeddings", ["vec_id"], None)
    expanded("events", ["event_id", "user_id"], None)

    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem",
    ):
        shutil.copy2(
            os.path.join(src, f"{t}.parquet"),
            os.path.join(out, f"{t}.parquet"),
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
