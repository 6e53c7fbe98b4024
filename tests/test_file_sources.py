"""Schema-explicit file readers (reference: fixed declared schemas,
SURVEY §1.2 — no inference, stable under file drift)."""

from __future__ import annotations

import json
import os

from beavers_spark.sources import (
    read_csv_source,
    read_json_source,
    read_parquet_source,
)


def test_readers_honor_explicit_schema(spark, tmp_path):
    csv = str(tmp_path / "t.csv")
    with open(csv, "w") as fh:
        fh.write("id,price\n1,1.5\n2,2.5\n")
    df = read_csv_source(spark, csv, "id int, price double")
    assert df.schema.simpleString() == "struct<id:int,price:double>"
    assert df.count() == 2

    jl = str(tmp_path / "t.json")
    with open(jl, "w") as fh:
        fh.write(json.dumps({"id": 3, "price": 9.0, "extra": "dropped"}) + "\n")
    jdf = read_json_source(spark, jl, "id int, price double")
    assert jdf.columns == ["id", "price"]  # schema wins over file drift
    assert jdf.first().price == 9.0

    pq = str(tmp_path / "t.parquet")
    df.write.parquet(pq)
    pdf = read_parquet_source(spark, pq, "id int, price double")
    assert {r.id for r in pdf.collect()} == {1, 2}


def test_csv_reader_without_header(spark, tmp_path):
    csv = str(tmp_path / "nh.csv")
    with open(csv, "w") as fh:
        fh.write("7,1.25\n")
    df = read_csv_source(spark, csv, "id int, price double", header=False)
    assert [tuple(r) for r in df.collect()] == [(7, 1.25)]
