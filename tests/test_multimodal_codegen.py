"""Byte-identity pins for the r14 single-hex header primitives.

``synth_avi`` + ``avi_meta`` in one projection failed whole-stage
codegen's 64 KB method limit (the last janino fallback VERDICT r13
item 6 named); r14 rewrote ``_le_hex``/``_le_int`` to ONE hex call per
field over an arithmetic byte swap. These tests pin the new
expressions against verbatim copies of the ORIGINAL per-byte chains —
any divergence would silently shift every header byte the wav/avi
oracles hash — and assert the avi projection now COMPILES (no
CodeGenerator 64 KB fallback).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _old_le_hex(col, nbytes: int):
    """Verbatim pre-r14 per-byte build chain (multimodal._le_hex)."""
    parts = [
        F.lpad(
            F.hex(F.shiftright(col.cast("bigint"), 8 * i).bitwiseAND(255)),
            2,
            "0",
        )
        for i in range(nbytes)
    ]
    return F.concat(*parts)


def _old_le_int(payload_col: str, offset: int, nbytes: int):
    """Verbatim pre-r14 hex-pair-reorder parse (multimodal._le_int)."""
    h = F.hex(F.substring(F.col(payload_col), offset, nbytes))
    pairs = [
        F.substring(h, i * 2 + 1, 2) for i in reversed(range(nbytes))
    ]
    return F.conv(F.concat(*pairs), 16, 10).cast("bigint")


def test_le_hex_matches_per_byte_chain(spark):
    from beavers_spark.functions.multimodal import _le_hex

    # every byte pattern class: zero, one-byte, full-width, high-bit,
    # and NEGATIVE bigints (two's-complement bytes — both chains read
    # (v >> 8i) & 255, so they must agree there too)
    vals = [
        0, 1, 255, 256, 0xABCD, 0x12345678, 0xFFFFFFFF,
        -1, -255, -0x12345678, 2**63 - 1, -(2**63),
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    for nbytes in (2, 4):
        rows = df.select(
            _old_le_hex(F.col("v"), nbytes).alias("old"),
            _le_hex(F.col("v"), nbytes).alias("new"),
        ).collect()
        for r in rows:
            assert r["old"] == r["new"], (nbytes, r)


def test_le_int_matches_hex_pair_reorder(spark):
    from beavers_spark.functions.multimodal import _le_int

    payloads = [
        bytes(range(1, 17)),
        b"\xff\xfe\xfd\xfc\x00\x01",
        b"\x00" * 8,
        b"RIFFxxxxWAVEfmt ",
        # truncated tails: the old chain read the available k bytes as
        # a k-byte LE value — offsets below run past these on purpose
        b"\xab",
        b"\xab\xcd",
        b"\xab\xcd\xef",
    ]
    df = spark.createDataFrame([(p,) for p in payloads], "p binary")
    for offset, nbytes in [(1, 4), (2, 4), (3, 2), (1, 2), (5, 4)]:
        rows = df.select(
            F.col("p"),
            _old_le_int("p", offset, nbytes).alias("old"),
            _le_int("p", offset, nbytes).alias("new"),
        ).collect()
        for r in rows:
            assert r["old"] == r["new"], (offset, nbytes, r)


def test_avi_header_projection_compiles(spark):
    """The synth_avi + avi_meta projection must COMPILE: before r14 it
    fell back to interpreted mode with `CodeGenerator: Code grows
    beyond 64 KB` (correctness unaffected, speed and the plan claims
    were). CodegenObjectFactoryMode=CODEGEN_ONLY turns the silent
    fallback into a hard error, so this test fails if the projection
    regrows past the janino limit."""
    from beavers_spark.functions.multimodal import avi_meta, synth_avi

    key = "spark.sql.codegen.factoryMode"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "CODEGEN_ONLY")
    try:
        docs = spark.range(64).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc "), F.col("id").cast("string")).alias(
                "text"
            ),
        )
        avis = docs.select(
            "doc_id",
            synth_avi(
                F.encode(F.substring("text", 1, 100), "UTF-8"),
                F.lit(40000) + F.pmod("doc_id", F.lit(4)),
                1 + F.pmod("doc_id", F.lit(240)),
                (16 + F.pmod("doc_id", F.lit(64))).cast("int"),
                F.lit(480),
            ).alias("payload"),
        )
        out = avi_meta(avis, "payload").select(
            "doc_id", "format", "usec_per_frame", "total_frames",
            "n_streams", "width", "height", "duration_ms", "n_bytes",
        )
        rows = out.collect()
        assert len(rows) == 64
        assert all(r["format"] == "avi" for r in rows)

        # the FULL video_frame_plan shape — decode + frame-sampling
        # explode in one codegen span — was the actual 64 KB failure
        # (the old frame_sample_plan Filter re-inlined the payload
        # synthesis a dozen times when pushed down)
        from beavers_spark.functions.multimodal import frame_sample_plan

        parsed = avi_meta(avis, "payload").select(
            "doc_id", F.struct(F.col("duration_ms")).alias("media_meta")
        )
        plan = frame_sample_plan(parsed, "doc_id", every_ms=1000)
        n = plan.count()
        assert n > 64  # every doc expands to >= 1 frame row
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
