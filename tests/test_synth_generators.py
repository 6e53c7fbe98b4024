"""Byte-identity pins for the r13 cycle-literal synth generators.

The media corpora (PPM pixels, near-dup WAVs, frame AVIs) are
deterministic mod-cycle byte streams; r13 replaced their per-byte
Column transforms with substrings over repeated cycle literals
(~10x cheaper per corpus pass, and the AVI tree stops failing
whole-stage codegen). These tests pin the new expressions against
verbatim copies of the ORIGINAL per-byte transforms — any divergence
would silently break every md5/byte_sum-derived oracle downstream.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _old_ppm_pixels(w, h):
    """Verbatim pre-r13 per-byte generator (plans/llmops._ppm_pixels)."""
    npx = (w * h * F.lit(3)).cast("bigint")
    seq = F.sequence(F.lit(0).cast("bigint"), npx - 1)
    hexes = F.transform(
        seq,
        lambda j: F.lpad(
            F.hex(F.pmod(F.col("doc_id") * 7 + j, F.lit(256))), 2, "0"
        ),
    )
    header = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"),
        F.lit("\n255\n"),
    )
    return F.concat(
        F.encode(header, "UTF-8"), F.unhex(F.array_join(hexes, ""))
    )


def _old_frame_bytes(f):
    """Verbatim pre-r13 per-byte frame generator (_synth_frame_avis)."""
    size = F.lit(20) + F.pmod(f, F.lit(5)) * 4
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0).cast("bigint"), (size - 1).cast("bigint")),
            lambda j: F.lpad(
                F.hex(
                    F.pmod(F.col("doc_id") * 11 + f * 13 + j, F.lit(256))
                ),
                2,
                "0",
            ),
        ),
        "",
    )


def _old_neardup_wav_body():
    """Verbatim pre-r13 per-sample WAV body (_synth_neardup_wavs)."""
    from beavers_spark.functions.multimodal import _le_hex

    g = F.floor(F.col("doc_id") / 12)
    p = F.pmod("doc_id", F.lit(64))
    idx = F.sequence(F.lit(0).cast("bigint"), F.lit(1023).cast("bigint"))

    def samp(i):
        k = F.floor(i / 16)
        a = F.lit(100) + F.lit(900) * F.pmod(
            F.pmod(g * 31 + k * 17, F.lit(97)), F.lit(2)
        )
        amp = F.when(k == p, F.lit(1100) - a).otherwise(a)
        return amp * (F.lit(1) - F.pmod(i, F.lit(2)) * 2)

    return F.unhex(
        F.array_join(
            F.transform(
                idx, lambda i: _le_hex(samp(i).bitwiseAND(F.lit(0xFFFF)), 2)
            ),
            "",
        )
    )


def _ids(spark, lo: int, n: int):
    """Id range wide enough to cross every generator's modulus."""
    return spark.range(lo, lo + n).select(F.col("id").alias("doc_id"))


def _assert_identical(df, old_col, new_col) -> None:
    bad = df.select(
        F.sum(
            (
                F.coalesce(F.md5(old_col), F.lit(""))
                != F.coalesce(F.md5(new_col), F.lit(""))
            ).cast("int")
        ).alias("bad"),
        F.count("*").alias("n"),
    ).first()
    assert bad["n"] > 0
    assert bad["bad"] == 0, f"{bad['bad']}/{bad['n']} payloads diverge"


def test_ppm_pixels_matches_per_byte_transform(spark):
    from beavers_spark.plans.llmops import _ppm_dims, _ppm_pixels

    # 600 ids cover the full 24x24 dims lattice (w,h periods 24/576)
    df = _ids(spark, 0, 600)
    w, h = _ppm_dims()
    _assert_identical(df, _old_ppm_pixels(w, h), _ppm_pixels(w, h))


def test_frame_avis_match_per_byte_transform(spark, sf_dir):
    from beavers_spark.plans.llmops import _synth_frame_avis
    from beavers_spark.functions.multimodal import synth_avi, synth_movi

    new = _synth_frame_avis(spark, sf_dir)
    docs = new.select("doc_id")
    nf = 3 + F.pmod("doc_id", F.lit(6))
    old = docs.select(
        "doc_id",
        synth_avi(
            synth_movi(nf, _old_frame_bytes),
            F.lit(33333), nf, F.lit(64), F.lit(48),
        ).alias("old_payload"),
    )
    joined = new.join(old, "doc_id")
    _assert_identical(
        joined, F.col("old_payload"), F.col("payload")
    )


def test_neardup_wavs_match_per_sample_transform(spark, sf_dir):
    from beavers_spark.functions.multimodal import synth_wav
    from beavers_spark.plans.llmops import _synth_neardup_wavs

    new = _synth_neardup_wavs(spark, sf_dir)
    old = new.select("doc_id").select(
        "doc_id",
        synth_wav(
            _old_neardup_wav_body(), F.lit(1), F.lit(16000), F.lit(16)
        ).alias("old_payload"),
    )
    joined = new.join(old, "doc_id")
    _assert_identical(joined, F.col("old_payload"), F.col("payload"))


def test_pcm16_orbit_matches_per_sample_transform(spark):
    from beavers_spark.functions.multimodal import _le_hex
    from beavers_spark.plans.llmops import _pcm16_payload_hex

    # 2100 ids cross the full 2001 modulus; n spans both plan variants
    df = _ids(spark, 0, 2100)
    n = F.lit(50) + F.pmod("doc_id", F.lit(50))
    idx = F.sequence(F.lit(0).cast("bigint"), (n - 1).cast("bigint"))
    samp = F.transform(
        idx,
        lambda i: F.pmod(F.col("doc_id") * 31 + i * 7, F.lit(2001))
        - 1000,
    )
    old = F.unhex(
        F.array_join(
            F.transform(
                samp, lambda v: _le_hex(v.bitwiseAND(F.lit(0xFFFF)), 2)
            ),
            "",
        )
    )
    _assert_identical(df, old, F.unhex(_pcm16_payload_hex(n)))


def test_ulaw_orbit_matches_per_byte_transform(spark):
    from beavers_spark.plans.llmops import _ulaw_payload_hex

    df = _ids(spark, 0, 600)
    n = F.lit(60) + F.pmod("doc_id", F.lit(40))
    idx = F.sequence(F.lit(0).cast("bigint"), (n - 1).cast("bigint"))
    old = F.unhex(
        F.array_join(
            F.transform(
                idx,
                lambda j: F.lpad(
                    F.hex(
                        F.pmod(
                            F.col("doc_id") * 13 + j * 17, F.lit(256)
                        )
                    ),
                    2,
                    "0",
                ),
            ),
            "",
        )
    )
    _assert_identical(df, old, F.unhex(_ulaw_payload_hex(n)))


def test_scene_avis_match_per_byte_transform(spark, sf_dir):
    from beavers_spark.functions.multimodal import synth_avi, synth_movi
    from beavers_spark.plans.llmops import _synth_scene_avis

    new = _synth_scene_avis(spark, sf_dir)
    docs = new.select("doc_id")
    nf = F.lit(12) + F.pmod("doc_id", F.lit(8))

    def old_bytes(f):
        size = F.lit(24) + F.pmod("doc_id", F.lit(3)) * 8

        def byte(j):
            k = F.pmod(
                F.col("doc_id") * 11 + F.floor(f / 3) * 29 + j * 31,
                F.lit(257),
            )
            base = F.pmod(F.pmod(k * k, F.lit(257)), F.lit(256))
            return F.when(
                (F.pmod(f, F.lit(3)) == 1) & (j == F.lit(5)),
                F.pmod(base + 3, F.lit(256)),
            ).otherwise(base)

        return F.array_join(
            F.transform(
                F.sequence(
                    F.lit(0).cast("bigint"), (size - 1).cast("bigint")
                ),
                lambda j: F.lpad(F.hex(byte(j)), 2, "0"),
            ),
            "",
        )

    old = docs.select(
        "doc_id",
        synth_avi(
            synth_movi(nf, old_bytes),
            F.lit(33333), nf, F.lit(64), F.lit(48),
        ).alias("old_payload"),
    )
    joined = new.join(old, "doc_id")
    _assert_identical(joined, F.col("old_payload"), F.col("payload"))


def test_tagged_frame_avis_match_per_byte_transform(spark, sf_dir):
    """bench._tagged_frame_avis: the wave-disjoint twin's cycle rewrite
    against its original per-byte arithmetic ((d*11+f*13+j)%64 +
    tag*64)."""
    import bench
    from beavers_spark.functions.multimodal import synth_avi, synth_movi

    new = bench._tagged_frame_avis(spark, sf_dir)
    docs = new.select("doc_id")
    nf = 3 + F.pmod("doc_id", F.lit(6))
    tag = F.pmod("doc_id", F.lit(bench._WAVES))

    def old_bytes(f):
        size = F.lit(20) + F.pmod(f, F.lit(5)) * 4
        return F.array_join(
            F.transform(
                F.sequence(
                    F.lit(0).cast("bigint"), (size - 1).cast("bigint")
                ),
                lambda j: F.lpad(
                    F.hex(
                        F.pmod(
                            F.col("doc_id") * 11 + f * 13 + j, F.lit(64)
                        )
                        + tag * 64
                    ),
                    2,
                    "0",
                ),
            ),
            "",
        )

    old = docs.select(
        "doc_id",
        synth_avi(
            synth_movi(nf, old_bytes),
            F.lit(33333), nf, F.lit(64), F.lit(48),
        ).alias("old_payload"),
    )
    joined = new.join(old, "doc_id")
    _assert_identical(joined, F.col("old_payload"), F.col("payload"))
