"""The multimodal payload pipeline end to end: synthesize real
WAV/PPM/AVI binaries with pure Column byte math, then run every
payload kernel over them — decode, feature-extract, resize, frame
extraction, frame-level dedup — exactly the per-modality preprocessing
a multimodal training-data ingest runs before tokenization.

The point this example makes: media payloads are opaque ``binary``
columns with typed metadata, and EVERY step below is a per-row
projection (header decodes in whole-stage codegen, sample/pixel math
in Arrow-batched pandas UDFs) until the one place cross-document
structure genuinely requires a shuffle — frame-level dedup, which
exchanges (doc, idx, md5) rows, never bytes.

Run: ``python examples/media_pipeline.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from beavers_spark.functions.multimodal import (  # noqa: E402
    avi_frames,
    ppm_meta,
    ppm_resize,
    ppm_stats,
    synth_avi,
    synth_movi,
    synth_wav,
    wav_meta,
    wav_segment_stats,
    wav_stats,
)
from beavers_spark.plans.common import t  # noqa: E402
from beavers_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark("media_pipeline_example")
# 200 docs: the frame generator's duplicate classes need doc pairs
# with specific id deltas (Δd ≡ 99 mod 256), so a tiny corpus has
# none — 200 ids yield ~140 cross-video duplicate frames
docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(200)

# --- audio: synthesize 16-bit PCM WAVs, decode headers, then samples --
n = F.lit(50) + F.pmod("doc_id", F.lit(50))
samp_hex = F.array_join(
    F.transform(
        F.sequence(F.lit(0).cast("bigint"), (n - 1).cast("bigint")),
        lambda i: F.concat(  # int16 LE two's complement
            F.lpad(
                F.hex(
                    (
                        F.pmod(F.col("doc_id") * 31 + i * 7, F.lit(2001))
                        - 1000
                    ).bitwiseAND(F.lit(0xFF))
                ),
                2, "0",
            ),
            F.lpad(
                F.hex(
                    F.shiftrightunsigned(
                        (
                            F.pmod(
                                F.col("doc_id") * 31 + i * 7, F.lit(2001)
                            )
                            - 1000
                        ).bitwiseAND(F.lit(0xFFFF)),
                        8,
                    )
                ),
                2, "0",
            ),
        ),
    ),
    "",
)
wavs = docs.select(
    "doc_id",
    synth_wav(
        F.unhex(samp_hex), F.lit(1), F.lit(16000), F.lit(16)
    ).alias("payload"),
)
meta = wav_meta(wavs, "payload")
N = docs.count()
assert meta.filter(F.col("format") == "wav").count() == N
audio = wav_stats(wavs, "payload").select(
    "doc_id", "n_samples", "peak", "rms", "zcr"
)
a0 = audio.filter(F.col("n_samples").isNotNull()).count()
assert a0 == N, a0
assert audio.filter(F.col("peak") > 1000).count() == 0  # samples in ±1000

# windowed twin: 25-sample segment rows (segments-as-rows, map-side
# explode — the blob is decoded once); every segment peak is bounded
# by its file's whole-payload peak
segs = wav_segment_stats(wavs, "payload", seg_samples=25)
n_segs = segs.count()
assert n_segs >= 2 * N  # 50-99 samples -> 2-4 segments per doc
whole = audio.select("doc_id", F.col("peak").alias("file_peak"))
bad = segs.join(whole, "doc_id").filter(
    F.col("peak") > F.col("file_peak")
).count()
assert bad == 0

# REAL resample: decimate every track 2x (output is itself a canonical
# WAV at half the rate, so the stats kernel re-decodes it) — kept
# sample counts are ceil(n/2), and no decimation can raise the peak
from beavers_spark.functions.multimodal import wav_resample  # noqa: E402

rs = wav_resample(wavs, "payload", F.lit(2))
rs_stats = wav_stats(
    rs.select("doc_id", "out_rate", "resampled"), "resampled"
)
chk = (
    rs_stats.join(
        audio.select("doc_id", F.col("n_samples").alias("in_n"),
                     F.col("peak").alias("in_peak")),
        "doc_id",
    )
    .filter(
        (F.col("out_rate") != 8000)
        | (F.col("n_samples") != F.ceil(F.col("in_n") / 2))
        | (F.col("peak") > F.col("in_peak"))
    )
    .count()
)
assert chk == 0

# --- images: P6 PPMs -> header decode -> pixel stats -> REAL resize --
w = (8 + F.pmod("doc_id", F.lit(8))).cast("bigint")
h = F.lit(8).cast("bigint")
px_hex = F.array_join(
    F.transform(
        F.sequence(F.lit(0).cast("bigint"), (w * h * 3 - 1).cast("bigint")),
        lambda j: F.lpad(
            F.hex(F.pmod(F.col("doc_id") * 7 + j, F.lit(256))), 2, "0"
        ),
    ),
    "",
)
header = F.concat(
    F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"),
    F.lit("\n255\n"),
)
ppms = docs.select(
    "doc_id",
    F.concat(F.encode(header, "UTF-8"), F.unhex(px_hex)).alias("payload"),
)
assert ppm_meta(ppms, "payload").filter(
    F.col("format") == "ppm"
).count() == N
resized = ppm_resize(ppms, "payload", F.lit(2))
# the resized payload is itself canonical P6, so kernels CHAIN
rs_stats = ppm_stats(resized, "resized")
row = rs_stats.select(
    F.min("out_w").alias("mw"), F.max("n_pixels").alias("mp")
).collect()[0]
assert row["mw"] >= 4 and row["mp"] <= 8 * 4  # ceil(15/2) * ceil(8/2)

# --- video: AVIs with real movi frame chunks -> extract -> dedup -----
nf = 3 + F.pmod("doc_id", F.lit(6))


def frame_bytes(f):
    size = F.lit(20) + F.pmod(f, F.lit(5)) * 4
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0).cast("bigint"), (size - 1).cast("bigint")),
            lambda j: F.lpad(
                F.hex(
                    F.pmod(F.col("doc_id") * 11 + f * 13 + j, F.lit(256))
                ),
                2, "0",
            ),
        ),
        "",
    )


avis = docs.select(
    "doc_id",
    synth_avi(
        synth_movi(nf, frame_bytes), F.lit(33333), nf, F.lit(64), F.lit(48)
    ).alias("payload"),
)
frames = avi_frames(avis, "payload")
n_frames = frames.count()
assert n_frames >= N * 3  # at least 3 frames per doc

# frame-level dedup: content-identical frames across videos share one
# owner — the repeated intro/slate problem; the shuffle carries
# (doc, idx, md5), never frame bytes
from pyspark.sql import Window  # noqa: E402

wv = (
    Window.partitionBy("frame_md5")
    .orderBy("doc_id", "frame_idx")
    .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
)
owned = frames.select(
    "doc_id", "frame_idx",
    F.first("doc_id").over(wv).alias("owner_doc"),
    F.count("*").over(wv).alias("n_copies"),
)
dups = owned.filter(F.col("owner_doc") != F.col("doc_id")).count()
uniq = owned.filter(F.col("n_copies") == 1).count()
assert dups > 0, "the generator guarantees cross-video duplicate frames"

# perceptual tier: banded-Hamming near-dup over the frames' aHash
# bitmaps (hamming_pairs — the SimHash engine; frames pair within
# their byte-length class, hot buckets chain at cap=8). Exact
# duplicates are hamming-0 near-dups, so the tier must find pairs.
from beavers_spark.functions.dedup import hamming_pairs  # noqa: E402

sig = frames.select(
    (F.col("doc_id") * 256 + F.col("frame_idx")).alias("fid"),
    "ahash", "n_bytes",
)
near = hamming_pairs(
    sig, "fid", "ahash", bits=64, max_hamming=3,
    bucket_cap=8, group_cols=("n_bytes",),
)
n_near = near.count()
assert n_near > 0
assert near.filter(F.col("hamming") > 3).count() == 0

# audio near-dup: fold the segment peaks into a 64-bit energy-envelope
# fingerprint (pure Column math over rows the decode already produced)
# and run the SAME banded engine — one signature per track, so the
# modality set (frames, images via ppm_ahash, audio) shares a single
# candidate/verify code path
from beavers_spark.functions.multimodal import (  # noqa: E402
    wav_envelope_fingerprint,
)

afp = wav_envelope_fingerprint(segs)
n_tracks = afp.count()
assert n_tracks == N

# scene cuts: segment each video where adjacent frames' aHashes differ
# by more than 4 bits — start_frame is the per-scene sample frame; the
# natural corpus has no repeated-frame runs, so nearly every frame
# boundary is a cut (scenes ~= frames) — the INTERESTING structure
# (3-frame scenes, jitter tolerance) is pinned by the
# video_scene_cuts plan's oracle
ws = Window.partitionBy("doc_id").orderBy("frame_idx")
prev_h = F.lag("ahash").over(ws)
cuts = frames.withColumn(
    "cut",
    F.when(prev_h.isNull(), F.lit(0)).otherwise(
        (F.bit_count(F.col("ahash").bitwiseXOR(prev_h)) > 4).cast("int")
    ),
).withColumn(
    "scene_id",
    F.sum("cut").over(
        ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ),
)
scenes = cuts.groupBy("doc_id", "scene_id").agg(
    F.min("frame_idx").alias("start_frame"), F.count("*").alias("n_frames")
)
n_scenes = scenes.count()
assert N <= n_scenes <= n_frames  # >= 1 scene per video, <= 1 per frame

# compressed-audio decode: build fmt-code-7 G.711 u-law containers and
# EXPAND them with the closed-form CCITT kernel — the output is itself
# a canonical PCM16 WAV, so it chains straight back into wav_stats
from beavers_spark.functions.multimodal import (  # noqa: E402
    wav_stats,
    wav_ulaw_decode,
)

ul_idx = F.sequence(F.lit(0).cast("bigint"), F.lit(79).cast("bigint"))
ul_hex = F.transform(
    ul_idx,
    lambda j: F.lpad(
        F.hex(F.pmod(F.col("doc_id") * 13 + j * 17, F.lit(256))), 2, "0"
    ),
)
ulaws = docs.select(
    "doc_id",
    synth_wav(
        F.unhex(F.array_join(ul_hex, "")),
        F.lit(1), F.lit(8000), F.lit(8), F.lit(7),
    ).alias("payload"),
)
ul = wav_stats(
    wav_ulaw_decode(ulaws, "payload").select("doc_id", "decoded"),
    "decoded",
)
n_ulaw = ul.filter(F.col("n_samples") == 80).count()
assert n_ulaw == N  # every track expanded, sample-exact
# u-law magnitudes are bounded by the CCITT table's +-32124
assert ul.filter(F.abs(F.col("peak")) > 32124).count() == 0

print(
    f"media pipeline: {a0} wavs decoded+resampled ({n_segs} audio segments, "
    f"{n_tracks} envelope fingerprints), {n_ulaw} u-law tracks expanded, "
    f"{N} ppms resized+re-decoded, {n_frames} frames extracted, "
    f"{dups} duplicate frames, {uniq} unique, "
    f"{n_near} perceptual near-dup pairs, {n_scenes} scenes"
)
