"""Round-10 tranche: driver-grade oracle coverage of the round-10
operators.

- q156-q158: the real stdlib codecs (baseline JPEG, RIFF/PCM WAV)
  under the driver hash — rule-derived payloads whose decoded pixels/
  samples have exact closed forms (q100 solid JPEG blocks, square-wave
  audio).
- q153: GENERAL-k PassJoin edit-distance join (operators/editjoin.py)
  — fuzzy catalog-key pairs at levenshtein ≤ 2 with TRUE edit
  distance (length changes count; over half the qualifying pairs at
  this SF differ in length). The oracle is the brute-force all-pairs
  levenshtein, so the driver hash certifies the multi-match-aware
  substring selection loses no pair and the thresholded verify
  admits no extra.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a2b_spark.queries.relational import _t, dsum
from a2b_spark.queries.round7 import _scratch_path

QUERIES: dict = {}
ORACLES: dict = {}


def q153_fuzzy_key_pairs_k2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy key matching at distance ≤ 2 over catalog keys
    (name + brand): the general PassJoin segment scheme — each indexed
    key splits into 3 segments, probes generate only the multi-match-
    aware substring windows (a Python-pruned literal combo explode,
    ~12 combos), candidates join equi on (length, segment, text) and
    verify with the thresholded codegen levenshtein. Never an
    all-pairs cross join; the oracle below IS the brute-force
    quadratic this operator exists to avoid."""
    from a2b_spark.operators.editjoin import edit_distance_pairs

    p = _t(spark, sf_dir, "part")
    keys = (
        p.groupBy(
            F.concat(F.col("p_name"), F.lit(" "), F.col("p_brand")).alias("key")
        )
        .agg(F.min("p_partkey").alias("pk"))
    )
    return edit_distance_pairs(keys, "key", "pk", max_dist=2)


O_Q153 = """
WITH k AS (
  SELECT MIN(p_partkey) AS pk, p_name || ' ' || p_brand AS key
  FROM part GROUP BY 2)
SELECT a.pk AS id_a, b.pk AS id_b,
       CAST(levenshtein(a.key, b.key) AS INTEGER) AS dist
FROM k a JOIN k b ON a.pk < b.pk
WHERE levenshtein(a.key, b.key) <= 2
"""


QUERIES["q153_fuzzy_key_pairs_k2"] = q153_fuzzy_key_pairs_k2
ORACLES["q153_fuzzy_key_pairs_k2"] = O_Q153


# --------------------------------------------------------------- Q154
def q154_deletion_vector_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETION VECTORS end-to-end (storage/table.py DV_DIR): orders
    land key-clustered, every 101st order is deleted via the vector
    path — the in-query check raises unless the delete commit
    hardlinked EVERY data file (zero rewritten, zero added) and staged
    a ``_dv/`` tombstone list — then a merge RE-INTRODUCES the lowest
    deleted key with a synthetic repricing, which must surface exactly
    once and leave the vector. The per-priority rollup of the final
    table hash-matches the oracle's recomputation over raw orders, so
    the driver certifies no row was lost, resurrected, or doubled by
    the metadata-sized delete."""
    from a2b_spark.storage.table import DV_DIR, VersionedParquetTable

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    path = _scratch_path(sf_dir, "q154")
    t = VersionedParquetTable(
        path, key_cols=["o_orderkey"], retention=5, deletion_vectors=True
    )
    t.overwrite(o)
    vdir0 = os.path.join(path, t.current_version())
    nbytes = sum(os.path.getsize(p) for p in _data_files(vdir0))
    t.compact(
        spark,
        target_file_bytes=max(2 << 10, nbytes // 8),
        min_files=1,
        cluster_by=["o_orderkey"],
    )
    pre = _data_files(os.path.join(path, t.current_version()))
    t.delete_keys(o.filter(F.col("o_orderkey") % 101 == 0).select("o_orderkey"))
    vdir = os.path.join(path, t.current_version())
    post = _data_files(vdir)
    if [os.path.basename(p) for p in pre] != [os.path.basename(p) for p in post]:
        raise RuntimeError("q154: the DV delete rewrote or added data files")
    if not all(os.stat(p).st_nlink > 1 for p in post):
        raise RuntimeError("q154: a data file of the DV delete is not hardlinked")
    if not os.path.isdir(os.path.join(vdir, DV_DIR)):
        raise RuntimeError("q154: the DV delete staged no tombstone vector")
    reborn = (
        o.filter(F.col("o_orderkey") % 101 == 0)
        .agg(F.min("o_orderkey"))
        .first()[0]
    )
    t.merge(
        spark.createDataFrame(
            spark.sparkContext.parallelize([(reborn, "0-REBORN", 9999.99)], 1),
            "o_orderkey long, o_orderpriority string, o_totalprice double",
        )
    )
    final = t.read(spark)
    if final.filter(F.col("o_orderkey") == reborn).count() != 1:
        raise RuntimeError("q154: re-introduced key not exactly-once")
    return (
        final.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum("o_totalprice", "total_price", 2),
        )
        .orderBy("o_orderpriority")
    )


def _data_files(vdir: str) -> list:
    """Absolute data-file paths via the storage layer's ONE canonical
    walker predicate (stats._data_files) — a hand-rolled filter here
    would silently diverge the in-query file-identity checks from the
    layer's own notion of data files."""
    from a2b_spark.storage import stats as _stats

    return sorted(os.path.join(vdir, r) for r in _stats._data_files(vdir))


O_Q154 = """
WITH eff AS (
  SELECT o_orderpriority, o_totalprice
  FROM orders WHERE o_orderkey % 101 <> 0
  UNION ALL
  SELECT '0-REBORN', 9999.99
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM eff
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES["q154_deletion_vector_walk"] = q154_deletion_vector_walk
ORACLES["q154_deletion_vector_walk"] = O_Q154


# --------------------------------------------------------------- Q155
def q155_incremental_rollup_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL AGGREGATE MAINTENANCE end-to-end (storage/ivm.py):
    a customer snapshot lands with ``enable_cdf(preimages=True)``, a
    per-segment rollup builds from the initial commit, then a churn
    commit (reprice every 13th account +50, MOVE every 29th customer
    to a synthetic segment, insert one new customer) and a delete of
    every 41st customer refresh the rollup from CHANGE ROWS ONLY —
    the signed fold Σ(+post −pre) — never re-scanning the source. The
    in-query checks raise unless the refreshes were genuinely
    incremental (bounded groups touched, marker advancing, a third
    refresh a no-op); the final rollup must hash-match the oracle's
    full GROUP BY recomputation of the effective state, certifying
    inserts, group-moving updates, and deletes all folded exactly."""
    from a2b_spark.storage.ivm import refresh_rollup
    from a2b_spark.storage.table import VersionedParquetTable

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    src = VersionedParquetTable(
        _scratch_path(sf_dir, "q155src"), key_cols=["c_custkey"], retention=20
    )
    src.overwrite(c)
    src.enable_cdf(preimages=True)
    roll = VersionedParquetTable(
        _scratch_path(sf_dir, "q155roll"),
        key_cols=["c_mktsegment"],
        retention=20,
    )
    r1 = refresh_rollup(roll, src, spark, ["c_mktsegment"], ["c_acctbal"])
    hi = c.agg(F.max("c_custkey")).first()[0]
    batch = (
        c.filter(
            (F.col("c_custkey") % 13 == 0) | (F.col("c_custkey") % 29 == 0)
        )
        .withColumn(
            "c_acctbal",
            F.when(
                F.col("c_custkey") % 13 == 0, F.col("c_acctbal") + F.lit(50.0)
            ).otherwise(F.col("c_acctbal")),
        )
        .withColumn(
            "c_mktsegment",
            F.when(F.col("c_custkey") % 29 == 0, F.lit("0-MOVED")).otherwise(
                F.col("c_mktsegment")
            ),
        )
        .unionByName(
            spark.createDataFrame(
                spark.sparkContext.parallelize([(hi + 1, "0-MOVED", 123.45)], 1),
                "c_custkey long, c_mktsegment string, c_acctbal double",
            )
        )
    )
    src.merge(batch)
    src.delete_keys(
        c.filter(F.col("c_custkey") % 41 == 0).select("c_custkey")
    )
    r2 = refresh_rollup(roll, src, spark, ["c_mktsegment"], ["c_acctbal"])
    if r2["to_version"] <= r1["to_version"] or r2["groups_touched"] == 0:
        raise RuntimeError(f"q155: second refresh not incremental: {r2}")
    r3 = refresh_rollup(roll, src, spark, ["c_mktsegment"], ["c_acctbal"])
    if r3["groups_touched"] != 0:
        raise RuntimeError(f"q155: third refresh should be a no-op: {r3}")
    return (
        roll.read(spark)
        .select(
            "c_mktsegment",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("c_acctbal").cast("double").alias("sum_bal"),
        )
        .orderBy("c_mktsegment")
    )


O_Q155 = """
WITH eff AS (
  SELECT CASE WHEN c_custkey % 29 = 0 THEN '0-MOVED'
              ELSE c_mktsegment END AS c_mktsegment,
         CASE WHEN c_custkey % 13 = 0 THEN c_acctbal + 50.0
              ELSE c_acctbal END AS bal
  FROM customer
  WHERE c_custkey % 41 <> 0
  UNION ALL
  SELECT '0-MOVED', 123.45
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(bal AS DECIMAL(28,6))) AS DOUBLE) AS sum_bal
FROM eff
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


QUERIES["q155_incremental_rollup_refresh"] = q155_incremental_rollup_refresh
ORACLES["q155_incremental_rollup_refresh"] = O_Q155


# --------------------------------------------------------------- Q156
def q156_jpeg_decode_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stdlib baseline JPEG codec certified under the driver hash
    (the JPEG twin of q146's PNG rollup): each document (doc_id < 500)
    synthesizes a REAL solid-color JPEG at quality 100 with
    rule-derived dimensions (w = 4 + id%13, h = 3 + id%7, gray for
    even ids, RGB for odd — JPEG has no 2-channel) and a rule-derived
    coding envelope (4:2:0 subsampling for id%4==3, restart interval 2
    for id%8>=6), then decode_media(decoder='jpeg') parses the actual
    bitstream back on the executors. Solid blocks carry only the
    integral DC coefficient and q100 quantizers are all 1, so the
    decode is BIT-EXACT (pytest-pinned in test_jpeg_codec.py) — the
    per-channel mean feature equals exactly round((id%256)/255, 6) and
    the oracle recomputes the whole rollup from the construction rule.
    Dimension sums certify the marker/SOF parse across subsampling
    layouts; the feature sum certifies the Huffman -> dequant -> IDCT
    -> color-convert -> upsample pixel path (a one-bit desync anywhere
    diverges the hash)."""
    from a2b_spark.operators.multimodal import decode_media

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 500)
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        from a2b_spark.operators.jpeg import encode_jpeg

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 13, 3 + d % 7
                c = 1 if d % 2 == 0 else 3
                img = np.full((h, w, c), d % 256, np.uint8)
                payloads.append(
                    bytearray(
                        encode_jpeg(
                            img,
                            quality=100,
                            subsampling="4:2:0" if c == 3 and d % 4 == 3 else "4:4:4",
                            restart_interval=2 if d % 8 >= 6 else 0,
                        )
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    media = docs.mapInPandas(synth, "media_id long, payload binary")
    dec = decode_media(media, "payload", "media_id", decoder="jpeg")
    return (
        dec.groupBy("channels")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.sum("width").cast("long").alias("sum_width"),
            F.sum("height").cast("long").alias("sum_height"),
            F.sum(F.col("width") * F.col("height")).cast("long").alias("sum_pixels"),
            F.sum(
                F.element_at(F.col("features"), 1).cast("decimal(12,6)")
            )
            .cast("double")
            .alias("sum_mean_feature"),
        )
        .orderBy("channels")
    )


O_Q156 = """
SELECT CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INTEGER) AS channels,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(4 + doc_id % 13) AS BIGINT) AS sum_width,
       CAST(SUM(3 + doc_id % 7) AS BIGINT) AS sum_height,
       CAST(SUM((4 + doc_id % 13) * (3 + doc_id % 7)) AS BIGINT) AS sum_pixels,
       CAST(SUM(CAST(ROUND(CAST(doc_id % 256 AS DOUBLE) / 255, 6)
                     AS DECIMAL(12,6))) AS DOUBLE) AS sum_mean_feature
FROM documents
WHERE doc_id < 500
GROUP BY 1 ORDER BY 1
"""


QUERIES["q156_jpeg_decode_rollup"] = q156_jpeg_decode_rollup
ORACLES["q156_jpeg_decode_rollup"] = O_Q156


# --------------------------------------------------------------- Q157
def q157_wav_decode_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stdlib WAV codec certified under the driver hash (the audio
    twin of q146/q156): each document (doc_id < 500) synthesizes a
    REAL RIFF/PCM-16 square-wave clip with rule-derived parameters
    (n = 64 + id%97 samples at 8 kHz, amplitude a = 1 + id%997,
    half-period h = 1 + id%4, mono for even ids / identical-channel
    stereo for odd), and decode_audio(decoder='wav') parses the actual
    bytes back on the executors. Square waves have closed forms the
    oracle recomputes exactly: every |sample| is a, so rms = a/32768
    (dyadic — exact in float64 AND in the DoubleType feature column);
    sign flips once per half-period boundary, so zero_crossings =
    (n-1) // h; duration n/8000 terminates within 6 decimals
    (1/8000 = 0.000125). Multiplying rms back by 32768 recovers the
    integer amplitude, making every aggregate an exact BIGINT/DECIMAL
    — one corrupted sample anywhere diverges the hash."""
    from a2b_spark.operators.multimodal import decode_audio

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 500)
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        from a2b_spark.operators.wav import encode_wav

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n, h, a = 64 + d % 97, 1 + d % 4, 1 + d % 997
                i = np.arange(n)
                mono = np.where((i // h) % 2 == 0, a, -a).astype(np.int16)
                pcm = np.repeat(mono[:, None], 1 + d % 2, axis=1)
                payloads.append(bytearray(encode_wav(pcm, 8000)))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    media = docs.mapInPandas(synth, "media_id long, payload binary")
    dec = decode_audio(media, "payload", "media_id", decoder="wav")
    return (
        dec.groupBy("channels")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clips"),
            F.sum("sample_rate").cast("long").alias("sum_rate"),
            F.sum("n_samples").cast("long").alias("sum_samples"),
            F.sum(F.element_at("features", 2) * F.lit(32768.0))
            .cast("long")
            .alias("sum_amplitude"),
            F.sum(F.element_at("features", 3)).cast("long").alias("sum_crossings"),
            F.sum(F.element_at("features", 1).cast("decimal(12,6)"))
            .cast("double")
            .alias("sum_duration_s"),
        )
        .orderBy("channels")
    )


O_Q157 = """
WITH clip AS (
  SELECT CAST(1 + doc_id % 2 AS INTEGER) AS channels,
         64 + doc_id % 97 AS n,
         1 + doc_id % 4 AS h,
         1 + doc_id % 997 AS a
  FROM documents WHERE doc_id < 500)
SELECT channels,
       CAST(COUNT(*) AS BIGINT) AS n_clips,
       CAST(COUNT(*) * 8000 AS BIGINT) AS sum_rate,
       CAST(SUM(n) AS BIGINT) AS sum_samples,
       CAST(SUM(a) AS BIGINT) AS sum_amplitude,
       CAST(SUM((n - 1) // h) AS BIGINT) AS sum_crossings,
       CAST(SUM(CAST(ROUND(CAST(n AS DOUBLE) / 8000, 6) AS DECIMAL(12,6)))
            AS DOUBLE) AS sum_duration_s
FROM clip GROUP BY channels ORDER BY channels
"""


QUERIES["q157_wav_decode_rollup"] = q157_wav_decode_rollup
ORACLES["q157_wav_decode_rollup"] = O_Q157


# --------------------------------------------------------------- Q158
def q158_audio_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size audio analysis windows (audio_windows, the audio
    twin of frame sampling) certified under the driver hash: the same
    rule-derived square-wave clips as q157, segmented into 32-sample
    windows at hop 16. The oracle recomputes the window combinatorics
    in closed form — k = (n-32)//16 + 1 windows per clip, start
    offsets an arithmetic series summing to 8k(k-1), and every
    window's rms is exactly a/32768 regardless of phase because every
    |sample| equals a — so window COUNT, PLACEMENT, and CONTENT are
    all hash-checked."""
    from a2b_spark.operators.multimodal import audio_windows

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 500)
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        from a2b_spark.operators.wav import encode_wav

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n, h, a = 64 + d % 97, 1 + d % 4, 1 + d % 997
                i = np.arange(n)
                mono = np.where((i // h) % 2 == 0, a, -a).astype(np.int16)
                payloads.append(bytearray(encode_wav(mono[:, None], 8000)))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    media = docs.mapInPandas(synth, "media_id long, payload binary")
    win = audio_windows(media, "payload", "media_id", window=32, hop=16)
    grp = (F.col("media_id") % 5).cast("integer").alias("clip_group")
    return (
        win.groupBy(grp)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum("start_sample").cast("long").alias("sum_starts"),
            F.sum(F.col("rms") * F.lit(32768.0)).cast("long").alias("sum_window_amp"),
        )
        .orderBy("clip_group")
    )


O_Q158 = """
WITH clip AS (
  SELECT CAST(doc_id % 5 AS INTEGER) AS clip_group,
         (64 + doc_id % 97 - 32) // 16 + 1 AS k,
         1 + doc_id % 997 AS a
  FROM documents WHERE doc_id < 500)
SELECT clip_group,
       CAST(SUM(k) AS BIGINT) AS n_windows,
       CAST(SUM(8 * k * (k - 1)) AS BIGINT) AS sum_starts,
       CAST(SUM(k * a) AS BIGINT) AS sum_window_amp
FROM clip GROUP BY clip_group ORDER BY clip_group
"""


QUERIES["q158_audio_window_rollup"] = q158_audio_window_rollup
ORACLES["q158_audio_window_rollup"] = O_Q158


# --------------------------------------------------------------- Q159
def q159_video_frame_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video leg certified under the driver hash, completing the
    image/audio/video triple (q156 JPEG, q157/q158 WAV): each document
    (doc_id < 500) synthesizes a REAL MJPEG-AVI clip — n = 2 + id%5
    solid frames of rule-derived dims (w = 8 + id%9, h = 8 + id%7),
    frame f carrying value (id + 17f) % 256 at JPEG quality 100 —
    then the pipeline a curation job actually runs: sample_frames
    (every 2nd frame, max 2, REAL RIFF container walk) explodes frame
    payloads, decode_media(decoder='jpeg') decodes each sampled frame,
    and the rollup groups by ORIGINAL frame number. The oracle
    recomputes the sampling combinatorics (frame 0 always; frame 2
    iff n >= 3 ⇔ id%5 >= 1) and the exact per-frame mean — so frame
    SELECTION, container PLACEMENT, and pixel CONTENT are all under
    the value hash."""
    from a2b_spark.operators.dedup import spread
    from a2b_spark.operators.multimodal import decode_media, sample_frames

    # spread the id slice before the synth/sample/decode Python
    # stages: a single-file local scan is ONE split and the per-clip
    # work (pure-Python JPEG encode per frame + container walk +
    # decode) is the heaviest Python segment in the registry — it
    # would serialize on one core. Unlike the cheap-synth codec
    # rollups (q156-q158/q160/q161, measured +0.5s for the shuffle
    # tax, no win), the video leg gains ~2x. No-op at real widths.
    docs = spread(
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 500)
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        from a2b_spark.operators.video import encode_mjpeg_avi

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n, w, h = 2 + d % 5, 8 + d % 9, 8 + d % 7
                clip = [
                    np.full((h, w, 3), (d + 17 * f) % 256, np.uint8)
                    for f in range(n)
                ]
                payloads.append(bytearray(encode_mjpeg_avi(clip, fps=12, quality=100)))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    media = docs.mapInPandas(synth, "media_id long, payload binary")
    frames = sample_frames(
        media, "payload", "media_id", every_n=2, max_frames=2, splitter="mjpeg_avi"
    )
    # composite id keeps frame provenance through the decode (f < 10)
    fid = frames.select(
        (F.col("media_id") * 10 + F.col("frame_no")).alias("fid"), "frame"
    )
    dec = decode_media(fid, "frame", "fid", decoder="jpeg")
    return (
        dec.groupBy((F.col("media_id") % 10).cast("integer").alias("frame_no"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.sum("width").cast("long").alias("sum_width"),
            F.sum("height").cast("long").alias("sum_height"),
            F.sum(
                F.element_at(F.col("features"), 1).cast("decimal(12,6)")
            )
            .cast("double")
            .alias("sum_mean_feature"),
        )
        .orderBy("frame_no")
    )


O_Q159 = """
WITH clip AS (
  SELECT doc_id AS d, 2 + doc_id % 5 AS n FROM documents WHERE doc_id < 500),
sampled AS (
  SELECT d, 0 AS fno FROM clip
  UNION ALL
  SELECT d, 2 FROM clip WHERE n >= 3)
SELECT CAST(fno AS INTEGER) AS frame_no,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(8 + d % 9) AS BIGINT) AS sum_width,
       CAST(SUM(8 + d % 7) AS BIGINT) AS sum_height,
       CAST(SUM(CAST(ROUND(CAST((d + 17 * fno) % 256 AS DOUBLE) / 255, 6)
                     AS DECIMAL(12,6))) AS DOUBLE) AS sum_mean_feature
FROM sampled GROUP BY fno ORDER BY frame_no
"""


QUERIES["q159_video_frame_rollup"] = q159_video_frame_rollup
ORACLES["q159_video_frame_rollup"] = O_Q159


# --------------------------------------------------------------- Q160
def q160_gif_frame_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stdlib GIF codec (the third real image format: LZW +
    palette + interlace + animation) certified under the driver hash:
    each document (doc_id < 500) synthesizes a REAL animated GIF89a —
    n = 1 + id%6 solid frames of rule-derived dims (w = 5 + id%8,
    h = 4 + id%6), frame f carrying value (id + 13f) % 256, interlaced
    for id%3 == 0 — then sample_frames(splitter='gif') walks the LZW
    stream for real and re-encodes every 3rd frame (max 2) as a
    standalone PNG, which decode_media(decoder='auto') sniffs and
    decodes. Palette GIF is LOSSLESS, so decode is bit-exact by
    construction (arbitrary-pattern exactness pinned in
    test_gif_codec.py); the oracle recomputes the sampling
    combinatorics (frame 0 always; frame 3 iff n >= 4 ⇔ id%6 >= 3)
    and the exact per-frame means. Two real codecs chain in one
    pipeline: GIF frames out, PNG payloads in."""
    from a2b_spark.operators.multimodal import decode_media, sample_frames

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 500)
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        from a2b_spark.operators.gif import encode_gif

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n, w, h = 1 + d % 6, 5 + d % 8, 4 + d % 6
                clip = [
                    np.full((h, w, 3), (d + 13 * f) % 256, np.uint8)
                    for f in range(n)
                ]
                payloads.append(
                    bytearray(encode_gif(clip, interlace=(d % 3 == 0)))
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    media = docs.mapInPandas(synth, "media_id long, payload binary")
    frames = sample_frames(
        media, "payload", "media_id", every_n=3, max_frames=2, splitter="gif"
    )
    fid = frames.select(
        (F.col("media_id") * 10 + F.col("frame_no")).alias("fid"), "frame"
    )
    dec = decode_media(fid, "frame", "fid", decoder="auto")
    return (
        dec.groupBy((F.col("media_id") % 10).cast("integer").alias("frame_no"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.sum("width").cast("long").alias("sum_width"),
            F.sum("height").cast("long").alias("sum_height"),
            F.sum(
                F.element_at(F.col("features"), 1).cast("decimal(12,6)")
            )
            .cast("double")
            .alias("sum_mean_feature"),
        )
        .orderBy("frame_no")
    )


O_Q160 = """
WITH clip AS (
  SELECT doc_id AS d, 1 + doc_id % 6 AS n FROM documents WHERE doc_id < 500),
sampled AS (
  SELECT d, 0 AS fno FROM clip
  UNION ALL
  SELECT d, 3 FROM clip WHERE n >= 4)
SELECT CAST(fno AS INTEGER) AS frame_no,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(5 + d % 8) AS BIGINT) AS sum_width,
       CAST(SUM(4 + d % 6) AS BIGINT) AS sum_height,
       CAST(SUM(CAST(ROUND(CAST((d + 13 * fno) % 256 AS DOUBLE) / 255, 6)
                     AS DECIMAL(12,6))) AS DOUBLE) AS sum_mean_feature
FROM sampled GROUP BY fno ORDER BY frame_no
"""


QUERIES["q160_gif_frame_rollup"] = q160_gif_frame_rollup
ORACLES["q160_gif_frame_rollup"] = O_Q160


# --------------------------------------------------------------- Q161
def q161_warc_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-ingest chain certified under the driver hash: each
    document (doc_id < 500) synthesizes a WARC-shaped record — a
    rule-derived HTML page (head with title+style, k = 1 + id%7
    paragraphs 'tok{id}_{i} &amp; more', a script block) compressed as
    one gzip member — then extract_web_text gunzips, parses, drops the
    script/style/head subtrees, resolves the &amp; entity, and
    collapses whitespace on the executors. The oracle recomputes the
    visible text's EXACT length and token count from the generation
    rule (never by parsing in SQL — the PORTING.md regex lesson):
    text = 'Doc {id}' + k paragraphs 'tok{id}_{i} & more' joined by
    single spaces, so n_chars = (4+L) + k*(13+L) with
    L = len(str(id)), tokens = 2 + 3k. A parser that leaks script
    text, misses an entity, or mis-collapses whitespace diverges the
    hash; a gzip fault kills the rows entirely."""
    from a2b_spark.functions.text import token_count
    from a2b_spark.operators.web import extract_web_text

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 500)
    )

    def synth(batches):
        import gzip as _gzip

        import pandas as pd

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                k = 1 + d % 7
                paras = "\n".join(
                    f"<p>tok{d}_{i} &amp; more</p>" for i in range(k)
                )
                html = (
                    f"<html><head><title>T{d}</title>"
                    "<style>p { color: red }</style></head>\n"
                    f"<body><h1>Doc {d}</h1>\n{paras}\n"
                    "<script>var hidden = 1;</script></body></html>"
                )
                payloads.append(
                    bytearray(_gzip.compress(html.encode(), compresslevel=6))
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    records = docs.mapInPandas(synth, "doc_id long, payload binary")
    text = extract_web_text(records, "payload", "doc_id", gzipped=True)
    return (
        text.groupBy((F.col("doc_id") % 7 + 1).cast("integer").alias("n_paras"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum(token_count(F.col("text"))).cast("long").alias("sum_tokens"),
        )
        .orderBy("n_paras")
    )


O_Q161 = """
WITH doc AS (
  SELECT CAST(1 + doc_id % 7 AS INTEGER) AS n_paras,
         LENGTH(CAST(doc_id AS VARCHAR)) AS l
  FROM documents WHERE doc_id < 500)
SELECT n_paras,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(4 + l + n_paras * (13 + l)) AS BIGINT) AS sum_chars,
       CAST(SUM(2 + 3 * n_paras) AS BIGINT) AS sum_tokens
FROM doc GROUP BY n_paras ORDER BY n_paras
"""


QUERIES["q161_warc_text_extract"] = q161_warc_text_extract
ORACLES["q161_warc_text_extract"] = O_Q161


# --------------------------------------------------------------- Q162
def q162_bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE apply (operators/bpe.py) certified under the driver hash:
    rule-derived text — each document (doc_id < 500) is the two-word
    line 'ab'*k + ' ' + 'cd'*m with k = 1 + id%4, m = 1 + id%3, built
    JVM-side with repeat() — encoded with the FIXED merge table
    [(a,b), (ab,ab), (c,d), (cd,cd)]. The canonical greedy algorithm
    has a closed form here: (a,b) fuses the k 'ab' pairs, then (ab,ab)
    pairs them left-to-right into ceil(k/2) tokens (odd k leaves a
    lone 'ab'), plus the </w> terminator — so n_tokens =
    ceil(k/2) + ceil(m/2) + 2 exactly, which the oracle recomputes.
    An apply that merged right-to-left, skipped overlap re-scan, or
    dropped the terminator diverges the hash. (TRAINING is the
    iterative non-SQL-expressible half; it is pinned merge-for-merge
    against an independent reference in tests/test_bpe.py.)"""
    from a2b_spark.operators.bpe import bpe_encode

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 500)
        .withColumn(
            "text",
            F.concat(
                F.repeat(F.lit("ab"), (F.col("doc_id") % 4 + 1).cast("int")),
                F.lit(" "),
                F.repeat(F.lit("cd"), (F.col("doc_id") % 3 + 1).cast("int")),
            ),
        )
    )
    merges = [("a", "b"), ("ab", "ab"), ("c", "d"), ("cd", "cd")]
    enc = bpe_encode(docs, "text", merges, "doc_id")
    return (
        enc.groupBy((F.col("doc_id") % 4 + 1).cast("integer").alias("rep_a"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.sum(F.size("tokens")).cast("long").alias("sum_token_arr_len"),
        )
        .orderBy("rep_a")
    )


O_Q162 = """
WITH doc AS (
  SELECT CAST(1 + doc_id % 4 AS INTEGER) AS rep_a,
         CEIL((1 + doc_id % 4) / 2.0) + CEIL((1 + doc_id % 3) / 2.0) + 2 AS nt
  FROM documents WHERE doc_id < 500)
SELECT rep_a,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS sum_tokens,
       CAST(SUM(nt) AS BIGINT) AS sum_token_arr_len
FROM doc GROUP BY rep_a ORDER BY rep_a
"""


QUERIES["q162_bpe_encode_tokens"] = q162_bpe_encode_tokens
ORACLES["q162_bpe_encode_tokens"] = O_Q162
