"""Multimodal binary columns — driver-mandated extension (BASELINE
north star: image/audio/video at 100 TB).

Model: media lives as an opaque ``binary`` payload column with typed
metadata — exactly the shape ``binaryFile`` scans produce for a raw
lake (io.readers.read_binary_files; the reference's raw-PDF lake,
``ingest_harvest_data.py:94``). Decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages: the executor
never materializes more than one batch of payloads, partitions stay
independent, and the Python boundary is crossed once per batch, not
per row.

The real codec step is STUBBED (no image/audio libs in this
container): ``decode_media`` raises NotImplementedError, and the
tested pipelines use a deterministic fake extractor over the payload
bytes (sha256 + length-derived dimensions). The Spark-side plumbing —
schema, batching, fan-out, partitioning — is the real thing, and
because the fake is byte-deterministic the whole pipeline is
oracle-verifiable in SQL.

Payload fixture: ``documents.text`` UTF-8-encoded stands in for media
bytes (the container ships no binary corpus).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bow_hunter_pipeline_spark.io.readers import read_table

try:  # pragma: no cover - codec libs are absent in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def decode_media(payload: bytes, kind: str = "image"):
    """The real codec seam. At deploy time this dispatches to
    PIL/ffmpeg/soundfile per ``kind``; this container has none of them,
    so the call is an explicit stub (the tested path is
    ``fake_features`` below)."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "media codecs unavailable in this environment; "
            "use the deterministic fake-extract pipeline (mm_decode_meta)"
        )
    raise NotImplementedError("real decode not wired yet")  # pragma: no cover


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary payload + typed metadata struct — the
    canonical multimodal row shape (payload: binary, media: struct)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
        ).alias("media"),
    )


_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha256_hex", T.StringType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
    ]
)


def decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode/feature-extract pipeline: binary payload →
    mapInPandas extractor → typed feature columns.

    Scale: no shuffle at all — the extract is a narrow per-partition
    map; Arrow moves payload batches to Python once. Partition sizing
    is the only knob that matters (maxPartitionBytes keeps a batch of
    payloads within executor memory).

    The extractor is a closure (pickled by value), so workers never
    need this package importable — required for driver harnesses that
    load the engine from an arbitrary cwd.
    """

    def fake_extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Deterministic stand-in for a codec: content hash +
        # byte-derived dimensions; one output row per input row.
        import hashlib as _hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            n = payloads.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int32"),
                    "sha256_hex": payloads.map(
                        lambda b: _hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "fake_width": (n % 640 + 1).astype("int32"),
                    "fake_height": (n % 480 + 1).astype("int32"),
                }
            )

    docs = read_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(fake_extract, _META_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_off", T.IntegerType()),
    ]
)

N_FRAME_MOD = 5  # fake frame count = n_bytes % 5 + 1


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling: every payload fans out to its frame
    index/byte-offset rows via mapInPandas (set-returning Python stage,
    the A3 block→grid pivot shape generalized to media). Row expansion
    happens inside the pandas batch — no explode shuffle, output stays
    partition-local."""
    n_frame_mod = N_FRAME_MOD

    def fake_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_off = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_bytes = len(payload)
                n_frames = n_bytes % n_frame_mod + 1
                stride = n_bytes // n_frames
                for i in range(n_frames):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_off.append(i * stride)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_off": pd.Series(out_off, dtype="int32"),
                }
            )

    docs = read_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(fake_frames, _FRAME_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("out_bytes", T.IntegerType()),
    ]
)


def resize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize: payload → half-resolution payload inside the
    pandas batch (the deploy-time seam for PIL ``Image.resize`` /
    ffmpeg scale). The fake halves the byte-derived dimensions and
    decimates the payload to ``out_w*out_h`` bytes, so the output byte
    count — not just the metadata — proves the payload was transformed.

    Scale: narrow map like decode_meta; the resized payload is smaller
    than the input, so downstream stages shrink — do resize before any
    shuffle that would move payload bytes.
    """

    def fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_w, out_h, out_n = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                w, h = n % 640 + 1, n % 480 + 1
                rw, rh = (w + 1) // 2, (h + 1) // 2
                resized = bytes(payload)[: rw * rh]
                out_doc.append(doc_id)
                out_w.append(rw)
                out_h.append(rh)
                out_n.append(len(resized))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "out_w": pd.Series(out_w, dtype="int32"),
                    "out_h": pd.Series(out_h, dtype="int32"),
                    "out_bytes": pd.Series(out_n, dtype="int32"),
                }
            )

    docs = read_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(fake_resize, _RESIZE_SCHEMA)


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("win_idx", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("energy", T.LongType()),
        T.StructField("peak", T.IntegerType()),
    ]
)

AUDIO_WINDOW = 64  # samples (bytes) per analysis window


def audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio analysis: payload as 8-bit PCM → fixed-size
    analysis windows → per-window energy (sum of squared samples) and
    peak. The deploy-time seam swaps the byte view for a real decoder
    (soundfile/ffmpeg) ahead of the same windowing; window fan-out and
    integer feature math are the real pipeline.

    Exactness: all-integer per-window reductions — no float, no order
    sensitivity. (The fixture payload is ASCII text bytes, so the SQL
    oracle recomputes every sample via ``unicode(substr)``.)

    Scale: like frame_sample, expansion happens inside the pandas
    batch — no shuffle; windows per row bounded by payload size.
    """
    win = AUDIO_WINDOW

    def window_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "win_idx", "n_samples", "energy", "peak")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for w in range(0, len(b), win):
                    chunk = b[w : w + win]
                    out["doc_id"].append(doc_id)
                    out["win_idx"].append(w // win)
                    out["n_samples"].append(len(chunk))
                    out["energy"].append(sum(x * x for x in chunk))
                    out["peak"].append(max(chunk))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "win_idx": pd.Series(out["win_idx"], dtype="int32"),
                    "n_samples": pd.Series(out["n_samples"], dtype="int32"),
                    "energy": pd.Series(out["energy"], dtype="int64"),
                    "peak": pd.Series(out["peak"], dtype="int32"),
                }
            )

    docs = read_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(window_features, _AUDIO_SCHEMA)


_PATCH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("patch_sums", T.ArrayType(T.LongType())),
    ]
)

N_PATCHES = 4
EMBED_DIM = 8
EMBED_MOD = 9973
N_EMBED_PROBES = 5


def patch_embed_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal → retrieval handoff, end to end in one plan: decode
    each payload into PATCH features (mapInPandas — the CLIP-style
    patchify step; the fake feature is each quarter-payload's byte
    sum, so the whole pipeline stays byte-deterministic), pool the
    patches into a D=8 integer embedding, and run exact top-3
    retrieval for the first five docs as probes (integer dot products
    — the h2_int8 discipline, so every score hash-matches the
    oracle's replay from raw text).

    This is the cross-modal shape a media lake serves: codec →
    patch features → pooled embedding COLUMN → the same ANN machinery
    the text embeddings use. Swap the byte-sum fake for a real vision
    encoder at the codec seam; the plan around it — narrow patchify
    map, embedding arithmetic in built-ins, bounded probe broadcast,
    per-probe top-k window — does not change.

    Scale: patchify is a narrow map (no shuffle), and the probe
    branch filters BELOW it (the predicate reaches the parquet scan),
    so the corpus is decoded exactly once plus the 5 probe docs;
    scoring is probes x corpus with a 5-row broadcast probe side (the
    exact baseline; the IVF/LSH family is the pruned path at volume).
    """
    n_patches = N_PATCHES

    def patchify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_sums = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                stride = n // n_patches
                sums = []
                for p in range(n_patches):
                    lo = p * stride
                    hi = (p + 1) * stride if p < n_patches - 1 else n
                    sums.append(sum(b[lo:hi]))
                out_doc.append(doc_id)
                out_sums.append(sums)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "patch_sums": pd.Series(out_sums, dtype="object"),
                }
            )

    docs = read_table(spark, sf_dir, "documents")

    def embed(source: DataFrame) -> DataFrame:
        # pool: emb[d] = sum over patches of (patch_sum * (d+1)) % MOD
        # — integer arithmetic end to end, replayable in any engine
        return with_payload(source).mapInPandas(
            patchify, _PATCH_SCHEMA
        ).select(
            "doc_id",
            F.expr(
                f"transform(sequence(1, {EMBED_DIM}), d -> "
                f"aggregate(patch_sums, cast(0 as bigint), "
                f"(acc, s) -> acc + (s * d) % {EMBED_MOD}))"
            ).alias("emb"),
        )

    # the probe filter is applied BELOW the patchify (r14): a filter
    # on mapInPandas OUTPUT cannot push through the opaque Python
    # stage, so filtering the pooled embeddings decoded the ENTIRE
    # corpus a second time just to keep the 5 probe rows. Filtering
    # the source first reaches the parquet scan (PushedFilters) and
    # the probe branch decodes exactly the probe docs — decode cost
    # is 1× the corpus + 5 docs at any volume.
    probes = embed(docs.filter(F.col("doc_id") < N_EMBED_PROBES)).select(
        F.col("doc_id").alias("q_doc"), F.col("emb").alias("q_emb")
    )
    cands = embed(docs).select(
        F.col("doc_id").alias("n_doc"), F.col("emb").alias("n_emb")
    )
    dot = F.aggregate(
        F.zip_with("q_emb", "n_emb", lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_doc").orderBy(
        F.desc("dot"), F.col("n_doc")
    )
    return (
        F.broadcast(probes)
        .crossJoin(cands)
        .filter(F.col("q_doc") != F.col("n_doc"))
        .withColumn("dot", dot)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("q_doc", "n_doc", "dot", "rank")
    )


_SHOT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_boundaries", T.IntegerType()),
        T.StructField("first_boundary_idx", T.IntegerType()),
    ]
)

SHOT_THRESHOLD = 16  # |feature delta| above this = a cut


def frame_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal SHOT-BOUNDARY detection: sample each payload's
    frames (the ``frame_sample`` offsets), extract a per-frame feature,
    and flag a cut wherever consecutive features jump by more than the
    threshold — the video segmentation step a clip-level training
    pipeline runs before captioning/packing. The whole per-payload
    loop (offsets → features → deltas → per-doc stats) runs INSIDE one
    Arrow batch in ``mapInPandas``: frames never explode into a
    shuffle, output is one row per payload, partitions stay
    independent — the plumbing a real decoder (ffmpeg scene filter)
    drops into at the documented seam.

    The fake feature is the payload byte at each frame offset
    (byte-deterministic), so the oracle replays the detector exactly
    via ascii()/substr over the ASCII fixture text.
    """
    n_frame_mod = N_FRAME_MOD
    tau = SHOT_THRESHOLD

    def fake_shots(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_frames": [], "n_b": [], "first_b": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_bytes = len(payload)
                n_frames = n_bytes % n_frame_mod + 1
                stride = n_bytes // n_frames
                feats = [payload[i * stride] for i in range(n_frames)]
                cuts = [
                    i
                    for i in range(1, n_frames)
                    if abs(feats[i] - feats[i - 1]) > tau
                ]
                out["doc_id"].append(doc_id)
                out["n_frames"].append(n_frames)
                out["n_b"].append(len(cuts))
                out["first_b"].append(cuts[0] if cuts else None)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "n_frames": pd.Series(out["n_frames"], dtype="int32"),
                    "n_boundaries": pd.Series(out["n_b"], dtype="int32"),
                    "first_boundary_idx": pd.Series(
                        out["first_b"], dtype="Int32"
                    ),
                }
            )

    docs = read_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(fake_shots, _SHOT_SCHEMA)


VAD_THRESHOLD = 9800  # per-sample mean-square energy gate (integer law)


def audio_energy_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: ENERGY-BASED SEGMENTATION (the VAD shape) — the
    clip-extraction step between decode and transcription: windows
    whose mean per-sample energy clears the gate are ACTIVE, and runs
    of consecutive active windows merge into segments via
    gaps-and-islands (win_idx − row_number per doc), each reported
    with its span and total energy. Composes the audio pipeline end
    to end: the Arrow-batch decode seam (:func:`audio_windows` — a
    real decoder drops in there) feeds pure relational segmentation,
    so everything after the UDF is Catalyst-planned window arithmetic.

    Exactness: the gate is the integer cross-multiplication
    ``energy ≥ 9800 · n_samples`` (no float mean), island ids are
    integer differences, segment energies exact bigint sums.

    Scale: the stateful part is two window functions partitioned by
    doc — shuffle keyed on doc_id only, segments never cross docs, so
    a 100 TB corpus segments embarrassingly parallel per document.
    """
    from pyspark.sql import Window

    wins = audio_windows(spark, sf_dir)
    active = wins.filter(
        F.col("energy") >= F.lit(VAD_THRESHOLD) * F.col("n_samples")
    )
    w = Window.partitionBy("doc_id").orderBy("win_idx")
    islands = active.withColumn(
        "seg_id", F.col("win_idx") - F.row_number().over(w)
    )
    return islands.groupBy("doc_id", "seg_id").agg(
        F.min("win_idx").alias("seg_start"),
        F.max("win_idx").alias("seg_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.sum("energy").alias("seg_energy"),
    ).select(
        "doc_id", "seg_start", "seg_end", "n_windows", "seg_energy"
    )


KEYFRAME_FP_BYTES = 16  # fingerprint window at each keyframe offset


def keyframe_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal × H1: CROSS-VIDEO KEYFRAME DEDUP — the pipeline a
    video-training corpus runs between decode and packing: pick one
    KEYFRAME per shot (the first frame, plus the frame after every
    cut — the ``frame_shot_boundaries`` detector re-used), fingerprint
    each keyframe, and find frames shared across distinct videos (re-
    uploads, intro/outro cards, stock footage) so the packer can drop
    repeats. Per video: keyframe count, how many of its keyframes are
    corpus-duplicated (fingerprint in ≥2 distinct docs), and the
    duplicated fraction as an exact single division.

    The per-payload loop (offsets → features → cuts → keyframe
    fingerprints) runs inside one Arrow batch in ``mapInPandas`` —
    frames never explode into a shuffle; only the (keyframe,
    fingerprint) rows shuffle, grouped by fingerprint exactly like
    the span-dedup signal (``h3_dup_span_flags``): collision-sized,
    never O(n²). The fake feature/fingerprint is byte arithmetic on
    the payload (md5 of the KEYFRAME_FP_BYTES-byte window at the
    frame offset), so the oracle replays the whole chain via
    ascii()/substr/md5 over the ASCII fixture text — a real decoder
    (ffmpeg + perceptual hash) drops into the same seam with the
    same plan shape.
    """
    import hashlib

    n_frame_mod = N_FRAME_MOD
    tau = SHOT_THRESHOLD
    w = KEYFRAME_FP_BYTES

    def fake_keyframes(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "fp": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_bytes = len(payload)
                n_frames = n_bytes % n_frame_mod + 1
                stride = n_bytes // n_frames
                feats = [payload[i * stride] for i in range(n_frames)]
                keys = [0] + [
                    i
                    for i in range(1, n_frames)
                    if abs(feats[i] - feats[i - 1]) > tau
                ]
                for i in keys:
                    window = payload[i * stride : i * stride + w]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["fp"].append(hashlib.md5(window).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "fp": pd.Series(out["fp"], dtype="object"),
                }
            )

    docs = read_table(spark, sf_dir, "documents")
    kf = with_payload(docs).mapInPandas(
        fake_keyframes, "doc_id bigint, frame_idx int, fp string"
    )
    # SINGLE-CONSUMER over the decode stage (r14): the previous shape
    # — groupBy(fp) for the duplicate set, a semi-join back onto kf,
    # and a separate groupBy(doc_id) — instantiated the mapInPandas
    # decode subtree 3× per query (column pruning specializes each
    # branch, so ReusedExchange never dedups them; with a real ffmpeg
    # decoder in this seam that is 3× the dominant cost). A window
    # over fp marks corpus-duplicated fingerprints in place: decode
    # runs ONCE, and only the tiny (doc_id, frame_idx, fp) rows
    # shuffle — by fp for the mark, by doc_id for the rollup. fp
    # groups are collision-sized, so the windowed collect_set is
    # bounded exactly like the old aggregate.
    marked = kf.withColumn(
        "nd", F.size(F.collect_set("doc_id").over(Window.partitionBy("fp")))
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keyframes"),
        F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup_keyframes"),
    )
    return per_doc.select(
        "doc_id",
        "n_keyframes",
        "n_dup_keyframes",
        (
            F.col("n_dup_keyframes").cast("double")
            / F.col("n_keyframes").cast("double")
        ).alias("dup_fraction"),
    )
