"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The container has no image/audio libraries, so the decode step is STUBBED
(``decode_media`` raises NotImplementedError unless ``fake=True``, which
substitutes a deterministic fake decoder). Everything around the stub —
schema, Arrow batch shape, ``mapInPandas`` signature, partition sizing —
is real and tested, so swapping in a real decoder (PIL/ffmpeg UDF body)
changes one function body only.

Scale notes: media rows are wide (payloads dominate); keep
``spark.sql.files.maxPartitionBytes`` at default 128 MB so a partition
holds a bounded number of payloads, and select metadata columns only
(column pruning) when the payload isn't needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents table: the utf-8 bytes of the
    text stand in for an opaque payload (deterministic; real pipelines read
    payloads from object storage)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length("text").alias("width"),
            F.lit(1).alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, fake: bool = False):
    """The decoder stub. Real implementation would be e.g.
    ``PIL.Image.open(io.BytesIO(payload))``."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in "
            "this container; pass fake=True for the deterministic stand-in"
        )
    # Deterministic fake: "pixels" = byte histogram over 8 buckets.
    import numpy as np

    arr = np.frombuffer(payload or b"", dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    return hist.astype("float64")


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, n_bytes, features array<double>) via mapInPandas — Arrow
    batches in, vectorized numpy per batch. The decode call is per-payload
    by necessity (opaque bytes); everything else is batch-wise."""
    schema = "media_id long, n_bytes long, features array<double>"

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = [
                decode_media(p, fake=fake).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            n_bytes = [len(p) if p is not None else 0 for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype(np.int64),
                    "n_bytes": pd.Series(n_bytes, dtype="int64"),
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=schema)


def resize_media(
    media: DataFrame, out_w: int = 4, fake: bool = True
) -> DataFrame:
    """(media_id, meta, resized array<double>) — resize plumbing via
    mapInPandas: decode each payload, average-pool the pixel vector down
    to ``out_w`` cells, emit alongside updated typed metadata (width
    becomes out_w). With a real decoder the body becomes
    ``PIL.Image.resize``; the Spark-side contract — Arrow batch shape,
    binary-in/array-out schema, metadata rewrite — is exactly what a 100 TB
    image pipeline runs, and is what this exercises."""
    schema = (
        "media_id long, kind string, width int, height int, "
        "resized array<double>"
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                if p is None:
                    out.append(None)
                    continue
                px = decode_media(p, fake=fake)
                # avg-pool to out_w cells (pad the tail cell as needed)
                n = len(px)
                cells = np.array_split(px, out_w) if n else [np.zeros(1)] * out_w
                out.append([float(c.mean()) if len(c) else 0.0 for c in cells])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype(np.int64),
                    "kind": pdf["kind"],
                    "width": np.full(len(pdf), out_w, dtype="int32"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                    "resized": out,
                }
            )

    return media.mapInPandas(run, schema=schema)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing: emit up to ``max_frames`` fixed-offset
    "frames" (byte slices) per payload — the row-explosion shape of video
    frame sampling, with deterministic fake frames. Pure column ops."""
    offsets = F.sequence(F.lit(0), F.lit(max_frames - 1))
    return (
        media.select(
            "media_id",
            F.octet_length(F.col("payload")).alias("n_bytes"),
            F.explode(offsets).alias("frame_idx"),
            F.col("payload"),
        )
        .filter(F.col("frame_idx") * every_n_bytes < F.col("n_bytes"))
        .select(
            "media_id",
            "frame_idx",
            F.substring(
                F.col("payload"), F.col("frame_idx") * every_n_bytes + 1, every_n_bytes
            ).alias("frame_bytes"),
        )
    )
