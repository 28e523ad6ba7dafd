"""UDF-tier catalog queries (SURVEY.md §2 C-udf, C-llm-multimodal).

Pandas UDFs (Arrow-batched, vectorized) in all three shapes — scalar,
grouped aggregate, ``applyInPandas`` group-map — plus the multimodal
binary-column operators. Python enters the plan ONLY where the operator
semantically requires it (custom per-group model-ish logic, stubbed
codecs); everything else in the repo stays JVM-side.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .catalog import query
from .llm.multimodal import (
    audio_window_energy,
    extract_features,
    extract_metadata,
    sample_frames,
    synthesize_payload,
)
from .session import prep
from .sources.testdata import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prep(spark)
    return load_table(spark, sf_dir, name)


# NB: pandas_udf with a DDL-string return type parses it through the
# active SparkContext — so UDFs are declared with DataType objects,
# keeping module import session-free (the catalog loads before the
# driver hands us its session).
@pandas_udf(T.DoubleType())
def _sigmoid_log1p(x: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: sigmoid(log1p(x)) over Arrow batches."""
    import numpy as np

    v = np.log1p(x.to_numpy(dtype=float))
    return pd.Series(1.0 / (1.0 + np.exp(-v)))


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT o_orderkey,
           ROUND(1.0 / (1.0 + EXP(-LN(1 + o_totalprice))), 6) AS squashed
    FROM orders
    ORDER BY o_orderkey
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow-vectorized): numpy math over column
    batches, ~10-100x over row-at-a-time Python UDFs. The oracle runs the
    identical closed-form in SQL — exact to 1e-6.
    """
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", F.round(_sigmoid_log1p("o_totalprice"), 6).alias("squashed")
    ).orderBy("o_orderkey")


@pandas_udf(T.DoubleType())
def _weighted_avg(price: pd.Series, qty: pd.Series) -> float:  # type: ignore[misc]
    """Grouped-aggregate pandas UDF: quantity-weighted mean price."""
    den = qty.sum()
    return float((price * qty).sum() / den) if den else float("nan")


@query(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 6) AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (a pandas UDAF): weighted average
    per group, Arrow-transferred once per group partition.
    """
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(F.round(_weighted_avg("l_extendedprice", "l_quantity"), 6).alias("wavg_price"))
        .orderBy("l_returnflag")
    )


@query(
    "udf_apply_in_pandas",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           ROUND((c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_mktsegment))
                 / NULLIF(STDDEV_SAMP(c_acctbal) OVER (PARTITION BY c_mktsegment), 0),
                 6) AS acctbal_z
    FROM customer
    ORDER BY c_custkey
    """,
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas group-map: per-segment z-score normalization — the
    'fit something per group, transform the group' shape (feature
    scaling, per-entity models). The oracle reproduces it with window
    functions; the pandas path exists for logic SQL can't express.
    """
    c = _t(spark, sf_dir, "customer")
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_mktsegment", T.StringType()),
            T.StructField("acctbal_z", T.DoubleType()),
        ]
    )

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["c_acctbal"].std(ddof=1)
        z = (pdf["c_acctbal"] - pdf["c_acctbal"].mean()) / std if std else pd.Series([float("nan")] * len(pdf))
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "acctbal_z": z.round(6),
            }
        )

    return c.groupBy("c_mktsegment").applyInPandas(normalize, schema).orderBy("c_custkey")


@query(
    "mm_metadata_extract",
    oracle="""
    SELECT doc_id,
           CASE WHEN lang IN ('en', 'de') THEN 'image'
                WHEN lang IN ('fr', 'es') THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST((LENGTH(text) % 640) + 16 AS INT) AS dim_a,
           CAST((LENGTH(text) % 480) + 16 AS INT) AS dim_b,
           CAST(8 + OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes
    FROM documents
    ORDER BY doc_id
    """,
)
def mm_metadata_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata WITHOUT decode: synthesize binary payloads
    (magic + header + body), then recover media type and header fields
    from raw bytes JVM-side (substring/hex/conv on binary). The oracle
    recomputes the header fields from the synthesis rule.
    """
    d = _t(spark, sf_dir, "documents")
    media = (
        F.when(F.col("lang").isin("en", "de"), F.lit("image"))
        .when(F.col("lang").isin("fr", "es"), F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    with_bin = d.select("doc_id", "text", media.alias("media_type")).withColumn(
        "payload", synthesize_payload("text", "media_type")
    )
    meta = with_bin.select("doc_id", extract_metadata("payload").alias("m"))
    return meta.select(
        "doc_id",
        F.col("m.media_type").alias("media_type"),
        F.col("m.dim_a").alias("dim_a"),
        F.col("m.dim_b").alias("dim_b"),
        F.col("m.n_bytes").alias("n_bytes"),
    ).orderBy("doc_id")


@query("mm_feature_extract", oracle=None)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode + feature extraction over binary payloads via
    mapInPandas (deterministic 16-bin byte histogram standing in for a
    real model). Rows-only: the stub codec is engine-internal; schema,
    determinism and batch plumbing are pinned in tests/test_multimodal.py.
    """
    d = _t(spark, sf_dir, "documents")
    with_bin = d.select(
        "doc_id", "text", F.lit("image").alias("media_type")
    ).withColumn("payload", synthesize_payload("text", "media_type"))
    feats = extract_features(with_bin)
    return feats.select(
        "doc_id",
        "media_type",
        "n_body_bytes",
        F.round(F.element_at("features", 1), 6).alias("f0"),
        F.round(F.element_at("features", 8), 6).alias("f7"),
        F.size("features").alias("n_features"),
    ).orderBy("doc_id")


@query(
    "mm_audio_energy",
    oracle="""
    WITH audio AS (
      SELECT doc_id, text FROM documents WHERE lang IN ('fr', 'es')
    ), chars AS (
      SELECT doc_id, i, ascii(substr(text, CAST(i AS INT), 1)) AS v
      FROM audio, UNNEST(range(1, LENGTH(text) + 1)) AS u(i)
    )
    SELECT doc_id,
           CAST((i - 1) // 32 AS INT) AS window_idx,
           CAST(COUNT(*) AS INT) AS n_samples,
           ROUND(SQRT(AVG(v * v * 1.0)), 6) AS rms
    FROM chars GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS energy over "audio" payloads (32-sample windows) via
    Arrow-batched mapInPandas — the audio leg of the multimodal triad
    (image resize / video frame-sample / audio energy). The stub "PCM"
    is the body bytes, so the oracle recomputes identical energies from
    the characters; all-ASCII corpus keeps char codes == body bytes.
    """
    d = _t(spark, sf_dir, "documents").filter(F.col("lang").isin("fr", "es"))
    with_bin = d.select(
        "doc_id", "text", F.lit("audio").alias("media_type")
    ).withColumn("payload", synthesize_payload("text", "media_type"))
    return audio_window_energy(with_bin).orderBy("doc_id", "window_idx")


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(CEIL(OCTET_LENGTH(ENCODE(text)) / 64.0) AS INT) AS n_frames,
           CAST(UNNEST(RANGE(0, CAST(CEIL(OCTET_LENGTH(ENCODE(text)) / 64.0) AS INT), 4)) AS INT) AS frame_idx,
           CAST(8 + UNNEST(RANGE(0, CAST(CEIL(OCTET_LENGTH(ENCODE(text)) / 64.0) AS INT), 4)) * 64 AS BIGINT) AS frame_offset
    FROM documents
    WHERE lang = 'zh'
    ORDER BY doc_id, frame_idx
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over "video" payloads: body bytes as 64-byte
    frames, keep every 4th index — sequence+filter+explode, fully
    JVM-side; only offsets flow downstream (at 100 TB the frames
    themselves never move until a later targeted fetch).
    """
    d = _t(spark, sf_dir, "documents")
    vids = d.filter(F.col("lang") == "zh").select(
        "doc_id", "text", F.lit("video").alias("media_type")
    ).withColumn("payload", synthesize_payload("text", "media_type"))
    out = sample_frames(vids, every_k=4, frame_bytes=64)
    return out.select(
        "doc_id",
        F.col("n_frames").cast("int").alias("n_frames"),
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.col("frame_offset").cast("long").alias("frame_offset"),
    ).orderBy("doc_id", "frame_idx")


@query(
    "udtf_sentence_split",
    oracle="""
    WITH sentences AS (
      SELECT doc_id,
             unnest(list_filter(
               list_transform(string_split(text, '.'), s -> trim(s)),
               s -> s <> '')) AS sentence
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, sentence,
           CAST(LEN(list_filter(string_split_regex(sentence, '\\s+'), x -> x <> '')) AS INT) AS n_tokens
    FROM sentences
    ORDER BY doc_id, sentence
    """,
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): one input row -> N output
    rows, here sentence-splitting with a per-sentence token count — the
    generic row-expanding shape (parsers, chunkers) beyond what explode
    of a column expression covers. Registered and invoked through
    spark.sql LATERAL.
    """
    from pyspark.sql.functions import udtf

    prep(spark)

    @udtf(returnType="sentence: string, n_tokens: int", useArrow=True)
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for raw in text.split("."):
                s = raw.strip()
                if s:
                    yield s, len(s.split())

    spark.udtf.register("sentence_split", SentenceSplit)
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, s.sentence, s.n_tokens
        FROM udtf_docs, LATERAL sentence_split(text) s
        ORDER BY doc_id, sentence
        """
    )


@query("mm_binary_ingest", oracle=None)
def mm_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal raw-file ingest via the ``binaryFile`` source: each
    file lands as one row of (path, length, content bytes) — the Spark
    entry point for image/audio corpora (decode then happens in
    Arrow-batched UDFs, llm/multimodal.py). Emits per-file size + md5
    digest; content correctness is pinned against hashlib in
    tests/test_multimodal.py (no SQL oracle: DuckDB has no
    filesystem-blob view of the same directory).

    Scale note: binaryFile caps per-file content at
    spark.sql.sources.binaryFile.maxLength (2 GB); for larger media,
    store pointers and range-read in the decode UDF instead.
    """
    prep(spark)
    files = spark.read.format("binaryFile").load(f"{sf_dir}/*.parquet")
    return (
        files.select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
            F.col("length").cast("bigint").alias("n_bytes"),
            F.md5(F.col("content")).alias("content_md5"),
        )
        .orderBy("file_name")
    )


@query(
    "mm_resize_pipeline",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 224
                ELSE length(text) % 640 + 16 END AS INT) AS dim_a,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 224
                ELSE length(text) % 480 + 16 END AS INT) AS dim_b,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 8 + 196
                ELSE 8 + octet_length(encode(text)) END AS BIGINT) AS n_bytes
    FROM documents
    ORDER BY doc_id
    """,
)
def mm_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize through the Arrow-batched decode path: synthesize
    mixed-media payloads, resize images to 224x224 (stub resampler —
    llm/multimodal.py), pass audio/video through untouched. The oracle
    predicts the post-resize header dims and byte sizes exactly (the
    budget arithmetic is deterministic), so the mapInPandas plumbing is
    hash-checked even though the resampled BYTES are pinned by unit
    tests instead (binary cells don't survive the driver's sort-based
    canonicalization).
    """
    from .llm.multimodal import resize_images, synthesize_payload

    prep(spark)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        "text",
    )
    payloads = d.select(
        "doc_id", "media_type", synthesize_payload("text", "media_type").alias("payload")
    )
    resized = resize_images(payloads, 224, 224)
    return resized.select(
        "doc_id", "media_type", "dim_a", "dim_b",
        F.length("payload").cast("bigint").alias("n_bytes"),
    ).orderBy("doc_id")


@query(
    "udf_map_in_arrow",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(sqrt(list_sum(list_transform(embedding,
                               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6)
             AS l2_norm
    FROM embeddings
    ORDER BY vec_id
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy batch hop below pandas UDFs — the
    function receives raw ``pyarrow.RecordBatch``es, so numpy works on
    Arrow buffers without a pandas materialization (the right tier for
    tight numeric kernels over array columns at 100 TB: one
    serialization boundary, vectorized end to end). Computes per-vector
    L2 norms over the embedding column; the oracle recomputes them with
    list lambdas. Rounded to 6 dp — float32→float64 accumulation order
    inside one vector is fixed (sequential), so the rounded values are
    engine-stable.
    """
    import pyarrow as pa

    prep(spark)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def norms(batches):
        import numpy as np

        for batch in batches:
            ids = batch.column("vec_id")
            embs = batch.column("embedding")
            out_dim, out_norm = [], []
            for i in range(batch.num_rows):
                v = np.asarray(embs[i].as_py(), dtype=np.float64)
                out_dim.append(len(v))
                # match the oracle's reduction order: square then
                # sequential sum (np.sum pairwise differs in last ulp,
                # so accumulate with math.fsum-free plain Python order)
                acc = 0.0
                for x in v:
                    acc += x * x
                out_norm.append(round(float(acc) ** 0.5, 6))
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out_dim, pa.int32()), pa.array(out_norm, pa.float64())],
                names=["vec_id", "dim", "l2_norm"],
            )

    return emb.mapInArrow(
        norms, "vec_id bigint, dim int, l2_norm double"
    ).orderBy("vec_id")
