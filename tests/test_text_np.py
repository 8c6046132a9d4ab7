"""numpy fast paths (functions/text_np.py, operators/ann.py srp_bucket_np)
must be value-equal to their Catalyst spec versions — the spec stays the
oracle; these tests are the bit-equality evidence (VERDICT r2 next #8).
Also covers frame_sample (the one operator with zero r2 coverage, next #9)
and the optional-import seam for real pixel decode."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from game_library_enrichment_etl_spark.functions import text as TX
from game_library_enrichment_etl_spark.functions.text_np import (
    lang_id_np,
    quality_token_stats_np,
)
from game_library_enrichment_etl_spark.operators import ann as ANN

EDGE_TEXTS = [
    "the cat and the dog in the house",  # en stopwords
    "der hund und die katze ist nicht da",  # de
    "",  # empty
    "   ",  # whitespace only
    "...!!!",  # punctuation only
    "xyzzy plugh qwop",  # no stopwords anywhere -> und
    "el que la de en es",  # es
    "le la les et est que",  # fr
    "o a os que de em",  # pt vs es tie material
    "Mixed CASE With.Punct,and the spaces   collapsed",
    "a b c d e f g h i j k l m n o p",  # short tokens
    None,
]


def _docs(spark, sf="/root/testdata/sf0.001"):
    return spark.read.parquet(f"{sf}/documents.parquet")


def test_quality_stats_np_equals_catalyst(spark):
    df = _docs(spark).unionByName(
        spark.createDataFrame(
            pd.DataFrame({"doc_id": range(1000, 1000 + len(EDGE_TEXTS)),
                          "text": EDGE_TEXTS}),
            "doc_id long, text string",
        ),
        allowMissingColumns=True,
    )
    spec = df.select(
        "doc_id",
        TX.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        TX.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
        F.round(TX.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        TX.quality_score(F.col("text")).alias("quality"),
    )
    fast = df.select(
        "doc_id", quality_token_stats_np()(F.col("text")).alias("s")
    ).select("doc_id", "s.n_tokens", "s.n_bpe_tokens", "s.punct_ratio", "s.quality")
    a = spec.toPandas().sort_values("doc_id").reset_index(drop=True)
    b = fast.toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_lang_id_np_equals_catalyst(spark):
    df = _docs(spark).unionByName(
        spark.createDataFrame(
            pd.DataFrame({"doc_id": range(1000, 1000 + len(EDGE_TEXTS)),
                          "text": EDGE_TEXTS}),
            "doc_id long, text string",
        ),
        allowMissingColumns=True,
    )
    spec = df.select("doc_id", TX.lang_id(F.col("text")).alias("lang"))
    fast = df.select("doc_id", lang_id_np()(F.col("text")).alias("lang"))
    a = spec.toPandas().sort_values("doc_id").reset_index(drop=True)
    b = fast.toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_srp_bucket_np_equals_catalyst(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    spec = emb.select(
        "vec_id", ANN.srp_bucket(F.col("embedding"), 8, 64).alias("bkt")
    )
    fast = emb.select(
        "vec_id", ANN.srp_bucket_np_udf(8, 64)(F.col("embedding")).alias("bkt")
    )
    a = spec.toPandas().sort_values("vec_id").reset_index(drop=True)
    b = fast.toPandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_frame_sample_fanout(spark):
    from game_library_enrichment_etl_spark.operators.multimodal import frame_sample

    blobs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "blob": [b"a" * 2500, b"xy" * 10, None, b""],
        }
    )
    df = spark.createDataFrame(blobs, "doc_id long, blob binary")
    out = frame_sample(df, every=1000).toPandas().sort_values(
        ["doc_id", "frame_idx"]
    ).reset_index(drop=True)
    # 2500 bytes -> 3 frames (1000, 1000, 500); 20 bytes -> 1; None/empty -> 0
    assert list(out["doc_id"]) == [1, 1, 1, 2]
    assert list(out["frame_idx"]) == [0, 1, 2, 0]
    got = [bytes(b) for b in out["frame_bytes"]]
    assert [len(b) for b in got] == [1000, 1000, 500, 20]
    assert got[0] == b"a" * 1000 and got[2] == b"a" * 500 and got[3] == b"xy" * 10


def test_real_decode_available_without_pil(spark):
    """real=True no longer gates on PIL: the pure-Python PNG decoder backs
    it in PIL-less environments (r4's one declared-but-never-executed
    capability), and a corrupt body falls back to the header stub instead
    of raising. tests/test_multimodal_real.py covers pixel correctness."""
    from game_library_enrichment_etl_spark.operators import multimodal as MM

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "blob": [b"\x89PNG\r\n\x1a\nxxxxIHDR" + b"\0" * 8]}),
        "doc_id long, blob binary",
    )
    out = MM.decode_binary_column(df, real=True).collect()  # must not raise
    assert len(out) == 1
