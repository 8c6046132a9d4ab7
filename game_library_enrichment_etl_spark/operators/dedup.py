"""Deduplication operators for web-scale corpora.

Five families, each a first-class operator with a DuckDB-expressible spec:

- exact:        md5 fingerprint of normalized text, keep min-key winner
                (hash groupBy — one shuffle, map-side combinable)
- MinHash+LSH:  word shingles -> k minhashes -> bands -> bucket join ->
                jaccard-verified pairs (the classic shingle/band pipeline)
- SimHash:      32-bit sign-of-weighted-bit-sums sketch + banded hamming
                candidate pairs
- n-gram Jaccard: char n-gram sets, blocked self-join, exact jaccard
- embedding cosine: see operators/ann.py (same kernel)

Scale notes: every family is (blocking-key shuffle + within-block pairs) —
no global cross join anywhere. At 100 TB the band/bucket keys ARE the
partitioning keys; hot buckets (boilerplate pages) can be salted or capped
(cap the per-bucket candidate list; log what was dropped).

Reference precursors: full-row/subset dedup (A4/A5,
/root/reference/src/how_long_to_beat.py:207,373;
/root/reference/src/game_library.py:105) and the blocked fuzzy-match
pipeline shape (/root/reference/src/internet_games_database.py:412-497).

All hashes are the shared 60-bit md5 hash (functions/text.py) so the
DuckDB oracle reproduces every value exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text, token_hash, tokens


# ----------------------------------------------------------------- exact
def exact_dedup(
    df: DataFrame, text_col: str = "text", key: str = "doc_id"
) -> DataFrame:
    """One row per distinct normalized text: fingerprint, group size, and
    the kept representative (min key — deterministic winner, the engine's
    analog of the reference's keep-first dedup)."""
    return (
        df.select(F.md5(normalize_text(F.col(text_col))).alias("fingerprint"), F.col(key))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(key).alias("keeper"))
    )


# --------------------------------------------------------------- minhash
def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text."""
    t = tokens(col)
    k = F.size(t) - (n - 1)
    idx = F.sequence(F.lit(1), F.greatest(k, F.lit(1)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n)))
    return F.array_distinct(sh)


def minhash_signature(col: Column, n_hashes: int = 12, shingle_n: int = 3) -> Column:
    """Array of ``n_hashes`` minhashes: min over shingles of
    hash(shingle || '|' || i). Hash-family-by-suffix keeps every value
    reproducible in plain SQL (no modular multiply overflow games)."""
    sh = word_shingles(col, shingle_n)
    sigs = [
        F.array_min(
            F.transform(sh, lambda s: token_hash(F.concat(s, F.lit(f"|{i}"))))
        ).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return F.array(*sigs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    n_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH, jaccard-verified.

    Pipeline: signature -> band keys -> explode -> self-join per band
    (the ONLY join; band key is the shuffle key) -> distinct candidate
    pairs -> exact jaccard over distinct shingle sets -> threshold.
    Returns (key_a, key_b, jaccard) with key_a < key_b.
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signature(F.col(text_col), n_hashes, shingle_n)
    base = df.select(
        F.col(key).alias("k"),
        word_shingles(F.col(text_col), shingle_n).alias("sh"),
        sig.alias("sig"),
    )
    band_keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    F.lit(b),
                    *[
                        F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
    banded = base.select("k", "sh", F.explode(band_keys).alias("band"))
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), "band")
        .where(F.col("a.k") < F.col("b.k"))
        .select(
            F.col("a.k").alias("key_a"),
            F.col("b.k").alias("key_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["key_a", "key_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        cand.select("key_a", "key_b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= jaccard_threshold)
    )


# --------------------------------------------------------------- simhash
def simhash32(col: Column) -> Column:
    """32-bit SimHash of the whitespace tokens (signed-bit-sum sketch).

    Stays in 32 bits so every intermediate fits comfortably in int64 in
    both engines; per-token hash is the shared 60-bit md5 hash.
    """
    th = F.transform(tokens(col), token_hash)

    def _vote(j: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    bits = []
    for j in range(32):
        vote = F.aggregate(th, F.lit(0).cast("bigint"), _vote(j))
        bits.append(F.when(vote > 0, F.lit(2**j).cast("bigint")).otherwise(F.lit(0).cast("bigint")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """Near-dup candidate pairs by banded SimHash: split the 32-bit sketch
    into ``n_chunks`` 8-bit chunks; by pigeonhole any pair within
    ``max_hamming`` <= n_chunks-1 shares at least one exact chunk —
    equi-join on (chunk_idx, chunk_val), then verify true hamming."""
    base = df.select(F.col(key).alias("k"), simhash32(F.col(text_col)).alias("sh"))
    width = 32 // n_chunks
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("c"),
                F.shiftright(F.col("sh"), c * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("v"),
            )
            for c in range(n_chunks)
        ]
    )
    e = base.select("k", "sh", F.explode(chunks).alias("ch")).select(
        "k", "sh", F.col("ch.c").alias("c"), F.col("ch.v").alias("v")
    )
    pairs = (
        e.alias("a")
        .join(e.alias("b"), ["c", "v"])
        .where(F.col("a.k") < F.col("b.k"))
        .select(
            F.col("a.k").alias("key_a"),
            F.col("b.k").alias("key_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["key_a", "key_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("key_a", "key_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


# -------------------------------------------------------- n-gram jaccard
def char_ngrams(col: Column, n: int = 4) -> Column:
    t = normalize_text(col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - n + 1, F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: t.substr(i, F.lit(n))))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    n: int = 4,
    threshold: float = 0.4,
    block_col: str | None = "lang",
) -> DataFrame:
    """Exact char-n-gram jaccard over pairs blocked by ``block_col`` plus a
    coarse length bucket (pairs differing >2x in length can't pass 0.4)."""
    t = normalize_text(F.col(text_col))
    base = df.select(
        F.col(key).alias("k"),
        char_ngrams(F.col(text_col), n).alias("g"),
        (F.col(block_col) if block_col else F.lit("_")).alias("blk"),
        F.floor(F.log2(F.greatest(F.length(t), F.lit(1)))).alias("lb"),
    )
    # pure equi-join: the left side explodes to its neighbor length buckets
    # so (blk, lb) is a hashable shuffle key (no theta-join fallback at scale)
    a = base.select(
        "k", "g", "blk", F.explode(F.array(F.col("lb") - 1, F.col("lb"), F.col("lb") + 1)).alias("lb")
    ).alias("a")
    b = base.alias("b")
    cand = a.join(b, ["blk", "lb"]).where(F.col("a.k") < F.col("b.k"))
    inter = F.size(F.array_intersect("a.g", "b.g")).cast("double")
    union = F.size(F.array_union("a.g", "b.g")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        cand.select(
            F.col("a.k").alias("key_a"),
            F.col("b.k").alias("key_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
