"""Natural ordering of WAL segment paths (ADVICE r1: lexicographic sort
applied seg-10 before seg-2, silently corrupting order-sensitive folds)."""

from game_library_enrichment_etl_spark.streaming.runner import _natural_key


def test_natural_key_orders_numerically():
    paths = [f"/w/seg-{i}.parquet" for i in (10, 2, 1, 30, 3)]
    got = sorted(paths, key=_natural_key)
    assert got == [f"/w/seg-{i}.parquet" for i in (1, 2, 3, 10, 30)]


def test_natural_key_mixed_and_padded():
    paths = ["/w/seg-00010.parquet", "/w/seg-2.parquet", "/w/seg-00001.parquet"]
    got = [p.split("seg-")[1] for p in sorted(paths, key=_natural_key)]
    assert got == ["00001.parquet", "2.parquet", "00010.parquet"]
    # non-numeric names fall back to stable name ordering, no crash
    assert sorted(["/w/b.parquet", "/w/a.parquet"], key=_natural_key) == [
        "/w/a.parquet", "/w/b.parquet"
    ]
