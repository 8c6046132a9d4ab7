"""SRP multiprobe regression tests (VERDICT r4 "what's wrong #1").

The r4 bug: ``srp_lsh_topk`` probed bkt0 plus all single-bit flips for ANY
``multiprobe_flips >= 1``, so flips=2 scored the identical candidate set as
flips=1 (BENCH_r04.json: recall 0.16 == 0.16). The fix generates XOR masks
for every bit-combination of size <= flips; these tests pin the probe-set
sizes (9 at flips=1, 37 at flips=2 for n_bits=8) and prove the knob now
widens the actual candidate set on real data.
"""

from __future__ import annotations

from math import comb

from game_library_enrichment_etl_spark.operators import ann as ANN


def test_probe_mask_counts_and_distinctness():
    for n_bits in (8, 12):
        for flips in (0, 1, 2, 3):
            masks = ANN.srp_probe_masks(n_bits, flips)
            expected = sum(comb(n_bits, r) for r in range(flips + 1))
            assert len(masks) == expected
            assert len(set(masks)) == expected  # no duplicate probes
            assert masks[0] == 0  # own bucket always probed first
            assert all(0 <= m < (1 << n_bits) for m in masks)
    # the exact numbers the verdict prescribed for n_bits=8
    assert len(ANN.srp_probe_masks(8, 1)) == 9
    assert len(ANN.srp_probe_masks(8, 2)) == 37


def test_probe_masks_cover_exact_hamming_ball():
    masks = set(ANN.srp_probe_masks(8, 2))
    assert masks == {m for m in range(256) if bin(m).count("1") <= 2}


def test_flips_clamped_to_n_bits():
    # flips > n_bits must not blow up; ball saturates at the full space
    assert len(ANN.srp_probe_masks(4, 99)) == 16


def test_candidate_set_widens_with_flips(spark):
    """With k = corpus size, srp_lsh_topk returns its whole scored candidate
    set, so flips=2 must be a strict superset of flips=1 on the synthetic
    embeddings (buckets at hamming distance exactly 2 exist there)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    qdf = emb.where("vec_id < 3")

    def pairs(flips):
        return {
            (r["query_id"], r["neighbor_id"])
            for r in ANN.srp_lsh_topk(
                emb, qdf, k=n, n_bits=8, dim=64,
                multiprobe_flips=flips, vectorized=True,
            ).collect()
        }

    p1, p2 = pairs(1), pairs(2)
    assert p1 <= p2
    assert len(p2) > len(p1)
