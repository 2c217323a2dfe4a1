

def test_recipe_perplexity_filter(spark):
    import numpy as np

    from ophidia_io_server_spark.pipeline.recipe import curate_corpus

    rng = np.random.default_rng(3)
    voc = ["the", "cat", "sat", "on", "mat", "dog", "ran", "fast", "big", "red"]
    # varied natural-ish docs score ppl ~12-14 under the self-trained
    # bigram model; the all-unique-token outlier hits the smoothed floor
    # on every bigram (ppl ~20)
    rows = [(i, " ".join(rng.choice(voc, size=30))) for i in range(30)]
    rows.append((97, " ".join(f"zz{rng.integers(1000)}" for _ in range(30))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    res = curate_corpus(
        docs, rule_filters=False, redact_pii=False,
        max_perplexity=16.0, report=True)
    kept = {r["doc_id"] for r in res.docs.collect()}
    assert 97 not in kept                      # outlier filtered
    assert len(kept) == 30                     # every normal doc survives
    assert "perplexity_filter" in res.funnel
    assert "perplexity" in res.docs.columns    # provenance column kept
