

def test_budget_batches_invariants(spark):
    """Batches are contiguous per group, never split a doc, overshoot
    by at most one doc, and zero-token docs consume no budget."""
    from cloud_native_medical_data_etl_pipeline_spark.operators.curate import (
        budget_batches,
    )

    rows = [
        (1, "a b c d e", "s1", 50),      # 5 tokens
        (2, "a b c", "s1", 40),          # 3
        (3, "a b c d", "s1", 30),        # 4
        (4, "", "s1", 20),               # 0 tokens
        (5, "x y", "s1", 10),            # 2
        (6, "q r s t u v w", "s2", 99),  # separate group
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, n_chars long")
    out = budget_batches(df, 6, order_col="n_chars", descending=True).collect()
    got = {r["doc_id"]: (r["batch_id"], r["n_tokens"]) for r in out}
    # s1 order by n_chars desc: 1(5),2(3),3(4),4(0),5(2); prefix sums 0,5,8,12,12
    assert got[1] == (0, 5)
    assert got[2] == (0, 3)   # prefix 5 < 6 -> batch 0 (overshoot allowed)
    assert got[3] == (1, 4)   # prefix 8 -> batch 1
    assert got[4] == (2, 0)   # prefix 12 -> batch 2, consumes nothing
    assert got[5] == (2, 2)   # prefix 12 -> batch 2
    assert got[6][0] == 0     # fresh group restarts at batch 0
    # batch ids are non-decreasing along the order within a group
    s1 = [got[i][0] for i in (1, 2, 3, 4, 5)]
    assert s1 == sorted(s1)


def test_pii_report_counts_sequentially(spark):
    """A phone inside a URL counts as URL (sequential redaction
    semantics) and per-class doc counts come out right."""
    from cloud_native_medical_data_etl_pipeline_spark.operators.quality import (
        pii_report,
    )

    rows = [
        (1, "visit https://x.io/555-123-4567 or mail a@b.co", "s1"),
        (2, "call 555-123-4567 now, id 123456789", "s1"),
        (3, "nothing sensitive here", "s2"),
        (4, None, "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r.asDict() for r in pii_report(df).collect()}
    s1 = got["s1"]
    assert s1["n_url"] == 1 and s1["docs_url"] == 1
    assert s1["n_email"] == 1
    # doc 1's phone is INSIDE the url -> swallowed by <URL>, not counted
    assert s1["n_phone"] == 1 and s1["docs_phone"] == 1
    assert s1["n_id"] == 1 and s1["docs_any_pii"] == 2 and s1["n_docs"] == 2
    s2 = got["s2"]
    assert s2["docs_any_pii"] == 0 and s2["n_docs"] == 2
