"""Persisted-index reader contract (r14 verdict task 5): every index
the package writes to disk must read back with EXACTLY its declared
column dtypes — executable insurance against the partition-value
type-inference bug class the term index hit in r14 (Spark parsed
md5-hex bucket directories like '8f' as Java doubles via
Double.parseDouble's float suffix, silently corrupting the bucket
column whenever every observed partition value happened to look
numeric).  A future hex-, mixed-, or overflow-typed partition column
in any of these layouts fails here instead of in production."""

import pytest

from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _vecs(spark, n=24, dim=8):
    rows = [
        (i, [float((i * 7 + j * 3) % 11) / 10.0 for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


# the adversarial corpus from the r14 regression: every md5 term
# bucket of these two texts parses as a Java double ('8f' -> 8.0),
# the exact trigger for inference corruption on the term index
_HEX_TRAP_TEXTS = ["people will", "people can"]


def _dtypes(df):
    return [(f.name, f.dataType.simpleString()) for f in df.schema.fields]


def _build_term(spark, tmp):
    from cloud_native_medical_data_etl_pipeline_spark.operators import ranking

    path = f"{tmp}/term_idx"
    ranking.build_term_index(_docs(spark, _HEX_TRAP_TEXTS), path)
    return ranking.read_term_index(spark, path), [
        ("term", "string"),
        ("doc", "bigint"),
        ("dl", "double"),
        ("tf", "bigint"),
        ("bucket", "string"),
    ]


def _build_ivf(spark, tmp):
    from cloud_native_medical_data_etl_pipeline_spark.operators import similarity

    path = f"{tmp}/ivf_idx"
    similarity.build_ivf_index(_vecs(spark), path, num_cells=4)
    return spark.read.parquet(path), [
        ("vec_id", "bigint"),
        ("embedding", "array<double>"),
        ("cell_id", "int"),
    ]


def _build_ivfpq(spark, tmp):
    from cloud_native_medical_data_etl_pipeline_spark.operators import quantize

    path = f"{tmp}/ivfpq_idx"
    quantize.build_ivfpq_index(
        _vecs(spark), path, num_cells=4, m=2, k=4, pq_iters=2
    )
    return spark.read.parquet(path), [
        ("key", "bigint"),
        ("pq_code", "array<int>"),
        ("cell_id", "int"),
    ]


def _build_signatures(spark, tmp):
    from cloud_native_medical_data_etl_pipeline_spark.operators import dedup

    path = f"{tmp}/sigs"
    texts = ["a b c d e", "a b c d f", "x y z w v"]
    dedup.minhash_base(_docs(spark, texts)).write.mode(
        "overwrite"
    ).parquet(path)
    return spark.read.parquet(path), [
        ("k", "bigint"),
        ("sh", "array<string>"),
    ] + [(f"mh{i}", "string") for i in range(8)]


_BUILDERS = {
    "term_index": _build_term,
    "ivf_index": _build_ivf,
    "ivfpq_index": _build_ivfpq,
    "signature_store": _build_signatures,
}


@pytest.mark.parametrize("kind", sorted(_BUILDERS))
def test_persisted_index_reads_back_with_declared_dtypes(
    spark, tmp_path, kind
):
    df, expected = _BUILDERS[kind](spark, str(tmp_path))
    got = _dtypes(df)
    # order-insensitive on column position but exact on (name, dtype):
    # partition columns land last in Spark's read schema
    assert sorted(got) == sorted(expected), (kind, got, expected)
    # and the frame must actually be readable (not just schema-visible)
    assert df.count() > 0


def test_term_index_values_survive_hex_trap_buckets(spark, tmp_path):
    """Beyond dtypes: the bucket VALUES must round-trip verbatim on
    the all-numeric-looking bucket corpus (the r14 corruption showed
    dtype-correct but value-corrupted reads are impossible once the
    schema is declared — pin it anyway)."""
    from cloud_native_medical_data_etl_pipeline_spark.operators import ranking

    path = f"{tmp_path}/term_idx"
    ranking.build_term_index(_docs(spark, _HEX_TRAP_TEXTS), path)
    got = ranking.read_term_index(spark, path)
    buckets = {r["bucket"] for r in got.select("bucket").distinct().collect()}
    import hashlib

    want = {
        hashlib.md5(t.encode()).hexdigest()[:2]
        for text in _HEX_TRAP_TEXTS
        for t in text.split()
    }
    assert buckets == want


def test_build_term_index_refuses_non_integral_key(spark, tmp_path):
    """ADVICE r14: TERM_INDEX_SCHEMA declares `doc long`, so an index
    built from a string key would read back corrupted — the builder
    must refuse up front."""
    from cloud_native_medical_data_etl_pipeline_spark.operators import ranking

    df = spark.createDataFrame(
        [("a", "hello world")], "doc_id string, text string"
    )
    with pytest.raises(ValueError, match="integral"):
        ranking.build_term_index(df, f"{tmp_path}/bad_idx")
    # integral-but-not-long keys are fine (cast to long on write)
    df2 = spark.createDataFrame(
        [(1, "hello world")], "doc_id int, text string"
    )
    ranking.build_term_index(df2, f"{tmp_path}/ok_idx")
    got = ranking.read_term_index(spark, f"{tmp_path}/ok_idx")
    assert got.where(F.col("doc") == 1).count() == 2
