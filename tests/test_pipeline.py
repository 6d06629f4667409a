"""CorpusPipeline end-to-end: each stage drops exactly what it should,
composition stays lazy, and the packed output covers the survivors."""

from __future__ import annotations

from pyspark.sql import functions as F

from celeborn_spark.pipeline import CorpusPipeline

GOOD = (
    "the cat sat on the mat and then the dog sat on it too "
    "while the bird watched from a tree in the garden outside"
)


def _corpus(spark):
    rows = [
        (1, GOOD, "en"),
        (2, GOOD, "en"),                     # exact dup of 1
        (3, GOOD + " extra tail words here", "en"),  # near dup of 1
        (4, "zzz qqq xxx", "xx"),            # fails lang + quality
        (5, "the secret eval answer is forty two exactly", "en"),  # contaminated
        (6, "a completely different clean document about the weather "
            "and the seasons of the year in the northern hemisphere", "en"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_pipeline_stages_compose(spark):
    docs = _corpus(spark)
    eval_set = spark.createDataFrame(
        [(100, "the secret eval answer is forty two")], ["doc_id", "text"]
    )
    p = (
        CorpusPipeline(docs)
        .filter_lang("en")
        .filter_quality(0.2)
        .dedup_exact()
        .dedup_near(threshold=0.5)
        .decontaminate(eval_set)
    )
    kept = {r.doc_id for r in p.df.select("doc_id").collect()}
    # 2 exact-dupped, 3 near-dupped, 4 filtered, 5 decontaminated
    assert kept == {1, 6}, kept

    shards = p.pack_shards(budget=1000, stream_col="lang")
    assert {r.doc_id for r in shards.collect()} == kept
    assert shards.filter(F.col("shard_id") < 0).count() == 0


def test_pipeline_is_lazy(spark):
    docs = _corpus(spark)
    p = CorpusPipeline(docs).filter_lang("en").filter_quality(0.2).dedup_exact()
    # no action has run; the plan must still be buildable and lazy
    assert p.df.schema is not None
    assert "doc_id" in p.df.columns


def test_pipeline_mixture_uses_token_weights(spark):
    docs = _corpus(spark)
    out = CorpusPipeline(docs).sample_mixture({"en": 1.0}, budget_frac=1.0).df
    # rate caps at 1.0 for 'en' -> every en doc kept, xx dropped
    assert {r.doc_id for r in out.select("doc_id").collect()} == {1, 2, 3, 5, 6}
    assert "_pipeline_tokens" not in out.columns and "rate" not in out.columns


def test_pipeline_plan_mixture_is_diagnostic(spark):
    from celeborn_spark.pipeline import CorpusPipeline

    df = spark.createDataFrame(
        [(i, "a b c d", "en" if i % 2 else "zh") for i in range(10)],
        ["doc_id", "text", "lang"],
    )
    plan = CorpusPipeline(df).plan_mixture(budget=6)
    rows = {r["group"]: r for r in plan.collect()}
    assert set(rows) == {"en", "zh"}
    assert sum(r["alloc"] for r in rows.values()) == 6
    # the pipeline itself is untouched (diagnostic, not a transform)
    assert CorpusPipeline(df).plan_mixture(budget=6).count() == 2
