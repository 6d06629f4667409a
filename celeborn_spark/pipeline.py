"""CorpusPipeline: the user-facing fluent builder over the curation
operator surface — the "switch from the reference" entry point that
chains language/quality filtering, exact + near dedup, eval-set
decontamination, mixture sampling and shard packing without the user
touching the individual operator modules.

Every step is LAZY (returns a new pipeline wrapping a transformed
DataFrame; nothing executes until an action), so Catalyst fuses the
map-side steps into one codegen'd stage and the only exchanges are the
ones the operators themselves need (dedup groupBy, LSH band bucket,
packing window). The composition mirrors q_corpus_clean_pipeline
(queries/text.py) but exposes each stage as a method with the
scale-relevant knobs surfaced (max_shingle_freq, broadcast eval side).

    from celeborn_spark.pipeline import CorpusPipeline

    shards = (
        CorpusPipeline(docs)
        .filter_lang("en")
        .filter_quality(0.3)
        .dedup_exact()
        .dedup_near(threshold=0.8, max_shingle_freq=1000)
        .decontaminate(eval_docs)
        .sample_mixture({"en": 1.0}, budget_frac=0.5)
        .pack_shards(budget=2048)
    )
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from celeborn_spark.operators import curriculum as _curriculum
from celeborn_spark.operators import dedup as _dedup
from celeborn_spark.operators import packing as _packing
from celeborn_spark.operators import textops as _textops


class CorpusPipeline:
    def __init__(self, df: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
        self._df = df
        self._id = id_col
        self._text = text_col

    @property
    def df(self) -> DataFrame:
        """The current (lazy) DataFrame; call an action to execute."""
        return self._df

    def _with(self, df: DataFrame) -> CorpusPipeline:
        return CorpusPipeline(df, self._id, self._text)

    # -- filtering ---------------------------------------------------------

    def filter_lang(self, *langs: str) -> CorpusPipeline:
        """Keep docs the n-gram heuristic classifies into `langs`
        (codegen'd map stage, no shuffle)."""
        return self._with(self._df.filter(_textops.lang_id(self._text).isin(*langs)))

    def filter_quality(self, min_score: float) -> CorpusPipeline:
        """Keep docs scoring at least `min_score` (C4/Gopher-style
        rule-based quality; map stage, no shuffle)."""
        return self._with(
            self._df.filter(_textops.quality_score(self._text) >= min_score)
        )

    # -- dedup -------------------------------------------------------------

    def dedup_exact(self) -> CorpusPipeline:
        """Keep one min-id representative per exact content hash (one
        hash-keyed exchange with map-side partials)."""
        keep = _dedup.exact_dedup(self._df, self._text, self._id).select(self._id)
        return self._with(self._df.join(keep, self._id, "left_semi"))

    def dedup_near(
        self,
        threshold: float = 0.8,
        max_shingle_freq: int | None = None,
        **lsh_kwargs,
    ) -> CorpusPipeline:
        """Greedy near-dup removal: LSH candidates verified by exact
        Jaccard; of each similar pair the higher id is dropped (the
        standard keep-first approximation of clique collapse). Set
        `max_shingle_freq` at scale to cap hot-shingle joins."""
        pairs = _dedup.verified_lsh_dedup(
            self._df,
            self._id,
            self._text,
            threshold=threshold,
            max_shingle_freq=max_shingle_freq,
            **lsh_kwargs,
        )
        losers = pairs.select(F.col("id_b").alias(self._id)).distinct()
        return self._with(self._df.join(losers, self._id, "left_anti"))

    def decontaminate(self, eval_set: DataFrame, n: int = 5) -> CorpusPipeline:
        """Drop docs sharing any n-gram with the (broadcast-small) eval
        set — the corpus side never shuffles."""
        hits = _dedup.ngram_decontaminate(
            self._df, eval_set, self._id, self._text, n
        ).select(self._id)
        return self._with(self._df.join(hits, self._id, "left_anti"))

    # -- mixing / layout ---------------------------------------------------

    def sample_mixture(
        self,
        targets: dict[str, float],
        budget_frac: float,
        stratum_col: str = "lang",
        weight_col: str | None = None,
    ) -> CorpusPipeline:
        """Deterministically rebalance strata to `targets` within a
        token budget (operators/curriculum.py mixture_sample). Uses
        token counts computed from the text when no weight column is
        given."""
        df = self._df
        weight = weight_col
        if weight is None:
            weight = "_pipeline_tokens"
            df = df.withColumn(weight, _textops.token_count(self._text))
        out = _curriculum.mixture_sample(
            df, stratum_col, self._id, weight, targets, budget_frac
        )
        return self._with(out.drop("rate", "_pipeline_tokens"))

    def plan_mixture(
        self, budget: int, group_col: str = "lang"
    ) -> DataFrame:
        """Diagnostic (non-transforming) step: the waterfill allocation
        plan for `budget` docs targeting equal group shares
        (operators/curriculum.py mixture_waterfill) — inspect what
        sample_mixture WILL do before spending compute on it. Returns
        the (group, n_docs, alloc, fill_rate) plan DataFrame."""
        return _curriculum.mixture_waterfill(self._df, group_col, budget)

    def pack_shards(self, budget: int, stream_col: str = "lang") -> DataFrame:
        """Terminal step: token-budget shard layout per stream
        (operators/packing.py). Returns the (stream, id, n_tokens,
        shard_id) layout DataFrame."""
        return _packing.greedy_token_shards(
            self._df, stream_col, self._id, self._text, budget
        )
