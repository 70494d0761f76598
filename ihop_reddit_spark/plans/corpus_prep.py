"""End-to-end training-data corpus preparation (the north-star composition).

What a 100 TB pretraining-data pipeline runs per shard, as ONE lazy Spark
plan over the ``documents`` table:

1. **Quality gate** — character-class ratios (JVM expressions, pushed to the
   scan's survivors; no Python).
2. **Language gate** — marker-argmax language ID.
3. **Exact dedup** — md5 fingerprint, keep the smallest doc_id per text.
4. **Near-dup collapse** — n-gram Jaccard pairs above a threshold among the
   survivors → connected components → keep each component's smallest id.
5. **Token budget** — whitespace + BPE-ish token counts on the final corpus.

Stage order is the cost order: each tier only sees the previous tier's
survivors (cheapest filters first, the quadratic-ish similarity join last —
the tiering contract from ``datapipe/dedup.py``). Every stage is
deterministic, so the WHOLE pipeline is DuckDB-oracle-gated end to end
(`corpus_prep_survivors` in the query catalog).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..datapipe.dedup import duplicate_components, ngram_jaccard_pairs
from ..functions import text as TX
from ..operators.joins import anti_join_filter


@dataclass
class CorpusPrepConfig:
    min_alpha_ratio: float = 0.55
    max_digit_ratio: float = 0.2
    min_tokens: int = 10
    keep_langs: tuple[str, ...] = ("en",)
    jaccard_threshold: float = 0.4
    shingle_n: int = 3


def prepare_corpus(
    docs: DataFrame,
    cfg: CorpusPrepConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Surviving documents with token budgets:
    ``(doc_id, n_tokens, bpe_tokens)``.
    """
    cfg = cfg or CorpusPrepConfig()
    text = F.col(text_col)
    feats = TX.quality_features(text)
    gated = docs.where(
        (feats["alpha_ratio"] >= cfg.min_alpha_ratio)
        & (feats["digit_ratio"] <= cfg.max_digit_ratio)
        & (feats["n_tokens"] >= cfg.min_tokens)
        & TX.predict_lang(text).isin(*cfg.keep_langs)
    )
    # exact dedup: keep the smallest id per fingerprint. `keepers` is one
    # row per DISTINCT TEXT — corpus-proportional, so no broadcast hint:
    # the semi-join shuffles on id (AQE may still pick broadcast when the
    # dedup ratio makes it genuinely small, but forcing it would abort at
    # the 8 GiB BroadcastExchange limit at 100 TB).
    keepers = gated.groupBy(TX.fingerprint(text).alias("__fp")).agg(
        F.min(id_col).alias(id_col)
    )
    # `exact` feeds both the similarity join (driver-actioned inside
    # duplicate_components) and the final survivor scan — persist it so the
    # scan + gates run once. MEMORY_AND_DISK: survivors of the gates are a
    # fraction of the corpus, and disk spill beats recompute here.
    exact = gated.join(keepers.select(id_col), id_col, "left_semi").persist()
    # near-dup collapse: pairs → components → drop every non-representative
    pairs = ngram_jaccard_pairs(
        exact, text_col, id_col, n=cfg.shingle_n, threshold=cfg.jaccard_threshold
    )
    components = duplicate_components(pairs)
    losers = components.where(F.col("doc_id") != F.col("component_id")).select(
        F.col("doc_id").alias(id_col)
    )
    # losers ∝ duplicate mass — corpus-proportional on boilerplate-heavy
    # corpora, so no forced broadcast (AQE decides)
    survivors = anti_join_filter(exact, losers, id_col, broadcast_remove=False)
    from ..caching import register_scoped_persists

    return register_scoped_persists(
        survivors.select(
            id_col,
            TX.token_count(text).cast("long").alias("n_tokens"),
            TX.approx_bpe_token_count(text).alias("bpe_tokens"),
        ),
        exact,
    )
