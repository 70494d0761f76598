"""Composed crawl-extraction flagship: raw HTML pages → staged training
chunks (the WET-stage pipeline of a web-crawl corpus, VERDICT r5 item 4).

One plan composing the round-5 crawl tier end-to-end, the way
``plans/corpus_prep.py`` composes the quality tier and
``modern_training_corpus`` composes winnow+semantic+DSIR+packing:

1. **extract** — ``html_to_text`` + ``link_density`` (pure JVM regex
   projection, zero shuffle, fuses into the scan);
2. **boilerplate gate** — drop link-farm pages (density > threshold);
3. **URL canonicalization + frontier dedup** — ``normalize_url``, keep
   the min-id row per canonical URL (mirror/tracking-param collapse);
4. **domain quota** — content-addressed cap per registrable domain
   (``domain_quota_sample``);
5. **C4 line/page cleaning** — ``c4_clean`` on the extracted text;
6. **content-defined chunking** — ``cdc_chunks`` (edit-robust
   boundaries for downstream chunk-grain dedup);
7. **curriculum staging** — exact equal-mass quality quantiles over
   chunk length (``curriculum_stages``).

Scale shape (100 TB): stages 1–2 are scan projections; stage 3 is one
skew-safe map-side-partial aggregate + an id join (never a window over
a viral URL's occurrence list); stage 4 is the quota window (salted
variant available); stage 5 adds no shuffle; stage 6 is the winnowing-
tier token shuffle; stage 7 is a support-bounded histogram + broadcast
boundaries. The chunk table is the one multi-consumer boundary (the
quantile histogram and the final assignment both read it) — persisted,
so the upstream chain runs ONCE (the modern_training_corpus persist
rule; verified by the plan audit in PERFORMANCE.md).

Reference parity: the reference has no crawl stage at all (it ingests
Reddit dumps, ihop/import_data.py); this plan belongs to the
training-data-pipeline tier the brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import register_scoped_persists
from ..datapipe.cleaning import c4_clean
from ..datapipe.curation import cdc_chunks, curriculum_stages, domain_quota_sample
from ..functions.text import html_to_text, link_density
from ..functions.urls import normalize_url


def crawl_corpus(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    id_col: str = "doc_id",
    *,
    max_link_density: float = 0.09,
    domain_quota: int = 3,
    quota_salt: str = "cc1",
    min_words_per_line: int = 3,
    min_lines: int = 3,
    chunk_k: int = 3,
    chunk_nibbles: int = 1,
    n_stages: int = 4,
    exact_urls: bool = False,
) -> DataFrame:
    """(id, html, url) pages → (id, chunk_id, stage, chunk_text,
    n_chunk_tokens) staged training chunks. See module docstring for the
    stage-by-stage plan.

    ``exact_urls=True`` canonicalizes the frontier with the urllib-exact
    twin (``functions.urls.normalize_url_exact`` — punycode hosts,
    percent-encoding normalization): the DOCUMENTED DEFAULT for any
    non-ASCII corpus — real crawls hit mixed-encoding aliases of one
    page daily, and the Catalyst path cannot punycode, so it misses
    those frontier duplicates. The boolean default stays JVM-side only
    because it is identical on ASCII escape-free URLs and anchors the
    cross-engine oracle (both paths hash-pinned, with planted IDN and
    percent-encoded variants, by ``normalized_url_groups``)."""
    from ..functions.urls import normalize_url_exact

    from ..operators.partitioning import fan_out_if_narrow

    canon = normalize_url_exact if exact_urls else normalize_url
    did = F.col(id_col)
    # the regex extraction chain (html_to_text + link_density) is the
    # plan's per-row-heaviest stage and runs at scan parallelism — rescue
    # an under-parallel scan before it (no-op on real many-split crawls)
    pages = fan_out_if_narrow(pages, id_col)
    ext = pages.select(
        did,
        html_to_text(F.col(html_col)).alias("clean_text"),
        link_density(F.col(html_col)).alias("link_density"),
        canon(F.col(url_col)).alias("canonical_url"),
    )
    # multi-consumer boundary #1: the frontier dedup below self-joins the
    # gated frame (min-id aggregate + row recovery) — persist it or the
    # whole regex extract chain runs twice
    gated = ext.where(F.col("link_density") <= max_link_density).persist()
    # frontier dedup: keep the min-id ROW per canonical URL. groupBy(min)
    # partial-aggregates map-side, so a viral URL's occurrence list
    # combines before the shuffle (never a one-task window sort), and
    # the join back is AQE-skew-splittable.
    first_ids = gated.groupBy("canonical_url").agg(F.min(did).alias(id_col))
    survivors = gated.join(first_ids, ["canonical_url", id_col])
    quota = domain_quota_sample(
        survivors, "canonical_url", quota=domain_quota, salt=quota_salt
    )
    cleaned = c4_clean(
        quota,
        "clean_text",
        id_col,
        min_words_per_line=min_words_per_line,
        min_lines=min_lines,
    )
    # multi-consumer boundary #2: the staging quantile histogram AND the
    # final assignment both consume the chunk table — persist it or the
    # whole clean→chunk chain reruns once per consumer
    chunks = cdc_chunks(
        cleaned, "cleaned_text", id_col, k=chunk_k, nibbles=chunk_nibbles
    ).persist()
    staged = curriculum_stages(
        chunks,
        F.col("n_chunk_tokens").cast("double"),
        id_col,
        n_stages=n_stages,
        quantize=1,
    )
    out = staged.select(
        id_col, "chunk_id", "stage", "chunk_text", "n_chunk_tokens"
    )
    return register_scoped_persists(out, gated, chunks)
