"""Deterministic sampling / corpus-split queries ([ext] north star,
training-data pipeline). Plans over operators/sampling.py.

Both queries are fully oracle-checked: the md5-hex-threshold predicate is
engine-portable (identical UTF-8 bytes hashed, identical lowercase-hex
compare), so DuckDB replays membership EXACTLY — not just in expectation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.sampling import (
    hex_threshold,
    split_case_sql,
    split_column,
    stratified_sample,
)
from ..sources.readers import load_table
from .registry import register

# Curation-style per-language keep rates: downsample the dominant language,
# keep most of the rare ones (the usual corpus-balancing move).
STRATIFIED_RATES = {"en": 0.25, "de": 0.8, "es": 0.8, "fr": 0.8, "zh": 0.8}

# Insertion order is the interval layout (see split_column docstring).
SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}

_RATE_CASE = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN '{hex_threshold(rate)}'"
    for lang, rate in sorted(STRATIFIED_RATES.items())
) + f" ELSE '{hex_threshold(0.0)}' END"


@register(
    "q_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < {_RATE_CASE}
    """,
    tags=("sampling", "ext"),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling by language (north star
    `sample_stratified`): keep 25% of the dominant 'en' stratum and 80% of
    each rare stratum, membership a pure function of doc_id.

    Scale shape: a single codegen'd filter (md5 + CASE of literals) fused
    into the parquet scan — zero shuffles, zero joins, and a re-run or a
    100 TB backfill reproduces the identical sample row-for-row."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, F.col("doc_id"), F.col("lang"), STRATIFIED_RATES
    ).select("doc_id", "lang", "source")


@register(
    "q_sample_split",
    oracle=f"""
    SELECT {split_case_sql("doc_id", SPLITS)} AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY 1, 2
    """,
    tags=("sampling", "ext"),
)
def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (north star `corpus_split`):
    80/10/10 by consecutive hash intervals, then the per-split-per-language
    census a curation report would publish.

    The interval layout means a later re-split that widens train can only
    relabel rows at the train/val boundary — no test row ever leaks into
    train. One map-side-combinable aggregation on a 15-value key; the
    assignment itself never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            split_column(F.col("doc_id"), SPLITS).alias("split"), "lang"
        )
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "q_sample_fixed_k",
    oracle="""
    SELECT doc_id, lang,
           CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
           ) AS BIGINT) AS _rk
    FROM documents
    QUALIFY _rk <= 25
    """,
    tags=("sampling", "ext"),
)
def q_sample_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 25 documents per language, deterministically (north star
    `sample_fixed_k`): the 25 smallest hash buckets win, so every run, SF,
    and engine picks the same rows — the eval-set / labeling-budget draw.
    One stratum-key shuffle + per-stratum sort; a dominant stratum at scale
    pre-thins with `hash_sample` first (see operator docstring)."""
    from ..operators.sampling import sample_fixed_k

    docs = load_table(spark, sf_dir, "documents")
    return sample_fixed_k(docs, F.col("doc_id"), F.col("lang"), 25).select(
        "doc_id", "lang", "_rk"
    )


@register(
    "q_split_leakage_safe",
    oracle=f"""
    WITH RECURSIVE tok AS (
        SELECT doc_id, source,
               unnest(list_distinct(string_split(text, ' '))) AS tok
        FROM documents
    ),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
        FROM tok a
        JOIN tok b ON a.tok = b.tok AND a.source = b.source AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    edges AS (
        SELECT doc_a, doc_b FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.8
    ),
    undirected AS (
        SELECT doc_a AS u, doc_b AS v FROM edges
        UNION ALL
        SELECT doc_b AS u, doc_a AS v FROM edges
    ),
    reach AS (
        SELECT doc_id AS node, doc_id AS r FROM documents
        UNION
        SELECT reach.node, undirected.v AS r
        FROM reach JOIN undirected ON undirected.u = reach.r
    ),
    clusters AS (SELECT node AS doc_id, MIN(r) AS cluster_rep FROM reach GROUP BY node)
    SELECT {split_case_sql("cluster_rep", SPLITS)} AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT cluster_rep) AS BIGINT) AS n_clusters
    FROM clusters
    GROUP BY 1
    """,
    tags=("sampling", "dedup", "ext"),
)
def q_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: assignment hashes the near-dup
    CLUSTER representative, not the document id, so near-duplicate documents
    can never straddle train and test (the published dedup-then-split
    hygiene rule — splitting before dedup leaks test content into training
    through surviving near-dups). Composition of two oracle-checked
    operators: connected components over the exact-Jaccard pair graph →
    `split_column` on the cluster rep; output is the per-split census of
    docs and clusters. Membership stays a pure function of (cluster_rep),
    so re-runs and backfills agree; the whole-cluster property holds BY
    CONSTRUCTION because every member shares the rep."""
    from ..operators.dedup import connected_components, jaccard_pairs_exact

    docs = load_table(spark, sf_dir, "documents")
    edges = jaccard_pairs_exact(docs, threshold=0.8)
    clusters = connected_components(docs.select("doc_id"), edges, node_col="doc_id")
    return (
        clusters.select(
            split_column(F.col("cluster_rep"), SPLITS).alias("split"), "cluster_rep"
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_rep").alias("n_clusters"),
        )
    )


# Target mixture for q_corpus_mix: rebalance toward the published-recipe
# shape (halve nothing outright, drop 'es' — a zero-weight domain is
# excluded from the mix by contract).
MIX_WEIGHTS = {"en": 0.5, "de": 0.2, "fr": 0.15, "zh": 0.15}


@register(
    "q_corpus_mix",
    oracle="""
    WITH counts AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
    ),
    w(lang, w) AS (VALUES ('de', 0.2), ('en', 0.5), ('fr', 0.15), ('zh', 0.15)),
    sized AS (SELECT counts.lang AS lang, n, w FROM counts JOIN w ON counts.lang = w.lang),
    tot AS (SELECT MIN(n / w) AS t FROM sized),
    rates0 AS (SELECT lang, w * t / n AS rate0 FROM sized, tot),
    rates AS (
        SELECT lang,
               CASE WHEN abs(rate0 - round(rate0)) < 1e-9
                    THEN round(rate0) ELSE rate0 END AS rate
        FROM rates0
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <
          CASE WHEN r.rate >= 1 THEN 'g'
               ELSE printf('%08x', CAST(floor(r.rate * 4294967296.0) AS BIGINT)) END
    """,
    tags=("sampling", "mixing", "ext"),
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixture sampling (north star `corpus_mix`): downsample per
    language so the output matches the target mixture {en .5, de .2,
    fr .15, zh .15} at the largest feasible total ('es' has weight zero
    and drops). The keep-rates are derived IN-PLAN from the per-group
    counts (one tiny aggregate + an unbounded min window); corpus rows are
    filtered scan-side by the same engine-portable md5 predicate the
    sampling module uses — membership is exact in both engines, not just
    in expectation, because floor(rate * 16^8) is computed from
    bit-identical doubles on both sides."""
    from ..operators.mixing import mix_corpus

    docs = load_table(spark, sf_dir, "documents")
    return mix_corpus(docs, MIX_WEIGHTS, group_col="lang").select("doc_id", "lang")


@register(
    "q_corpus_mix_temperature",
    oracle="""
    WITH counts AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
    ),
    w AS (SELECT lang, n, pow(CAST(n AS DOUBLE), 0.5) AS w FROM counts),
    m AS (SELECT MIN(n / w) AS t FROM w),
    r0 AS (SELECT lang, w * t / n AS rate0 FROM w, m),
    snapped AS (
        SELECT lang,
               CASE WHEN abs(rate0 - round(rate0)) < 1e-9
                    THEN round(rate0) ELSE rate0 END AS rate1
        FROM r0
    ),
    rates AS (
        SELECT lang, floor(rate1 * 1000000000.0) / 1000000000.0 AS rate
        FROM snapped
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <
          CASE WHEN r.rate >= 1 THEN 'g'
               ELSE printf('%08x', CAST(floor(r.rate * 4294967296.0) AS BIGINT)) END
    """,
    tags=("sampling", "mixing", "ext"),
)
def q_corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling (north star
    `mix_corpus_temperature`, r08): rebalance the corpus toward
    p_g ∝ n_g^0.5 — the mBERT/XLM-R alpha-sampling recipe, damping head
    languages and boosting the tail's share — with the weights derived
    IN-PLAN from the observed group sizes (no published dict needed,
    unlike q_corpus_mix). The smallest group binds and keeps everything;
    each larger group keeps (n_bind/n_g)^0.5. pow is a transcendental
    (ln/pow rule), so the derived rate is snapped and floor-quantized to
    the 1e-9 grid before the md5 threshold on BOTH engines; a realized-
    margin test pins every fixture rate far from grid boundaries, making
    a 1-ulp Math.pow/libm disagreement unable to flip any bucket."""
    from ..operators.mixing import mix_corpus_temperature

    docs = load_table(spark, sf_dir, "documents")
    return mix_corpus_temperature(docs, alpha=0.5, group_col="lang").select(
        "doc_id", "lang"
    )


def _token_budget_oracle() -> str:
    from ..functions.text import STOPWORDS

    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
    WITH base AS (
        SELECT doc_id, text,
               CAST(floor((
                 (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                    / len(string_split(text, ' '))) * 0.5
                 + (1 - CAST(len(list_filter(string_split(text, ' '),
                        x -> list_contains([{stops}], x))) AS DOUBLE)
                      / len(string_split(text, ' '))) * 0.3
                 + least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100, 1.0)
                     * 0.2
               ) * 1000000) AS BIGINT) AS quality_q,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id, text, quality_q, n_tokens
    FROM base
    QUALIFY SUM(n_tokens) OVER (ORDER BY quality_q DESC, doc_id
                                ROWS UNBOUNDED PRECEDING) <= 100000
    """


@register(
    "q_select_token_budget",
    oracle=_token_budget_oracle(),
    tags=("sampling", "mixing", "selection", "ext"),
)
def q_select_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection (north star `select_token_budget`,
    r08): keep the highest-quality documents while the running token total
    stays within a 100k-token budget — the 'fill the training budget with
    the best docs' primitive. The oracle is the naive doc-level greedy
    cumulative-sum window ordered (quality desc, doc_id); the engine
    computes the IDENTICAL selection without ever windowing doc rows
    globally: a bounded quantized-score census carries the prefix sums
    (single-partition window over <= grid+1 rows BY CONSTRUCTION), bucket
    decisions broadcast, full-keep buckets pass through window-free, and
    only the one boundary bucket pays a per-doc running sum. quality_q =
    floor(score * 1e6) on bit-identical IEEE doubles (no transcendentals),
    so the quantized ranks — and therefore the selected set — agree
    exactly across engines."""
    from ..operators.mixing import select_token_budget

    docs = load_table(spark, sf_dir, "documents")
    return select_token_budget(docs, 100_000)


@register(
    "q_shuffle_shards",
    oracle="""
    WITH h AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS digest FROM documents
    ),
    s AS (
        SELECT doc_id, digest,
               (('0x' || substr(digest, 1, 8))::BIGINT % 8) AS shard
        FROM h
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY digest, doc_id)
                AS BIGINT) AS pos
    FROM s
    """,
    tags=("sampling", "shuffle", "ext"),
)
def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into training shards (north star
    `shuffle_shards`): every document gets a shard (md5 mod 8, uniform)
    and a 1-based position within its shard in md5 order — the exact
    shape a sharded training-data write consumes. One hash shuffle + one
    per-shard sort; no global total order (cross-shard order is
    irrelevant to a shuffled epoch, and a global sort would add a range
    exchange + sampling pass at 100 TB). Reproducible: membership and
    order are pure functions of doc_id, so a backfill or a different
    cluster reproduces byte-identical shards."""
    from ..operators.mixing import shuffle_shards

    docs = load_table(spark, sf_dir, "documents")
    return shuffle_shards(docs, n_shards=8).select("doc_id", "shard", "pos")


@register(
    "q_corpus_mix_epochs",
    oracle="""
    WITH counts AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
    ),
    w(lang, w) AS (VALUES ('de', 0.4), ('en', 0.3), ('fr', 0.3)),
    sized AS (SELECT counts.lang AS lang, n, w FROM counts JOIN w ON counts.lang = w.lang),
    tot AS (SELECT MIN(n * 3.0 / w) AS t FROM sized),
    rates0 AS (SELECT lang, w * t / n AS rate0 FROM sized, tot),
    rates AS (
        SELECT lang,
               CASE WHEN abs(rate0 - round(rate0)) < 1e-9
                    THEN round(rate0) ELSE rate0 END AS rate
        FROM rates0
    ),
    emit AS (
        SELECT d.doc_id, d.lang,
               CAST(floor(r.rate) AS BIGINT)
                 + CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <
                        CASE WHEN r.rate - floor(r.rate) >= 1 THEN 'g'
                             ELSE printf('%08x', CAST(floor((r.rate - floor(r.rate))
                                      * 4294967296.0) AS BIGINT)) END
                        THEN 1 ELSE 0 END AS n_copies
        FROM documents d JOIN rates r ON d.lang = r.lang
    )
    SELECT doc_id, lang, e.epoch
    FROM emit, unnest(generate_series(1, n_copies)) AS e(epoch)
    """,
    tags=("sampling", "mixing", "ext"),
)
def q_corpus_mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-weighted mixture sampling (north star `mix_corpus_epochs`):
    scarce groups repeat up to 3 epochs to hit the target mixture
    {en .3, de .4, fr .3} — the published-recipe upsampling of scarce
    high-quality domains. Emission counts (full copies + one
    hash-fractional extra) are derived in-plan and replayed exactly by
    the oracle; the duplication is an in-row explode, never a shuffle."""
    from ..operators.mixing import mix_corpus_epochs

    docs = load_table(spark, sf_dir, "documents")
    return mix_corpus_epochs(
        docs, {"en": 0.3, "de": 0.4, "fr": 0.3}, max_epochs=3
    ).select("doc_id", "lang", "epoch")


@register(
    "q_training_order",
    oracle="""
    WITH counts AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
    ),
    w(lang, w) AS (VALUES ('de', 0.4), ('en', 0.3), ('fr', 0.3)),
    sized AS (SELECT counts.lang AS lang, n, w FROM counts JOIN w ON counts.lang = w.lang),
    tot AS (SELECT MIN(n * 3.0 / w) AS t FROM sized),
    rates0 AS (SELECT lang, w * t / n AS rate0 FROM sized, tot),
    rates AS (
        SELECT lang,
               CASE WHEN abs(rate0 - round(rate0)) < 1e-9
                    THEN round(rate0) ELSE rate0 END AS rate
        FROM rates0
    ),
    emit AS (
        SELECT d.doc_id, d.lang,
               CAST(floor(r.rate) AS BIGINT)
                 + CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <
                        CASE WHEN r.rate - floor(r.rate) >= 1 THEN 'g'
                             ELSE printf('%08x', CAST(floor((r.rate - floor(r.rate))
                                      * 4294967296.0) AS BIGINT)) END
                        THEN 1 ELSE 0 END AS n_copies
        FROM documents d JOIN rates r ON d.lang = r.lang
    ),
    mixed AS (
        SELECT doc_id, lang, e.epoch,
               md5(CAST(doc_id AS VARCHAR) || ':' || CAST(e.epoch AS VARCHAR))
                 AS digest
        FROM emit, unnest(generate_series(1, n_copies)) AS e(epoch)
    ),
    sharded AS (
        SELECT doc_id, lang, epoch,
               (('0x' || substr(digest, 1, 8))::BIGINT % 8) AS shard, digest
        FROM mixed
    )
    SELECT doc_id, lang, epoch, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY digest,
                    CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR))
                AS BIGINT) AS pos
    FROM sharded
    """,
    tags=("sampling", "mixing", "shuffle", "ext", "composite"),
)
def q_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prepare-training-run composite (north star `training_order`):
    epoch-weighted mixture ({en .3, de .4, fr .3}, scarce groups repeated
    up to 3 epochs) shuffled into 8 reproducible shards — the two final
    pipeline stages composed into one plan. The shard key hashes
    (doc_id, epoch) so a document's epochs SPREAD across shards instead
    of sitting adjacent, and the within-shard order has no equal-key ties
    (a bare doc_id key would leave row_number's assignment among epoch
    copies nondeterministic). In-row explode duplication + one hash
    shuffle + per-shard sort; the oracle replays every stage from the
    same fragments."""
    from ..operators.mixing import mix_corpus_epochs, shuffle_shards

    docs = load_table(spark, sf_dir, "documents")
    mixed = mix_corpus_epochs(
        docs, {"en": 0.3, "de": 0.4, "fr": 0.3}, max_epochs=3
    ).select("doc_id", "lang", "epoch")
    key = F.concat(
        F.col("doc_id").cast("string"), F.lit(":"), F.col("epoch").cast("string")
    )
    return shuffle_shards(mixed, n_shards=8, key=key).select(
        "doc_id", "lang", "epoch", "shard", "pos"
    )


@register(
    "q_sample_weighted_k",
    oracle="""
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
           CAST(floor(1e9 * pow(
               (('0x' || substr(md5('wk:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 + 0.5) / 4294967296.0,
               1.0 / n_chars)) AS BIGINT) AS wkey_q
    FROM documents
    WHERE n_chars > 0
    ORDER BY wkey_q DESC, doc_id
    LIMIT 50
    """,
    tags=("sampling", "ext"),
)
def q_sample_weighted_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted top-k sample without replacement (north star
    `sample_weighted_k`, Efraimidis–Spirakis A-ES): 50 documents drawn
    with probability proportional to length — the weighted counterpart of
    the fixed-k eval draw, for curation passes that bias toward long or
    high-quality docs. Deterministic in (salt, doc_id), so re-runs and
    backfills agree; the ranking key is grid-quantized (pow is the one
    primitive without a cross-engine bit guarantee — see
    operators/sampling.weighted_sample_key) and runs as
    TakeOrderedAndProject on a scan-side expression."""
    from ..operators.sampling import sample_weighted_k

    docs = load_table(spark, sf_dir, "documents")
    return sample_weighted_k(
        docs.select("doc_id", F.col("n_chars").alias("weight")),
        50,
        F.col("weight"),
        F.col("doc_id"),
    ).select("doc_id", "weight", "wkey_q")


@register(
    "q_sample_weighted_per_source",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
               CAST(floor(1e9 * pow(
                   (('0x' || substr(md5('wg:' || CAST(doc_id AS VARCHAR)),
                                    1, 8))::BIGINT + 0.5) / 4294967296.0,
                   1.0 / n_chars)) AS BIGINT) AS wkq
        FROM documents WHERE n_chars > 0
    ),
    ranked AS (
        SELECT doc_id, source, weight,
               CAST(ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY wkq DESC, doc_id) AS INTEGER) AS sample_rank
        FROM keyed
    )
    SELECT doc_id, source, weight, sample_rank
    FROM ranked WHERE sample_rank <= 5
    """,
    tags=("sampling", "ext"),
)
def q_sample_weighted_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted top-5 sample (north star
    `sample_weighted_k_per_group`, stratified Efraimidis–Spirakis):
    five length-biased exemplar documents from EVERY source — the
    stratified draw a mixture builder needs, where the global weighted
    sample would let one heavy domain swallow the budget. Deterministic
    in (salt, doc_id); the A-ES key is scan-side and the only exchange
    is the per-source rank window."""
    from ..operators.sampling import sample_weighted_k_per_group

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("bigint").alias("weight")
    )
    return sample_weighted_k_per_group(
        docs, 5, F.col("weight"), F.col("doc_id"), "source"
    )
