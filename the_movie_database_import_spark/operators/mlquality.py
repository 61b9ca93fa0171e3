"""Model-based quality filtering ([ext] training-data north star): the
GPT-3 / CCNet-style classifier stage — train a logistic-regression
document classifier whose POSITIVES are a curated seed corpus (WebText in
GPT-3's recipe; any trusted reference set here) and whose NEGATIVES are
raw crawl, then score every candidate document and keep it when its
quality probability beats a per-document Pareto draw (GPT-3 Appendix A:
``keep if score > 1 - pareto(alpha=9)``), which retains mostly-high-score
documents while letting a long tail of low-score ones through for
diversity.

This is the ML complement of the heuristic `functions.text.quality_metrics`
score: the heuristic is oracle-exact and cheap, the classifier LEARNS what
the seed distribution looks like. Both slot into the same curation
position (filter before dedup/split).

Spark-first design — everything JVM-side, no Python in any hot path:

- features: whitespace tokens → ``pyspark.ml.feature.HashingTF`` (hashed
  bag-of-words, in-row, no vocabulary state to ship — the standard
  trick that makes the featurizer stateless and cluster-trivial);
- training: ``pyspark.ml.classification.LogisticRegression`` — MLlib's
  distributed L-BFGS, coefficients aggregate via treeAggregate, scales
  with executors; the trained model is a coefficient vector BROADCAST to
  scoring tasks;
- scoring: ``model.transform`` — JVM transformers end-to-end;
- keep rule: deterministic Pareto-threshold via the md5-uniform
  inverse-CDF (``pareto = u^(-1/alpha) - 1``) on the doc id — the same
  engine-portable derandomization every sampling operator here uses
  (``operators/sampling.py``), so membership is reproducible across
  runs, clusters, and appends (GPT-3's ``np.random.pareto`` is not).

Correctness posture: L-BFGS is ITERATIVE — float accumulation order
varies with partitioning, so there is no cross-engine SQL oracle (the
registry entry is a rows-only driver check, like MinHash). The pinned
properties live in tests/test_extensions.py: separable corpora reach
AUC 1.0; refitting the same data reproduces coefficients; the seed
holdout mean probability strictly separates positive from negative; the
scoring plan contains no Python stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .sampling import HASH_SPACE

_TOKS = "_mlq_toks"
_RAW = "_mlq_features"
_LABEL = "_mlq_label"


def _featurize(docs: DataFrame, text_col: str, num_features: int) -> DataFrame:
    """Tokens → hashed bag-of-words, all in-row (stateless: no fitted
    vocabulary — the hash IS the feature index, so train and score agree
    with no dictionary to ship)."""
    from pyspark.ml.feature import HashingTF

    toked = docs.withColumn(_TOKS, F.split(F.col(text_col), " "))
    tf = HashingTF(inputCol=_TOKS, outputCol=_RAW, numFeatures=num_features)
    return tf.transform(toked)


def fit_quality_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    text_col: str = "text",
    num_features: int = 1 << 18,
    reg_param: float = 0.01,
    max_iter: int = 25,
):
    """Train the seed-vs-crawl classifier; returns the fitted
    ``LogisticRegressionModel`` (a broadcastable coefficient vector).

    Determinism: L-BFGS from a fixed zero init on a fixed dataset is
    reproducible run-to-run on the same partitioning (pinned in tests);
    across different partitionings coefficients can differ in late ulps —
    which moves probabilities, not the model's ranking quality, and is
    why no SQL oracle exists for this operator.

    Scale: both inputs stream through the stateless featurizer; MLlib's
    LR aggregates gradients tree-wise per iteration (shuffle ∝
    num_features per executor, not rows). ``num_features = 2^18`` keeps
    the coefficient vector at 2 MB — broadcast-trivial."""
    from pyspark.ml.classification import LogisticRegression

    if positives.sparkSession is not negatives.sparkSession:
        raise ValueError("positives and negatives must share a SparkSession")
    train = _featurize(
        positives.select(F.col(text_col)).withColumn(_LABEL, F.lit(1.0)).unionByName(
            negatives.select(F.col(text_col)).withColumn(_LABEL, F.lit(0.0))
        ),
        text_col,
        num_features,
    )
    lr = LogisticRegression(
        featuresCol=_RAW,
        labelCol=_LABEL,
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    )
    return _shed_training_summary(lr.fit(train))


def _shed_training_summary(model):
    """Return a summary-free copy of the fitted model via a save/load
    round-trip. The freshly fitted ``LogisticRegressionModel`` retains a
    ``trainingSummary`` that references the live SparkSession; when the
    model rides a task closure at scoring time, closure serialization
    walks that reference and dies on the session's non-serializable
    internals (``NotSerializableException: ObservationManager`` — it
    surfaces once anything in the process has used an ``Observation``,
    e.g. the exactly-once JDBC sink). A loaded model is coefficients +
    params only — exactly what scoring broadcasts. The temp copy is tiny
    (the 2 MB coefficient vector) and removed after load."""
    import shutil
    import tempfile
    import uuid

    from pyspark.ml.classification import LogisticRegressionModel

    path = f"{tempfile.gettempdir()}/mlq-lr-{uuid.uuid4().hex}"
    model.write().overwrite().save(path)
    try:
        return LogisticRegressionModel.load(path)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def score_quality(
    docs: DataFrame,
    model,
    text_col: str = "text",
    prob_col: str = "quality_prob",
) -> DataFrame:
    """Score documents with a fitted classifier: original columns +
    ``prob_col`` (probability the doc comes from the seed distribution).
    Pure JVM transformers; the model's coefficients broadcast."""
    from pyspark.ml.functions import vector_to_array

    num_features = model.numFeatures
    scored = model.transform(_featurize(docs, text_col, num_features))
    return scored.select(
        *docs.columns,
        vector_to_array(F.col(model.getProbabilityCol()))[1].alias(prob_col),
    )


def pareto_keep(
    prob: Column, key: Column, alpha: float = 9.0, salt: str = "mlq"
) -> Column:
    """GPT-3's stochastic keep rule, derandomized: keep a document when
    ``prob > 1 - pareto_draw`` where the Pareto(alpha) draw comes from the
    md5-uniform inverse CDF on the doc key (``u^(-1/alpha) - 1``) — high
    scores almost always keep, low scores keep with a heavy-tailed small
    probability, and membership is a pure function of (key, salt) so
    re-runs and appends reproduce it (the operators/sampling.py
    derandomization discipline; GPT-3 used np.random.pareto, which no
    re-run can reproduce)."""
    bucket = F.md5(F.concat(F.lit(salt), F.lit(":"), key.cast("string"))).substr(1, 8)
    u = (F.conv(bucket, 16, 10).cast("long") + F.lit(0.5)) / F.lit(float(HASH_SPACE))
    pareto = F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return prob > (F.lit(1.0) - pareto)


def filter_quality(
    docs: DataFrame,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 9.0,
) -> DataFrame:
    """Score + Pareto-keep in one step: the drop-in curation stage.
    Returns kept rows with ``quality_prob`` attached."""
    scored = score_quality(docs, model, text_col)
    return scored.filter(pareto_keep(F.col("quality_prob"), F.col(id_col), alpha))
