"""Text-analysis functions for the training-data pipeline surface
([ext], north star): tokenization, language-ID scoring, quality metrics,
token counting, and document fingerprinting.

Everything here is pure built-in JVM expression work (no Python UDFs) so it
whole-stage-codegens and scales linearly with the scan. Each function has an
ANSI-SQL twin used by the DuckDB oracles in plans/extensions.py; outputs are
exact integers or raw double quotients of identical integers (hash-safe, see
plans/relational.py float policy).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Marker-word lists for the language-ID heuristic. The documents fixture is
# synthetic word soup over a shared vocabulary, so these are config, not
# linguistics — a production deployment swaps in real per-language stopword
# lists; the argmax machinery is identical.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("batch", "merge", "window", "row"),
    "en": ("the", "a", "fast", "data"),
    "es": ("table", "join", "query", "scan"),
    "fr": ("stream", "filter", "sort", "agg"),
    "zh": ("vector", "hash", "spark", "key"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "and", "of", "to", "in")

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31
FINGERPRINT_PREFIX = 64


def tokens(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(text, " ")


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def word_shingles(text: Column, n: int) -> Column:
    """Distinct word n-gram shingles: every run of ``n`` consecutive tokens
    joined with a space. Documents shorter than ``n`` tokens produce an
    EMPTY array (the `when` guard matters: `sequence(0, negative)` would
    generate a descending sequence, not an empty one). All-builtin —
    sequence + slice + array_join whole-stage-codegen; no explode until the
    consumer asks for one.

    The token array is bound ONCE as a lambda variable
    (``transform(array(split(text)), toks -> ...)``): non-lambda
    subexpressions inside a higher-order-function lambda re-evaluate PER
    ELEMENT, so referencing ``split(text)`` directly in the per-position
    lambda would re-split the whole document for every shingle start —
    O(L^2) characters per doc (the r08 span-dedup finding,
    operators/dedup.span_gram_digests)."""

    def _shingles(toks: Column) -> Column:
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.array_distinct(
        F.element_at(F.transform(F.array(tokens(text)), _shingles), 1)
    )


def canonical_token_text(text: Column) -> Column:
    """Order-insensitive canonical form: sorted distinct tokens re-joined.
    Two permuted/duplicated-word documents canonicalize identically — the
    exact-dedup key for set-equivalent near-duplicates."""
    return F.array_join(F.sort_array(distinct_tokens(text)), " ")


def lang_score(text: Column, lang: str) -> Column:
    """Marker-hit score: occurrences (not distinct) of the language's marker
    words."""
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(markers, t))).cast(
        "bigint"
    )


def langid(text: Column) -> Column:
    """Argmax of marker scores with a fixed priority order for ties
    (alphabetical, mirrored exactly in the SQL oracle)."""
    langs = sorted(LANG_MARKERS)
    scores = {lang: lang_score(text, lang) for lang in langs}
    expr = None
    for i, lang in enumerate(langs):
        cond = None
        for other in langs[i + 1 :]:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        branch = F.lit(lang)
        if cond is None:
            expr = expr.otherwise(branch) if expr is not None else branch
        else:
            expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    return expr


def langid_oracle_sql(text_sql: str = "text") -> str:
    """The DuckDB twin of :func:`langid` over the same marker lists."""
    langs = sorted(LANG_MARKERS)

    def score(lang: str) -> str:
        lits = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        return (
            f"len(list_filter(string_split({text_sql}, ' '), "
            f"t -> list_contains([{lits}], t)))"
        )

    aliases = ",\n        ".join(f"{score(lg)} AS s_{lg}" for lg in langs)
    branches = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} >= s_{other}" for other in langs[i + 1 :]]
        if conds:
            branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
        else:
            branches.append(f"ELSE '{lang}'")
    case = "CASE " + " ".join(branches) + " END"
    return aliases, case


def quality_metrics(text: Column) -> dict[str, Column]:
    """Deterministic quality features: token counts, type-token ratio,
    average token length, stopword ratio, and a blended score."""
    toks = tokens(text)
    n_tokens = F.size(toks).cast("bigint")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    n_alpha_chars = F.length(F.replace(text, F.lit(" "), F.lit(""))).cast("bigint")
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t))).cast("bigint")
    ttr = n_distinct / n_tokens
    avg_token_len = n_alpha_chars / n_tokens
    stop_ratio = n_stop / n_tokens
    score = ttr * 0.5 + (1 - stop_ratio) * 0.3 + F.least(n_tokens / 100, F.lit(1.0)) * 0.2
    return {
        "n_tokens": n_tokens,
        "n_distinct": n_distinct,
        "ttr": ttr,
        "avg_token_len": avg_token_len,
        "stop_ratio": stop_ratio,
        "quality_score": score,
    }


# Gopher-rules defaults (Rae et al. 2021 §A1.1, the public heuristic-filter
# recipe every LLM-corpus pipeline re-implements). Thresholds are config —
# these defaults are tuned so the synthetic fixture splits non-trivially
# (each rule both keeps and drops real rows at sf0.01).
GOPHER_DEFAULTS: dict[str, float] = {
    "min_tokens": 20,
    "max_tokens": 90,
    "min_word_len": 3.0,
    "max_word_len": 5.0,
    "min_alpha_frac": 0.80,
    "min_stop_hits": 2,
    "max_symbol_ratio": 0.10,
    "min_distinct_bigram_ratio": 0.50,
}

_GOPHER_SYMBOL_RE = r"#|\.\.\."

# (rule name, threshold keys) in FIRST-FAIL priority order — the order is
# part of the contract (fail_reason reports the first violated rule) and is
# mirrored verbatim by gopher_rules_oracle_sql.
GOPHER_RULE_ORDER: tuple[str, ...] = (
    "n_tokens",
    "word_len",
    "alpha",
    "stopwords",
    "symbols",
    "repetition",
)


def gopher_rules(
    text: Column, thresholds: dict[str, float] | None = None
) -> dict[str, Column]:
    """Gopher-style composite quality filter (Rae et al. 2021; the
    RefinedWeb/Dolma heuristic stage): six per-document rules — token-count
    bounds, mean-word-length bounds, alphabetic-word fraction, stop-word
    floor, symbol ratio (# / ellipsis), and a duplicate-bigram ceiling
    (distinct/total bigram ratio, the in-row stand-in for Gopher's
    duplicate-n-gram family). Returns the per-rule features, per-rule pass
    flags, the conjunctive ``keep``, and ``fail_reason`` = first violated
    rule in :data:`GOPHER_RULE_ORDER` (NULL when kept).

    Everything is a single-pass in-row expression (token array bound once,
    array ops + one regexp count) — whole-stage codegen, zero shuffles, so
    the filter runs at scan speed on any corpus size. Every feature is an
    exact integer or a quotient of exact integers, so the DuckDB oracle
    (:func:`gopher_rules_oracle_sql`) is hash-exact."""
    th = {**GOPHER_DEFAULTS, **(thresholds or {})}
    toks = tokens(text)
    n_tokens = F.size(toks).cast("bigint")
    n_chars = F.length(F.replace(text, F.lit(" "), F.lit(""))).cast("bigint")
    mean_word_len = n_chars / n_tokens
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("bigint")
    alpha_frac = n_alpha / n_tokens
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stops, t))).cast(
        "bigint"
    )
    n_symbols = F.size(F.regexp_extract_all(text, F.lit(_GOPHER_SYMBOL_RE), 0)).cast(
        "bigint"
    )
    symbol_ratio = n_symbols / n_tokens
    bigrams = F.element_at(
        F.transform(
            F.array(toks),
            lambda t: F.when(
                F.size(t) >= 2,
                F.transform(
                    F.slice(t, 1, F.size(t) - 1),
                    lambda x, i: F.concat(x, F.lit(" "), F.element_at(t, i + 2)),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ),
        1,
    )
    n_bigrams = F.size(bigrams).cast("bigint")
    n_distinct_bigrams = F.size(F.array_distinct(bigrams)).cast("bigint")
    # single-token docs have zero bigrams: vacuously non-repetitive
    bigram_ratio = F.when(n_bigrams > 0, n_distinct_bigrams / n_bigrams).otherwise(
        F.lit(1.0)
    )
    passes = {
        "n_tokens": (n_tokens >= int(th["min_tokens"]))
        & (n_tokens <= int(th["max_tokens"])),
        "word_len": (mean_word_len >= th["min_word_len"])
        & (mean_word_len <= th["max_word_len"]),
        "alpha": alpha_frac >= th["min_alpha_frac"],
        "stopwords": stop_hits >= int(th["min_stop_hits"]),
        "symbols": symbol_ratio <= th["max_symbol_ratio"],
        "repetition": bigram_ratio >= th["min_distinct_bigram_ratio"],
    }
    keep = None
    fail = None
    for rule in GOPHER_RULE_ORDER:
        keep = passes[rule] if keep is None else (keep & passes[rule])
        branch = F.when(~passes[rule], F.lit(rule))
        fail = branch if fail is None else fail.when(~passes[rule], F.lit(rule))
    return {
        "n_tokens": n_tokens,
        "mean_word_len": F.round(mean_word_len, 4),
        "alpha_frac": F.round(alpha_frac, 4),
        "stop_hits": stop_hits,
        "symbol_ratio": F.round(symbol_ratio, 4),
        "distinct_bigram_ratio": F.round(bigram_ratio, 4),
        "keep": keep,
        "fail_reason": fail.otherwise(F.lit(None).cast("string")),
    }


def gopher_rules_oracle_sql(thresholds: dict[str, float] | None = None) -> str:
    """DuckDB twin of :func:`gopher_rules` over the ``documents`` view —
    same feature expressions, same first-fail CASE order."""
    th = {**GOPHER_DEFAULTS, **(thresholds or {})}
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    conds = {
        "n_tokens": f"(n_tokens >= {int(th['min_tokens'])} AND n_tokens <= {int(th['max_tokens'])})",
        "word_len": f"(mean_wl >= {th['min_word_len']} AND mean_wl <= {th['max_word_len']})",
        "alpha": f"(alpha_frac >= {th['min_alpha_frac']})",
        "stopwords": f"(stop_hits >= {int(th['min_stop_hits'])})",
        "symbols": f"(symbol_ratio <= {th['max_symbol_ratio']})",
        "repetition": f"(bigram_ratio >= {th['min_distinct_bigram_ratio']})",
    }
    keep = " AND ".join(conds[r] for r in GOPHER_RULE_ORDER)
    first_fail = " ".join(
        f"WHEN NOT {conds[r]} THEN '{r}'" for r in GOPHER_RULE_ORDER
    )
    return f"""
    WITH t AS (
        SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
    ),
    feat AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               len(replace(text, ' ', '')) * 1.0 / len(toks) AS mean_wl,
               len(list_filter(toks, w -> regexp_matches(w, '[a-z]')))
                   * 1.0 / len(toks) AS alpha_frac,
               CAST(len(list_filter(toks, w -> list_contains([{stops}], w)))
                   AS BIGINT) AS stop_hits,
               len(regexp_extract_all(text, '{_GOPHER_SYMBOL_RE}'))
                   * 1.0 / len(toks) AS symbol_ratio,
               CASE WHEN len(toks) >= 2 THEN
                   len(list_distinct(list_transform(
                       generate_series(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i + 1]))) * 1.0
                   / (len(toks) - 1)
               ELSE 1.0 END AS bigram_ratio
        FROM t
    )
    SELECT doc_id, n_tokens,
           round(mean_wl, 4) AS mean_word_len,
           round(alpha_frac, 4) AS alpha_frac,
           stop_hits,
           round(symbol_ratio, 4) AS symbol_ratio,
           round(bigram_ratio, 4) AS distinct_bigram_ratio,
           ({keep}) AS keep,
           CASE {first_fail} ELSE NULL END AS fail_reason
    FROM feat
    """


def c4_line_filters(
    text: Column,
    sep: str = "\n",
    terminal_re: str = "[.!?\"']$",
    min_words_per_line: int = 3,
    line_blocklist: tuple[str, ...] = ("javascript",),
    doc_blocklist: tuple[str, ...] = ("lorem ipsum", "{"),
    min_kept_lines: int = 3,
) -> dict[str, Column]:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2 — the classic
    web-corpus curation stage Gopher's document-level rules complement):
    keep a LINE only if it ends in a terminal mark (``terminal_re``), has
    at least ``min_words_per_line`` words, and contains no
    ``line_blocklist`` phrase (C4 drops any line with the word
    "Javascript"); keep the DOCUMENT only if at least ``min_kept_lines``
    lines survive and no ``doc_blocklist`` phrase appears anywhere (C4
    drops whole pages containing "lorem ipsum" or a curly bracket).

    Returns ``{"n_lines", "n_kept_lines", "kept_text", "keep_doc"}`` —
    the rebuilt document joins surviving lines with ``sep`` in original
    order. Everything is one in-row expression tree over the split-ONCE
    line array (split, lambda filter, array_join) — whole-stage codegen,
    zero shuffles, scan-speed at any corpus size; counts are exact
    integers and the rebuilt text is deterministic, so the DuckDB oracle
    (:func:`c4_line_filters_oracle_sql`) is hash-exact. The regex runs in
    the Java/RE2 common subset (anchors + character classes, no
    lookaround) so both engines judge lines identically."""
    import re as _re

    lines = F.split(text, _re.escape(sep))

    def _line_keep(line: Column) -> Column:
        cond = line.rlike(terminal_re) & (
            F.size(F.split(line, " ")) >= int(min_words_per_line)
        )
        for phrase in line_blocklist:
            cond = cond & ~line.contains(phrase)
        return cond

    kept = F.filter(lines, _line_keep)
    n_kept = F.size(kept).cast("bigint")
    doc_hit = F.lit(False)
    for phrase in doc_blocklist:
        doc_hit = doc_hit | text.contains(phrase)
    return {
        "n_lines": F.size(lines).cast("bigint"),
        "n_kept_lines": n_kept,
        "kept_text": F.array_join(kept, sep),
        "keep_doc": (n_kept >= int(min_kept_lines)) & ~doc_hit,
    }


def c4_line_filters_oracle_sql(
    sep: str = "\n",
    terminal_re: str = "[.!?\"']$",
    min_words_per_line: int = 3,
    line_blocklist: tuple[str, ...] = ("javascript",),
    doc_blocklist: tuple[str, ...] = ("lorem ipsum", "{"),
    min_kept_lines: int = 3,
) -> str:
    """DuckDB twin of :func:`c4_line_filters` over the ``documents`` view —
    same line predicate inside ``list_filter``, same doc-level rules.
    DuckDB's ``array_to_string`` returns NULL for an EMPTY list where
    Spark's ``array_join`` returns ``''`` — COALESCE aligns the engines."""
    line_conds = [
        f"regexp_matches(l, '{terminal_re}')",
        f"len(string_split(l, ' ')) >= {int(min_words_per_line)}",
    ]
    line_conds += [f"NOT contains(l, '{p}')" for p in line_blocklist]
    line_pred = " AND ".join(line_conds)
    doc_hit = " OR ".join(f"contains(text, '{p}')" for p in doc_blocklist)
    return f"""
    WITH t AS (
        SELECT doc_id, text,
               list_filter(string_split(text, '{sep}'),
                           l -> {line_pred}) AS kept
        FROM documents
    )
    SELECT doc_id,
           CAST(len(string_split(text, '{sep}')) AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept_lines,
           COALESCE(array_to_string(kept, '{sep}'), '') AS kept_text,
           (len(kept) >= {int(min_kept_lines)} AND NOT ({doc_hit}))
               AS keep_doc
    FROM t
    """


def regex_token_count(text: Column, pattern: str = "[a-z]+|[0-9]+") -> Column:
    """BPE-ish regex token count (letter runs / digit runs)."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("bigint")


def fingerprint(text: Column) -> Column:
    """Rolling polynomial hash over the first ``FINGERPRINT_PREFIX`` chars
    (base 31, mod 1e9+7) — pure integer arithmetic, identical in any engine."""
    chars = F.filter(
        F.split(F.substring(text, 1, FINGERPRINT_PREFIX), ""), lambda c: c != ""
    )
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: F.pmod(
            acc * FINGERPRINT_BASE + F.ascii(c), F.lit(FINGERPRINT_MOD)
        ).cast("bigint"),
    )


# PII redaction patterns ([ext] curation stage): written in the regex subset
# Java (Spark) and RE2 (DuckDB) agree on — character classes, bounded
# quantifiers, \b, alternation; NO lookaround (RE2 has none) — so the SQL
# oracle replays each pattern verbatim. Order matters: email before phone
# (an email's digit runs must not be half-eaten as a phone number first).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d().\- ]{7,}\d", "<PHONE>"),
)


def redact_pii(
    text: Column,
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> dict[str, Column]:
    """Scrub the standard PII shapes (emails, IPv4s, phone-ish digit runs)
    and count what was removed — the pre-release scrubbing pass a training
    corpus gets, as pure ``regexp_replace``/``regexp_extract_all`` codegen
    (no Python, cost = the scan).

    Returns ``{"redacted": <text with typed placeholders>, "n_<kind>":
    <count>, ...}``. Counts and replacements both run on the PROGRESSIVELY
    redacted text, pattern by pattern in priority order: a span consumed by
    an earlier kind is neither counted nor re-redacted by a later one
    (email wins over phone on overlap), so ``sum(counts)`` equals the
    number of placeholders in ``redacted`` (ADVICE r05 #3 — the DuckDB
    oracle replays the same staged semantics).

    Precision/recall here are pattern-bounded (a phone regex is a
    heuristic, not a parser); the operator's contract is deterministic,
    engine-portable scrubbing — pass a production-grade ``patterns`` list
    (same (kind, regex, placeholder) triples, Java-and-RE2-shared regex
    subset) or swap in an NER stage via mapInPandas without touching the
    plumbing."""
    out: dict[str, Column] = {}
    redacted = text
    for kind, pat, placeholder in patterns:
        # counts use the current (partially redacted) stage for the same
        # reason replacement does: spans consumed by an earlier kind are
        # no longer countable, so sum(counts) == number of placeholders.
        out[f"n_{kind}"] = F.size(F.regexp_extract_all(redacted, F.lit(pat), F.lit(0))).cast(
            "bigint"
        )
        redacted = F.regexp_replace(redacted, pat, placeholder)
    out["redacted"] = redacted
    return out


def redact_pii_oracle_sql(
    text_sql: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> tuple[str, str]:
    """DuckDB twin of :func:`redact_pii`: (count aliases, redacted expr),
    replaying the same patterns in the same order with global replace."""
    counts = []
    redacted = text_sql
    for kind, pat, placeholder in patterns:
        esc = pat.replace("'", "''")
        counts.append(
            f"CAST(len(regexp_extract_all({redacted}, '{esc}')) AS BIGINT) AS n_{kind}"
        )
        redacted = f"regexp_replace({redacted}, '{esc}', '{placeholder}', 'g')"
    return ",\n        ".join(counts), f"{redacted} AS redacted"


def dedup_lines_within_doc(
    text: Column, sep: str = "\n"
) -> dict[str, Column]:
    """INTRA-document repeated-line removal (the Dolma/RefinedWeb
    within-doc dedup stage — navigation chrome, repeated headers, and
    copy-paste stutter repeat INSIDE one page; the cross-document twins
    are `dedup_paragraphs`/`c4_line_filters`): keep each line's FIRST
    occurrence, in original order, and rebuild the document.

    Pure in-row and LINEAR: Spark's ``array_distinct`` removes duplicates
    keeping the FIRST occurrence in document order (a hash-set sweep, one
    pass per doc) — exactly the keep-first rule. Zero shuffles; cost is
    the scan. Returns ``{"n_lines", "n_kept_lines", "cleaned_text"}``;
    counts are exact integers and the rebuild is deterministic. The
    DuckDB oracle does NOT use ``list_distinct`` (its output order is
    unspecified) — it replays keep-first explicitly with an indexed
    ``list_filter(l, (x, i) -> list_position(l, x) = i)``, so a Spark
    regression on ``array_distinct`` ordering would hash-mismatch."""
    import re as _re

    lines = F.split(text, _re.escape(sep))
    kept = F.array_distinct(lines)
    return {
        "n_lines": F.size(lines).cast("bigint"),
        "n_kept_lines": F.size(kept).cast("bigint"),
        "cleaned_text": F.array_join(kept, sep),
    }
