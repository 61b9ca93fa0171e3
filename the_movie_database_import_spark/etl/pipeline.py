"""TMDB reference-parity ETL: Kaggle "The Movies Dataset" CSVs → the 15
normalized tables of ``db_schema.json`` (reference pipeline
`loader.py:549-607`), re-expressed as declarative Spark plans.

Conflict-policy parity (SURVEY.md §2 Part A notes, §7.5):
- movies: duplicate id → LAST row wins (`loader.py:225`), via row_number
  over input order descending;
- dimensions (genres/collections/companies/persons/keywords): FIRST
  occurrence registers the name (`loader.py:147-148,:155-158,:198-201,
  :264-265,:272-273,:303-307`);
- keywords→movies: duplicate keyword UNIONs its movie set
  (`loader.py:308-309`) — distinct pairs across ALL rows;
- crew/cast per movie: last duplicate credits row wins
  (`loader.py:256-276`), while the person registry sees all rows, crew
  before cast within a row (`loader.py:257-276`).

Input order: the reference iterates CSV file order. multiLine CSV files are
unsplittable, so ``monotonically_increasing_id`` over the single-file scan
reproduces it exactly; with a sharded input the policies remain
deterministic per shard ordering (documented deviation — at 100 TB "file
order" is not a meaningful total order anyway).

Deviations (SURVEY.md §7.5): D1 surrogate ids dense_rank over natural key;
D2 missing overview → NULL (not the ``str(NaN)`` artifact ``'nan'``);
D3 ``ast.literal_eval`` not ``eval``; null iso codes / entity ids are
dropped rather than registered under a NULL key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..session import tracked_cache
from ..sources.readers import scan_csv
from .parse import (
    parse_cast_array,
    parse_collection,
    parse_country_array,
    parse_crew_array,
    parse_id_name_array,
    parse_lang_array,
    positive_bigint_or_null,
    positive_double_or_null,
    positive_int_trunc_or_null,
)


def _str_schema(*names: str) -> StructType:
    return StructType([StructField(n, StringType()) for n in names])


# Raw columns as strings: cleansing casts are explicit operators (A3/A4),
# never reader inference (SURVEY.md §1.3).
MOVIES_SCHEMA = _str_schema(
    "adult", "belongs_to_collection", "budget", "genres", "homepage", "id",
    "imdb_id", "original_language", "original_title", "overview", "popularity",
    "poster_path", "production_companies", "production_countries", "release_date",
    "revenue", "runtime", "spoken_languages", "status", "tagline", "title",
    "video", "vote_average", "vote_count",
)
CREDITS_SCHEMA = _str_schema("cast", "crew", "id")
KEYWORDS_SCHEMA = _str_schema("id", "keywords")
RATINGS_SCHEMA = _str_schema("userId", "movieId", "rating", "timestamp")

OUTPUT_TABLES = (
    "movies", "genres", "languages", "collections", "persons", "countries",
    "production_companies", "keywords", "movies_genres", "spoken_languages",
    "production_countries", "movies_production_companies", "movies_keywords",
    "directors", "actors",
)


def load_inputs(spark: SparkSession, base_dir: str) -> dict[str, DataFrame]:
    """Scan the four TMDB CSVs (ref A1, `loader.py:561-568`) and attach the
    input-order index the conflict policies depend on.

    Each path may be a single file (the Kaggle layout) or a DIRECTORY of
    shard files, each with its own header — the 100x-input posture: the
    three nested-cell CSVs are multiLine and therefore one task PER FILE,
    so sharding them is the only way the parse stage parallelizes
    (`tools/bench_etl.py --shards N` measures it). Ratings scans with
    ``multiline=False``: the file is flat (no quoted newlines), which makes
    even a single 26M-row file LINE-SPLITTABLE — full parallelism without
    sharding — and its only consumer is an order-insensitive mean, so the
    splittable scan cannot perturb any conflict policy."""
    paths = {
        "movies": f"{base_dir}/movies_metadata.csv",
        "credits": f"{base_dir}/credits.csv",
        "keywords": f"{base_dir}/keywords.csv",
        "ratings": f"{base_dir}/ratings.csv",
    }
    schemas = {
        "movies": MOVIES_SCHEMA,
        "credits": CREDITS_SCHEMA,
        "keywords": KEYWORDS_SCHEMA,
        "ratings": RATINGS_SCHEMA,
    }
    return {
        name: scan_csv(
            spark,
            paths[name],
            schemas[name],
            multiline=(name != "ratings"),
        ).withColumn("_idx", F.monotonically_increasing_id())
        for name in paths
    }


def _first_wins(df: DataFrame, key: str, order_cols: list[str]) -> Window:
    return Window.partitionBy(key).orderBy(*order_cols)


def _valid_id(df: DataFrame, src_col: str, out_col: str) -> DataFrame:
    """Safe cast + skip-invalid filter (ref A3, `loader.py:123-127`)."""
    return df.withColumn(out_col, F.col(src_col).try_cast("bigint")).filter(
        F.col(out_col).isNotNull()
    )


def build_movie_tables(movies_raw: DataFrame) -> dict[str, DataFrame]:
    mv = _valid_id(movies_raw, "id", "movie_id")
    parsed = mv.select(
        "movie_id",
        "_idx",
        "original_title",
        "release_date",
        "budget",
        "popularity",
        "revenue",
        "runtime",
        "overview",
        "original_language",
        parse_id_name_array("genres").alias("genres_arr"),
        parse_collection("belongs_to_collection").alias("collection"),
        parse_lang_array("spoken_languages").alias("spoken_arr"),
        parse_id_name_array("production_companies").alias("companies_arr"),
        parse_country_array("production_countries").alias("countries_arr"),
    )
    tracked_cache(parsed)  # shared by every derivation below

    last = (
        parsed.withColumn(
            "_rn", F.row_number().over(Window.partitionBy("movie_id").orderBy(F.col("_idx").desc()))
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # ---- simple dims: first occurrence registers the name (ref A7) -------
    def first_wins_dim(arr_col: str) -> DataFrame:
        occ = parsed.select("_idx", F.posexplode_outer(arr_col).alias("_pos", "e")).select(
            "_idx", "_pos", F.col("e.id").alias("id"), F.col("e.name").alias("name")
        ).filter(F.col("id").isNotNull())
        w = Window.partitionBy("id").orderBy("_idx", "_pos")
        return occ.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).select(
            "id", "name"
        )

    genres = first_wins_dim("genres_arr")
    companies = first_wins_dim("companies_arr")
    collections = (
        parsed.filter(F.col("collection.id").isNotNull())
        .select("_idx", F.col("collection.id").alias("id"), F.col("collection.name").alias("name"))
        .withColumn("_rn", F.row_number().over(Window.partitionBy("id").orderBy("_idx")))
        .filter(F.col("_rn") == 1)
        .select("id", "name")
    )

    # ---- languages: surrogate keys + NULL-name fill-in (ref A8/A9) -------
    # Occurrence stream in reference processing order: original_language
    # (phase 0, `loader.py:161`) before the spoken_languages list (phase 1,
    # `loader.py:176`), rows in input order.
    orig_occ = parsed.select(
        "_idx",
        F.lit(0).alias("_phase"),
        F.lit(0).alias("_pos"),
        F.col("original_language").alias("iso"),
        F.lit(None).cast("string").alias("name"),
    )
    spoken_occ = parsed.select(
        "_idx", F.lit(1).alias("_phase"), F.posexplode_outer("spoken_arr").alias("_pos", "e")
    ).select("_idx", "_phase", "_pos", F.col("e.iso_639_1").alias("iso"), F.col("e.name").alias("name"))
    lang_occ = orig_occ.unionByName(spoken_occ).filter(F.col("iso").isNotNull())

    lang_names = (
        lang_occ.filter(F.col("name").isNotNull())
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("iso").orderBy("_idx", "_phase", "_pos")),
        )
        .filter(F.col("_rn") == 1)
        .select("iso", "name")
    )
    languages = (
        lang_occ.select("iso")
        .distinct()
        .withColumn("id", F.dense_rank().over(Window.orderBy("iso")).cast("bigint"))
        .join(lang_names, "iso", "left")
        .select("id", F.col("iso").alias("lang_key"), "name")
    )

    # ---- countries: surrogate keys, name first-wins (ref A8) -------------
    country_occ = parsed.select(
        "_idx", F.posexplode_outer("countries_arr").alias("_pos", "e")
    ).select(
        "_idx", "_pos", F.col("e.iso_3166_1").alias("iso"), F.col("e.name").alias("name")
    ).filter(F.col("iso").isNotNull())
    country_names = (
        country_occ.filter(F.col("name").isNotNull())
        .withColumn("_rn", F.row_number().over(Window.partitionBy("iso").orderBy("_idx", "_pos")))
        .filter(F.col("_rn") == 1)
        .select("iso", "name")
    )
    countries = (
        country_occ.select("iso")
        .distinct()
        .withColumn("id", F.dense_rank().over(Window.orderBy("iso")).cast("bigint"))
        .join(country_names, "iso", "left")
        .select("id", F.col("iso").alias("code"), "name")
    )

    # ---- bridges: per-movie SET semantics from the surviving row (A10) ---
    lang_ids = languages.select(F.col("lang_key").alias("iso"), F.col("id").alias("language_id"))
    country_ids = countries.select(F.col("code").alias("iso"), F.col("id").alias("country_id"))

    movies_genres = (
        last.select("movie_id", F.explode("genres_arr").alias("e"))
        .select("movie_id", F.col("e.id").alias("genre_id"))
        .filter(F.col("genre_id").isNotNull())
        .distinct()
    )
    movies_companies = (
        last.select("movie_id", F.explode("companies_arr").alias("e"))
        .select("movie_id", F.col("e.id").alias("production_company_id"))
        .filter(F.col("production_company_id").isNotNull())
        .distinct()
    )
    spoken_languages = (
        last.select("movie_id", F.explode("spoken_arr").alias("e"))
        .select("movie_id", F.col("e.iso_639_1").alias("iso"))
        .filter(F.col("iso").isNotNull())
        .join(F.broadcast(lang_ids), "iso")
        .select("movie_id", "language_id")
        .distinct()
    )
    production_countries = (
        last.select("movie_id", F.explode("countries_arr").alias("e"))
        .select("movie_id", F.col("e.iso_3166_1").alias("iso"))
        .filter(F.col("iso").isNotNull())
        .join(F.broadcast(country_ids), "iso")
        .select("movie_id", "country_id")
        .distinct()
    )

    # ---- movies fact: cleansing (A4) + surrogate lookups -----------------
    movies = last.select(
        F.col("movie_id").alias("id"),
        F.col("original_title").alias("title"),
        F.col("release_date").alias("release_date"),  # varchar for parity (D6)
        positive_bigint_or_null(F.col("budget")).alias("budget"),
        positive_bigint_or_null(F.col("revenue")).alias("revenue"),
        positive_double_or_null(F.col("popularity")).alias("popularity"),
        positive_int_trunc_or_null(F.col("runtime")).alias("runtime"),
        F.col("original_language").alias("_orig_iso"),
        F.col("collection.id").alias("belongs_to_collection"),
        F.when(F.length("overview") > 0, F.col("overview")).alias("overview"),  # D2
    ).join(
        F.broadcast(lang_ids.withColumnRenamed("language_id", "original_language")),
        F.col("_orig_iso") == F.col("iso"),
        "left",
    ).drop("iso", "_orig_iso")

    return {
        "movies": movies,  # rating joined later (A15)
        "genres": genres,
        "languages": languages,
        "collections": collections,
        "countries": countries,
        "production_companies": companies,
        "movies_genres": movies_genres,
        "spoken_languages": spoken_languages,
        "production_countries": production_countries,
        "movies_production_companies": movies_companies,
    }


def build_credit_tables(credits_raw: DataFrame) -> dict[str, DataFrame]:
    cr = _valid_id(credits_raw, "id", "movie_id")
    parsed = cr.select(
        "movie_id",
        "_idx",
        parse_crew_array("crew").alias("crew_arr"),
        parse_cast_array("cast").alias("cast_arr"),
    )
    tracked_cache(parsed)

    # person registry: ALL rows, crew (phase 0) before cast (phase 1) within
    # a row, first occurrence wins (`loader.py:264-265,:272-273`)
    crew_occ = parsed.select(
        "_idx", F.lit(0).alias("_phase"), F.posexplode_outer("crew_arr").alias("_pos", "e")
    ).select("_idx", "_phase", "_pos", F.col("e.id").alias("id"), F.col("e.name").alias("name"))
    cast_occ = parsed.select(
        "_idx", F.lit(1).alias("_phase"), F.posexplode_outer("cast_arr").alias("_pos", "e")
    ).select("_idx", "_phase", "_pos", F.col("e.id").alias("id"), F.col("e.name").alias("name"))
    persons = (
        crew_occ.unionByName(cast_occ)
        .filter(F.col("id").isNotNull())
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("id").orderBy("_idx", "_phase", "_pos")
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("id", "name")
    )

    # Duplicate credits rows for a movie: last NON-EMPTY row wins, and crew
    # and cast are tracked independently (`loader.py:256,:266-267,:275-276`
    # — the reference only assigns `crew_dict[movie] = crew` when
    # `len(crew.keys()) > 0`, i.e. at least one entry carries a job, and
    # `cast_dict[movie] = cast` when `len(cast) > 0`). A later duplicate row
    # with an empty cast must NOT wipe an earlier row's cast.
    def last_row(pred):
        w = Window.partitionBy("movie_id").orderBy(F.col("_idx").desc())
        return (
            parsed.filter(pred)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
        )

    crew_last = last_row(F.exists("crew_arr", lambda e: e["has_job"]))
    cast_last = last_row(F.size("cast_arr") > 0)

    crew_by_job = (
        crew_last.select("movie_id", F.explode("crew_arr").alias("e"))
        .filter(F.col("e.has_job") & F.col("e.id").isNotNull())
        .groupBy("movie_id", F.col("e.job").alias("job"))
        .agg(F.collect_set("e.id").alias("person_ids"))
    )

    directors = (
        crew_last.select("movie_id", F.explode("crew_arr").alias("e"))
        .filter(F.col("e.has_job") & (F.col("e.job") == "Director") & F.col("e.id").isNotNull())
        .select("movie_id", F.col("e.id").alias("director_id"))
        .distinct()
    )

    # cast is an ordered LIST — duplicates preserved (ref A12)
    actors = (
        cast_last.select("movie_id", F.explode("cast_arr").alias("e"))
        .select(
            F.col("e.id").alias("person_id"),
            "movie_id",
            F.col("e.order").alias("order_id"),
        )
    )

    return {
        "persons": persons,
        "directors": directors,
        "actors": actors,
        "crew_by_job": crew_by_job,  # ref A11 exposed; not a db_schema table
    }


def build_keyword_tables(keywords_raw: DataFrame) -> dict[str, DataFrame]:
    kw = _valid_id(keywords_raw, "id", "movie_id")
    occ = kw.select(
        "movie_id", "_idx", F.posexplode_outer(parse_id_name_array("keywords")).alias("_pos", "e")
    ).select(
        "movie_id", "_idx", "_pos", F.col("e.id").alias("keyword_id"), F.col("e.name").alias("name")
    ).filter(F.col("keyword_id").isNotNull())
    tracked_cache(occ)

    keywords = (
        occ.withColumn(
            "_rn", F.row_number().over(Window.partitionBy("keyword_id").orderBy("_idx", "_pos"))
        )
        .filter(F.col("_rn") == 1)
        .select(F.col("keyword_id").alias("id"), F.col("name").alias("keyword"))
    )
    # UNION across every occurrence — including duplicate movie rows
    # (`loader.py:302-309`): the inverted index is the bridge, grouped the
    # other way (ref A13)
    movies_keywords = occ.select("movie_id", "keyword_id").distinct()
    return {"keywords": keywords, "movies_keywords": movies_keywords}


def build_rating_avg(ratings_raw: DataFrame) -> DataFrame:
    """AVG rating per movie (ref A14, `loader.py:313-336`): pre-aggregated
    BEFORE the movie join — 26M ratings reduce to ~45k rows, making the
    subsequent join broadcastable (the reference hand-rolled exactly this
    pre-aggregation; at 100 TB it is the difference between shuffling the
    fact table and shuffling nothing)."""
    r = ratings_raw.select(
        F.col("movieId").try_cast("bigint").alias("movie_id"),
        F.col("rating").try_cast("double").alias("rating"),
    ).filter(F.col("movie_id").isNotNull() & F.col("rating").isNotNull())
    return r.groupBy("movie_id").agg(
        (F.sum(F.col("rating").cast("decimal(9,2)")).cast("double") / F.count("rating")).alias(
            "rating"
        )
    )


def build_all_tables(
    spark: SparkSession, base_dir: str | None = None, inputs: dict[str, DataFrame] | None = None
) -> dict[str, DataFrame]:
    """The full 15-table build (ref `main`, `loader.py:549-607`)."""
    if inputs is None:
        if base_dir is None:
            raise ValueError("need base_dir or inputs")
        inputs = load_inputs(spark, base_dir)

    out = build_movie_tables(inputs["movies"])
    out.update(build_credit_tables(inputs["credits"]))
    out.update(build_keyword_tables(inputs["keywords"]))

    rating_avg = build_rating_avg(inputs["ratings"])
    movies = out["movies"].join(
        F.broadcast(rating_avg), out["movies"].id == rating_avg.movie_id, "left"
    ).drop("movie_id")  # ref A15: movies keep NULL rating when absent
    out["movies"] = movies.select(
        "id", "title", "release_date", "budget", "revenue", "popularity",
        "runtime", "rating", "original_language", "belongs_to_collection", "overview",
    )
    return out
