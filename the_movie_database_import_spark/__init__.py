"""the_movie_database_import_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``guenthermi/the-movie-database-import``
(a single-threaded pandas→PostgreSQL ETL job, see ``/root/reference/loader.py``),
generalized to the full relational operator surface documented in SURVEY.md §2
plus large-scale training-data-pipeline extensions (dedup, similarity search,
text analysis, multimodal columns, streaming).

Design principles (100 TB posture):
- Declare plans with the DataFrame/SQL API; let Catalyst/Tungsten/AQE pick
  physical strategies (pushdown, pruning, broadcast, skew handling).
- Built-in JVM functions in hot paths; Arrow-batched pandas UDFs only where
  built-ins genuinely cannot express the semantics.
- No driver-side collect loops; every operator is expressed as a distributed
  DataFrame transformation.
"""

__version__ = "0.1.0"
