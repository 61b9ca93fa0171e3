"""Shared banded-LSH join predicate ([ext], used by minhash, simhash, and
embedding-cosine near-dup).

All three LSH operators follow one layout contract: each side of the banded
self-join carries every band value as a scalar column ``b0..b{n-1}`` PLUS a
``posexplode``-produced ``band_id`` row per band. A true near-dup pair
collides in several bands, so a naive banded self-join emits it up to
``n_bands`` times and needs a full ``distinct()`` shuffle over the candidate
stream to dedupe. :func:`first_collision_band` keeps a match only at its
FIRST colliding band instead — each candidate pair is emitted exactly once,
the post-join Exchange disappears, and candidate volume is the true pair
count rather than pairs x bands.

The predicate is a CASE chain over plain long comparisons, so it
whole-stage-codegens with zero per-row allocation (an equivalent
zip_with/slice over a bands array allocates per matched row — measured ~15x
slower on the minhash path, where the join matches each true near-dup pair
in nearly every band). Property-pinned against a distinct()-based model in
tests/test_properties.py::test_first_collision_band_matches_distinct_model.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def first_collision_band(n_bands: int, left: str = "a", right: str = "b") -> Column:
    """Predicate: the current row's ``band_id`` is the FIRST band on which
    the ``left`` and ``right`` join sides collide — i.e. no earlier band
    ``b0..b{band_id-1}`` is also equal. AND this onto a banded self-join's
    equi-condition (which already requires equality AT ``band_id``) to get
    single-emission candidates with no ``distinct()``."""
    pred = F.when(F.col(f"{left}.band_id") == 0, F.lit(True))
    distinct_so_far: Column | None = None
    for b in range(1, n_bands):
        neq = F.col(f"{left}.b{b - 1}") != F.col(f"{right}.b{b - 1}")
        distinct_so_far = neq if distinct_so_far is None else (distinct_so_far & neq)
        pred = pred.when(F.col(f"{left}.band_id") == b, distinct_so_far)
    return pred
