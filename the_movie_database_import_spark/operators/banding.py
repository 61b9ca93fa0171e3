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


def choose_banding(p_match: float, target_recall: float, max_sig: int) -> tuple[int, int]:
    """Pick ``(signature_size, bands)`` from the banding recall formula,
    given the per-component collision probability ``p_match`` AT the
    similarity threshold (MinHash: p = jaccard; hyperplane LSH:
    p = 1 - acos(cos)/pi).

    A band of ``r`` components matches with ``p^r``; with ``b`` bands a
    qualifying pair is emitted with ``recall = 1 - (1 - p^r)^b``. Recall is
    monotone in the underlying similarity, so guaranteeing it AT the
    threshold guarantees it above. Candidate cost falls as bands get WIDER
    (larger ``r`` → more selective buckets), so take the largest ``r`` whose
    required band count ``b = ceil(ln(1-target) / ln(1-p^r))`` still fits
    ``r*b <= max_sig`` — the most selective geometry that meets the recall
    target within the signature budget. Raises if even ``r=1`` cannot."""
    import math

    if not 0.0 < p_match <= 1.0:
        raise ValueError(f"p_match must be in (0, 1]: {p_match}")
    if not 0.0 < target_recall < 1.0:
        raise ValueError(f"target_recall must be in (0, 1): {target_recall}")
    for r in range(max_sig, 0, -1):
        p_band = p_match**r
        if p_band >= 1.0:  # p_match == 1: one band suffices
            return r, 1
        if 1.0 - p_band == 1.0:
            # p^r underflows float resolution (~1e-16): the required band
            # count is astronomical, and log(1-p_band) would be exactly 0
            # (division by zero). This r can never fit any budget; narrower
            # bands might.
            continue
        b = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_band))
        if r * b <= max_sig:
            return r * b, b
    raise ValueError(
        f"no (signature, bands) within {max_sig} components reaches recall "
        f"{target_recall} at per-component match probability {p_match}"
    )


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
