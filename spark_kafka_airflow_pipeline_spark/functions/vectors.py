"""Vector/embedding column expressions — all JVM-side, codegen-friendly.

Everything here is built from ``pyspark.sql.functions`` higher-order
functions (``zip_with``, ``aggregate``, ``transform``) so the hot path
never crosses into Python. At 100 TB the alternative — a per-row Python
UDF — is 10-100x slower; even a pandas UDF pays Arrow serialization for
something a fused JVM expression does in-register.

[EXT] surface: the reference has no vector ops (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Elementwise product then sum: ``sum_i a_i * b_i``."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a| |b|); NULL-safe on zero vectors (returns NULL)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ))


def normalize(a: Column | str) -> Column:
    """Unit-length copy of the vector (zero vectors pass through).

    The norm rides along as a ``zip_with`` argument (evaluated once),
    not a lambda capture — a captured norm expression would be
    re-aggregated per element, O(d^2) per vector (see
    ``functions.text.shingles`` for the same pitfall)."""
    n = l2_norm(a)
    scaled = F.zip_with(_c(a), F.array_repeat(n, F.size(_c(a))),
                        lambda x, m: x / m)
    return F.when(n != 0, scaled).otherwise(_c(a))


def random_hyperplane_signs(a: Column | str, n_planes: int, seed: int = 42) -> Column:
    """SimHash-style LSH signature for cosine similarity: the sign bits of
    projections onto pseudo-random hyperplanes.

    Planes are derived deterministically from (seed, plane_index,
    component_index) via a hash -> [-1, 1) mapping, so the signature is
    reproducible across runs and engines — no RNG state, no shuffling of
    a planes table. Returns an ``array<int>`` of 0/1 bits.
    """
    arr = _c(a)
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                arr,
                F.transform(
                    F.sequence(F.lit(0), F.size(arr) - 1),
                    lambda i: (F.pmod(F.hash(F.lit(seed), F.lit(p), i), F.lit(10007))
                               / F.lit(5003.5)) - F.lit(1.0),
                ),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)))
    return F.array(*bits)


def bits_to_bucket(bits: Column) -> Column:
    """Fold a 0/1 bit array into one integer bucket id (for LSH grouping)."""
    return F.aggregate(bits, F.lit(0).cast("long"),
                       lambda acc, b: acc * 2 + b.cast("long"))
