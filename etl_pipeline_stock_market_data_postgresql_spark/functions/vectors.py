"""Vector math over ``array<float>`` embedding columns — built-in
higher-order functions only (zip_with/aggregate/transform), JVM-side.

All arithmetic is done in DOUBLE after an explicit element cast: both
Spark and DuckDB widen float32→float64 exactly, and the fold order of
``aggregate``/``list_sum`` is left-to-right in both, so dot products are
bit-identical across engines (workload/similarity.py relies on this,
with a final round(6) as belt-and-braces).

For genuinely custom kernels (e.g. batched BLAS over big candidate
sets) the escape hatch is a Pandas UDF — not needed at this dimension
(64): codegen'd loops are faster than Arrow round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two (already double) vectors."""
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(vec: Column, n_bits: int) -> Column:
    """Coarse IVF-style bucket id from the signs of the first ``n_bits``
    components: Σ 2^i · [v_i > 0]. Deterministic, cheap, portable — the
    bucketing step of the scale path for ANN (probe one bucket instead
    of the full corpus)."""
    out = F.lit(0)
    for i in range(n_bits):
        out = out + F.when(F.element_at(vec, i + 1) > 0, F.lit(2 ** i)).otherwise(F.lit(0))
    return out.cast("int")


# --- DuckDB SQL twins (single source of truth for the oracle strings) ---

def dot_sql(a: str, b: str) -> str:
    return f"list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]))"


def norm_sql(a: str) -> str:
    return f"sqrt(list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {a}[i])))"


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"


def sign_bucket_sql(vec: str, n_bits: int) -> str:
    terms = " + ".join(
        f"(CASE WHEN {vec}[{i + 1}] > 0 THEN {2 ** i} ELSE 0 END)" for i in range(n_bits)
    )
    return f"CAST({terms} AS INTEGER)"
