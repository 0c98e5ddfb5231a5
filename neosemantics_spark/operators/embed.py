"""Embedding compression for storage/serving — per-dimension min-max
int-n quantization of an `array<float>` column, the standard 4×
shrink a 100 TB-corpus embedding store takes before ANN serving (the
IVF/LSH operators in `operators/similarity.py` consume either form).

Spark shape, in three pieces, all JVM-side expressions (no UDFs):

1. `dimension_stats` — per-dimension (min, max): posexplode to
   (pos, value) rows then a map-side-combined groupBy(pos) agg, so the
   shuffle carries at most `2·d·n_partitions` partial rows no matter
   how many vectors the corpus holds (d is the embedding width, a
   constant ~10²).
2. `quantize_embeddings` — the d-row stats table is collapsed to ONE
   row of two aligned arrays (mins, maxs) and broadcast-cross-joined
   onto the vectors; the code array is a single `zip_with` chain, so
   quantization itself is embarrassingly parallel with zero shuffle.
3. `quantization_error` — dequantize-and-compare in one expression
   (`zip_with` + `aggregate` max), the audit that picks the bit width.

All arithmetic is explicitly double on both engines (the input parquet
is float32; promoting once up front keeps Spark and the DuckDB oracle
bit-identical through the floor/clamp).

Reference scope note: the reference engine has no embedding surface —
this family extends the training-data side (SURVEY.md additions), not
reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..utils import round4


def _as_double(vec):
    return F.transform(vec, lambda x: x.cast("double"))


def dimension_stats(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """(pos, dmin, dmax) per dimension (pos is 0-based). Partial
    aggregation reduces each partition to d rows before the shuffle."""
    return (
        embeddings.select(F.posexplode(_as_double(F.col(vec_col))).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.min("v").alias("dmin"), F.max("v").alias("dmax"))
    )


def _scales_row(stats: DataFrame) -> DataFrame:
    """Collapse the d-row stats table to one row of two pos-aligned
    arrays — broadcast-sized by construction (d entries)."""
    return stats.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "dmin"))), lambda s: s["dmin"]
        ).alias("mins"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "dmax"))), lambda s: s["dmax"]
        ).alias("maxs"),
    )


def quantize_embeddings(
    embeddings: DataFrame,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    stats: DataFrame | None = None,
) -> DataFrame:
    """(id, qvec array<int>) — per-dimension min-max codes in
    [0, 2^bits - 1]: q = floor((x - dmin)/(dmax - dmin) * (2^bits - 1)
    + 0.5), clamped; degenerate dimensions (dmax == dmin) code to 0.
    Pass a precomputed `stats` (from `dimension_stats`, e.g. persisted
    from a training split) to quantize new batches on frozen scales —
    the same frozen-quantizer discipline as the ANN index artifact
    (`operators/ann_index.py`)."""
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    levels = float((1 << bits) - 1)
    frozen = stats is not None
    if stats is None:
        stats = dimension_stats(embeddings, vec_col)
    scales = _scales_row(stats)
    vec = _as_double(F.col(vec_col))
    if frozen:
        # a batch whose width disagrees with a persisted quantizer must
        # fail loudly, not zip_with-pad to null codes (ADVICE r6)
        vec = F.when(
            F.size(vec) == F.size(F.col("mins")), vec
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("quantize_embeddings: batch vector width "),
                    F.size(vec).cast("string"),
                    F.lit(" != frozen quantizer width "),
                    F.size(F.col("mins")).cast("string"),
                )
            )
        )
    shifted = F.zip_with(vec, F.col("mins"), lambda x, m: x - m)
    q = F.zip_with(
        shifted,
        F.zip_with(F.col("maxs"), F.col("mins"), lambda a, b: a - b),
        lambda s, r: F.when(r == 0.0, F.lit(0)).otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(int(levels)),
                    F.floor(s / r * F.lit(levels) + F.lit(0.5)).cast("int"),
                ),
            )
        ),
    )
    return embeddings.crossJoin(F.broadcast(scales)).select(
        F.col(id_col), q.alias("qvec")
    )


def quantization_error(
    embeddings: DataFrame,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    stats: DataFrame | None = None,
) -> DataFrame:
    """(id, max_err) — max per-dimension |x - dequant(quant(x))|, 4-dp
    half-up rounded: the audit table that justifies a bit width (max_err
    ≤ range/(2·levels) by construction; a violation means scale drift
    between the frozen stats and the batch)."""
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    levels = float((1 << bits) - 1)
    if stats is None:
        stats = dimension_stats(embeddings, vec_col)
    scales = _scales_row(stats)
    vec = _as_double(F.col(vec_col))
    # dequantized value per dim: dmin + q/levels * (dmax - dmin)
    def _code(x, m, r):
        return F.when(r == 0.0, F.lit(0.0)).otherwise(
            F.greatest(
                F.lit(0.0),
                F.least(F.lit(levels), F.floor((x - m) / r * levels + 0.5)),
            )
        )

    err = F.zip_with(
        vec,
        F.zip_with(F.col("mins"), F.col("maxs"), lambda m, M: F.struct(
            m.alias("m"), (M - m).alias("r")
        )),
        lambda x, s: F.abs(
            x - (s["m"] + _code(x, s["m"], s["r"]) / F.lit(levels) * s["r"])
        ),
    )
    return embeddings.crossJoin(F.broadcast(scales)).select(
        F.col(id_col),
        round4(F.aggregate(err, F.lit(0.0), lambda acc, x: F.greatest(acc, x))).alias(
            "max_err"
        ),
    )
