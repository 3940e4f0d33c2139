"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k (the exactness baseline) and an IVF-style
coarse-quantized variant (the scale path: probe only the query's cell) —
both as pure column algebra (`F.aggregate`/`F.zip_with`), no Python in the
hot path. A vectorized Pandas-UDF batch scorer is provided for wide vectors
where Arrow-batch numpy beats per-element codegen.

Scale notes: brute force is a full scan per query — fine fanned out over a
query *batch* (crossJoin broadcast of queries, one pass over the corpus).
IVF reduces scanned fraction to ~1/n_cells; cells here come from a provided
coarse label (or any clustering); at 100 TB the corpus side is bucketed by
cell so a probe prunes partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import DoubleType


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def brute_force_topk(emb: DataFrame, query: DataFrame, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k of `query` rows (qid, qvec) against the corpus.
    Query side is broadcast; one corpus scan for the whole query batch;
    per-query top-k via TakeOrderedAndProject-friendly window."""
    from pyspark.sql import Window
    q = F.broadcast(query.select(F.col(id_col).alias("qid"),
                                 F.col(vec_col).alias("qvec")))
    scored = (emb.crossJoin(q)
              .where(F.col(id_col) != F.col("qid"))
              .select("qid", F.col(id_col),
                      F.round(cosine_col(
                          F.col(vec_col).cast("array<double>"),
                          F.col("qvec").cast("array<double>")), 4).alias("cosine")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col(id_col))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k))


def ivf_topk(emb: DataFrame, query: DataFrame, k: int = 10,
             cell_col: str = "label", vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """IVF-1-probe: scan only the query's coarse cell (here: `label` as the
    pre-computed coarse quantizer). At scale the corpus is written bucketed/
    partitioned by cell, so this prunes file scans, not just rows."""
    from pyspark.sql import Window
    q = F.broadcast(query.select(F.col(id_col).alias("qid"),
                                 F.col(vec_col).alias("qvec"),
                                 F.col(cell_col).alias("qcell")))
    scored = (emb.join(q, F.col(cell_col) == F.col("qcell"))
              .where(F.col(id_col) != F.col("qid"))
              .select("qid", F.col(id_col),
                      F.round(cosine_col(
                          F.col(vec_col).cast("array<double>"),
                          F.col("qvec").cast("array<double>")), 4).alias("cosine")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col(id_col))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k))


def cosine_pandas_udf(query_vec: list[float]):
    """Arrow-batched numpy cosine vs a fixed query vector — the wide-vector
    fast path (one BLAS dot per batch instead of per-element codegen)."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(qv)

    @F.pandas_udf(DoubleType())
    def cos(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy())
        sims = (m @ qv) / (np.linalg.norm(m, axis=1) * qn)
        return pd.Series(sims)

    return cos
