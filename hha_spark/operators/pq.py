"""Product-quantization ADC similarity — the third ANN strategy.

Jégou et al., "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011): split the vector into M subspaces, quantize each
subspace against its own small codebook, and score query-candidate
pairs with an Asymmetric Distance Computation — the query keeps full
precision, every candidate is reduced to M small codes, and the pair
score is M table lookups instead of D multiplies. This is the piece
that makes billion-vector search memory-feasible: candidate storage
drops from D floats to M bytes, and the per-pair cost from O(D) to
O(M).

Deterministic decomposition (same discipline as operators/semantic.py
— no reference analogue; the reference engine has no embedding ops):

  * codebook cells: sign bits of all D_SUB subspace components
    (256 cells/subspace = the canonical 1-byte PQ code) — the
    reproducible stand-in for per-subspace k-means (the trained path
    lives in operators/ivf.py);
  * codebook vectors: per-(subspace, cell) element-wise sums of
    micro-unit-quantized components (one skinny BIGINT shuffle);
  * per-query lookup table: dot(query_sub, cell_sum) // cell_count —
    an EXACT integer floor-division (divisibility forced by
    subtracting the Python-style modulus first, so Spark's truncating
    `div` and DuckDB's flooring `//` agree on any sign);
  * pair scoring: broadcast the |Q| x (M*CELLS) LUT, fold M array
    lookups per candidate — a narrow codegen'd map over the candidate
    scan, no per-pair shuffle.

Scale: the LUT is |queries| x M x CELLS longs and broadcasts; candidates
stream through one projection. At 100 TB compose with the IVF coarse
quantizer (operators/ivf.py) so each query scores only its probed
cells' candidates — PQ compresses the residual scoring, IVF bounds
the candidate set; the two are orthogonal and multiply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hha_spark.operators.semantic import Q_COMP

M_SUB = 8      # subspaces
D_SUB = 8      # dims per subspace (fixture dim 64 = 8 x 8)
CELLS = 256    # sign-bit cells per subspace (one bit per dimension —
               # the canonical PQ codebook size, 256 codes = 1 byte)


def subspace_codes(vec_col: str = "embedding"):
    """array<int> of length M_SUB: per-subspace cell id from the sign
    bit of every component (bit j = component j of the subspace)."""
    bits = " + ".join(
        f"{1 << j} * CAST({vec_col}[m * {D_SUB} + {j}] >= 0 AS INT)"
        for j in range(D_SUB)
    )
    return F.expr(
        f"transform(sequence(0, {M_SUB - 1}), m -> {bits})"
    )


def _quantized_el(df: DataFrame, *, id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, m, idx, q): micro-unit components with subspace ids."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(x.cast("double") * F.lit(Q_COMP)).cast("long"),
            )
        ).alias("idx", "q"),
    ).withColumn("m", (F.col("idx") / F.lit(D_SUB)).cast("int"))


def pq_codebook(emb: DataFrame, *, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """(m, cell, idx, s, n): per-subspace-cell component sums + sizes.

    One narrow explode -> one skinny groupBy (BIGINT keys/values,
    partial aggregation). At most M_SUB x CELLS x D_SUB = 16 Ki rows
    total — broadcastable regardless of corpus size.
    """
    base = emb.select(
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(Q_COMP)).cast("long"),
        ).alias("qs"),
        subspace_codes(vec_col).alias("codes"),
    )
    # single pass: the row's own code array supplies cell for every
    # exploded component — no self-join (an earlier join-on-vec_id
    # variant shuffled the exploded side; this is a narrow map into a
    # map-side-combinable 16 Ki-key aggregate)
    el = base.select(
        F.posexplode("qs").alias("idx", "q"), F.col("codes")
    ).select(
        "idx", "q",
        (F.col("idx") / F.lit(D_SUB)).cast("int").alias("m"),
        F.expr(f"codes[CAST(idx / {D_SUB} AS INT)]").alias("cell"),
    )
    return el.groupBy("m", "cell", "idx").agg(
        F.sum("q").alias("s"), F.count(F.lit(1)).alias("n")
    )


def pq_query_lut(queries: DataFrame, codebook: DataFrame, *,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(qid, lut array<long> of length M_SUB*CELLS): ADC lookup table.

    lut[m*CELLS + cell] = dot(query_sub_m, cell_sum) floor-div cell
    size — the exact-integer mean dot. Missing (empty) cells fill 0.
    """
    q_el = _quantized_el(queries, id_col=id_col, vec_col=vec_col)
    dots = (
        q_el.join(codebook, on=["m", "idx"])
        .groupBy(F.col("vec_id").alias("qid"), "m", "cell")
        .agg(F.sum(F.col("q") * F.col("s")).alias("dot"), F.max("n").alias("n"))
    )
    # exact floor division: subtract the Python-style modulus so the
    # quotient is an exact integer under BOTH truncating (Spark div)
    # and flooring (DuckDB //) semantics
    term = F.expr("(dot - ((dot % n + n) % n)) div n")
    slots = dots.select(
        "qid", (F.col("m") * CELLS + F.col("cell")).alias("slot"),
        term.alias("term"),
    )
    # densify by generating the full slot domain and sort-packing:
    # every qid gets exactly M_SUB*CELLS (slot, term) rows (term 0 for
    # empty cells), then one array_sort(collect_list(struct)) yields
    # the positional array. NOT a slot->term map probed per position:
    # Spark's map element_at is a linear scan, which made the densify
    # O((M*CELLS)^2) per query — measured 24 s vs <1 s for this shape.
    domain = dots.select("qid").distinct().select(
        "qid",
        F.explode(
            F.sequence(F.lit(0), F.lit(M_SUB * CELLS - 1))
        ).alias("slot"),
    )
    # slots is LUT-sized (|Q| x occupied cells) — broadcast it so the
    # densify never sort-merges
    full = domain.join(F.broadcast(slots), ["qid", "slot"], "left").select(
        "qid", "slot", F.coalesce("term", F.lit(0).cast("long")).alias("term")
    )
    return full.groupBy("qid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("slot", "term"))),
            lambda st: st["term"],
        ).alias("lut")
    )


# NOTE (round 11): the former _LUT_MEMO — a module-level memo of
# trained codebook+LUT rows shared across queries in one process —
# is REMOVED, same reasoning as operators/ivf.py: bench and oracle
# runs must compute every query from the parquet inputs, and a
# cross-query result memo makes later PQ gates record fake-fast
# times. train_key/query_key remain in signatures as the (now inert)
# trained-index identity; they still select the collected-rows
# LocalTableScan shape, computed fresh per call.

_LUT_SCHEMA = T.StructType([
    T.StructField("qid", T.LongType(), False),
    T.StructField("lut", T.ArrayType(T.LongType()), False),
])


def trained_query_lut(
    queries: DataFrame, candidates: DataFrame, *,
    id_col: str = "vec_id", vec_col: str = "embedding",
    train_key: str | None = None,
    query_key: str | None = None,
) -> DataFrame:
    """(qid, lut) ADC table. When `train_key` (an identifier for the
    CANDIDATE data, e.g. the sf_dir) AND `query_key` (an identifier
    for the QUERY set, e.g. the predicate string) are both given,
    the returned frame is a LocalTableScan of collected exact-integer
    rows — the ideal broadcast side (no shuffle subplan re-executed
    per consumer) — computed FRESH on every call (the former
    cross-query memo is removed; see the module note). With
    train_key=None behaves like the raw distributed pipeline (no
    collect), which is what unit tests exercise (including the
    numpy/JVM equivalence pin in tests/test_pq.py).

    Training shape on a miss (the MLlib fit() discipline): the
    CANDIDATE side — the 100 TB side — is reduced by the distributed
    `pq_codebook` aggregate to 16 Ki exact-integer rows, which are
    collected like any trained model. The per-QUERY lookup table is
    then pure int64 einsum over (collected queries x codebook) —
    query-side state that never scales with the corpus, so computing
    it driver-side removes three shuffles (query explode/join/densify)
    from the hot path.
    """
    spark = queries.sparkSession
    collected = train_key is not None and query_key is not None
    cb = pq_codebook(candidates, id_col=id_col, vec_col=vec_col)
    if not collected:
        return pq_query_lut(queries, cb, id_col=id_col, vec_col=vec_col)
    rows = _train_lut_rows(
        queries, cb, id_col=id_col, vec_col=vec_col
    )
    return _lut_frame(spark, rows)


def _lut_frame(spark, rows: list[tuple]) -> DataFrame:
    """Materialize collected LUT rows through an Arrow table, not a
    Python list: createDataFrame(list) ships pickled slices whose
    per-row verification re-runs in every downstream job (the
    broadcast side here is re-evaluated per consumer), measured 3-10x
    the Arrow path's cost (see operators/cluster.py for the same
    pathology on closure labels)."""
    import pyarrow as pa

    tbl = pa.table(
        {
            "qid": pa.array([r[0] for r in rows], pa.int64()),
            "lut": pa.array(
                [r[1] for r in rows], pa.list_(pa.int64())
            ),
        }
    )
    return spark.createDataFrame(tbl, _LUT_SCHEMA)


def _train_lut_rows(queries: DataFrame, codebook: DataFrame, *,
                    id_col: str, vec_col: str) -> list[tuple]:
    """Collect codebook + queries and compute the ADC table with exact
    int64 numpy — bit-identical to pq_query_lut (numpy's % and // are
    Python-style floor ops, so the divisibility trick reduces to plain
    floor division; the pipeline's ((dot % n + n) % n) exists only to
    reconcile Spark's truncating div with flooring engines)."""
    import numpy as np

    cb_tbl = codebook.toArrow()
    cb_m = np.asarray(cb_tbl.column("m").to_pylist(), dtype=np.int64)
    cb_cell = np.asarray(cb_tbl.column("cell").to_pylist(), dtype=np.int64)
    cb_idx = np.asarray(cb_tbl.column("idx").to_pylist(), dtype=np.int64)
    cb_s = np.asarray(cb_tbl.column("s").to_pylist(), dtype=np.int64)
    cb_n = np.asarray(cb_tbl.column("n").to_pylist(), dtype=np.int64)

    q_tbl = queries.select(
        F.col(id_col).alias("qid"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(Q_COMP)).cast("long"),
        ).alias("q"),
    ).toArrow()
    qids = q_tbl.column("qid").to_pylist()
    qmat = np.asarray(q_tbl.column("q").to_pylist(), dtype=np.int64)
    qmat = qmat.reshape(len(qids), M_SUB, D_SUB)

    # dense [M, CELLS, D_SUB] sums and [M, CELLS] sizes (0 = absent)
    s_dense = np.zeros((M_SUB, CELLS, D_SUB), dtype=np.int64)
    n_dense = np.zeros((M_SUB, CELLS), dtype=np.int64)
    sub_idx = cb_idx - cb_m * D_SUB
    s_dense[cb_m, cb_cell, sub_idx] = cb_s
    n_dense[cb_m, cb_cell] = cb_n

    # dot[q, m, cell] = sum_j qmat[q, m, j] * s_dense[m, cell, j]
    dots = np.einsum("qmj,mcj->qmc", qmat, s_dense)
    safe_n = np.maximum(n_dense, 1)
    terms = np.where(n_dense > 0, dots // safe_n, 0)
    flat = terms.reshape(len(qids), M_SUB * CELLS)
    return [(int(qid), row.tolist()) for qid, row in zip(qids, flat)]


def pq_topk(queries: DataFrame, candidates: DataFrame, *, k: int = 5,
            id_col: str = "vec_id", vec_col: str = "embedding",
            train_key: str | None = None,
            query_key: str | None = None) -> DataFrame:
    """(qid, cid, score, rank): ADC top-k per query.

    Candidates carry only their M codes; the broadcast LUT turns pair
    scoring into an M-term array fold inside whole-stage codegen.
    `score` is the exact integer sum of per-subspace mean dots
    (micro-unit^2 scale — monotone in the ADC inner product, which is
    all a ranking needs).
    """
    lut = trained_query_lut(
        queries, candidates, id_col=id_col, vec_col=vec_col,
        train_key=train_key, query_key=query_key,
    )
    cand = candidates.select(
        F.col(id_col).alias("cid"), subspace_codes(vec_col).alias("codes")
    )
    # UNROLLED static sum, not aggregate(sequence(...), lambda):
    # lambda higher-order functions are CodegenFallback, so the
    # M-step interpreted fold ran per (query, candidate) PAIR — the
    # widest frame of every ADC ranking. M literal GetArrayItem
    # terms stay inside whole-stage codegen (measured ~2x on a 150k
    # pair A/B, identical sums).
    score = F.expr(
        " + ".join(
            f"lut[{m * CELLS} + codes[{m}]]" for m in range(M_SUB)
        )
    )
    pairs = (
        cand.join(F.broadcast(lut))
        .where(F.col("qid") != F.col("cid"))
        .select("qid", "cid", score.alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("cid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "cid", F.col("score").cast("long").alias("score"), "rank")
    )


def pq_topk_in_cells(queries: DataFrame, candidates: DataFrame, *, k: int = 3,
                     coarse_bits: int = 4, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     train_key: str | None = None,
                     query_key: str | None = None) -> DataFrame:
    """IVF x PQ: the billion-scale composition.

    The coarse quantizer (sign-bit cells, operators/semantic.py —
    trained analogue in operators/ivf.py) bounds each query's
    candidate set to its own cell; PQ/ADC compresses the scoring
    inside the cell. The coarse join replaces pq_topk's broadcast
    cross product with a cell equi-join, so pair count drops by the
    cell count while the per-pair cost stays M lookups — the two
    prunings are orthogonal and multiply. Subspace codebooks are
    GLOBAL (trained on the full candidate set), the standard IVF-PQ
    layout without residual encoding.
    """
    from hha_spark.operators.semantic import signbit_cell

    lut = trained_query_lut(
        queries, candidates, id_col=id_col, vec_col=vec_col,
        train_key=train_key, query_key=query_key,
    )
    # multi-probe: each query searches its own cell plus every
    # hamming-1 neighbor (flip one coarse bit) — the standard IVF
    # trick recovering the recall a hard cell boundary destroys, at
    # (coarse_bits + 1)x the candidate volume. Probe cells are
    # distinct, so no pair is generated twice.
    base = signbit_cell(vec_col, bits=coarse_bits)
    probes = F.array(
        base, *[base.bitwiseXOR(F.lit(1 << j)) for j in range(coarse_bits)]
    )
    qcells = queries.select(
        F.col(id_col).alias("qid"), F.explode(probes).alias("cell")
    )
    cand = candidates.select(
        F.col(id_col).alias("cid"),
        signbit_cell(vec_col, bits=coarse_bits).alias("cell"),
        subspace_codes(vec_col).alias("codes"),
    )
    # UNROLLED static sum, not aggregate(sequence(...), lambda):
    # lambda higher-order functions are CodegenFallback, so the
    # M-step interpreted fold ran per (query, candidate) PAIR — the
    # widest frame of every ADC ranking. M literal GetArrayItem
    # terms stay inside whole-stage codegen (measured ~2x on a 150k
    # pair A/B, identical sums).
    score = F.expr(
        " + ".join(
            f"lut[{m * CELLS} + codes[{m}]]" for m in range(M_SUB)
        )
    )
    pairs = (
        cand.join(F.broadcast(lut.join(qcells, "qid")), on="cell")
        .where(F.col("qid") != F.col("cid"))
        .select("qid", "cid", score.alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("cid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "cid", F.col("score").cast("long").alias("score"), "rank")
    )


def pq_topk_in_cells_residual(
    queries: DataFrame, candidates: DataFrame, *, k: int = 3,
    coarse_bits: int = 4, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF x PQ WITH residual encoding — the full billion-scale
    layout (Jégou et al. §V: IVFADC). pq_topk_in_cells quantizes raw
    vectors, wasting codebook resolution on the coarse offset every
    cell-mate shares; here each candidate stores codes of its RESIDUAL
    v - centroid(cell), and the pair score decomposes exactly:

        dot(q, c) = dot(q, centroid(cell_c)) + dot(q, residual_c)

    The first term is one exact integer per (query, probed cell); the
    second is the same M-lookup ADC as before, but against codebooks
    trained on residuals — the distribution PQ actually compresses
    well. Everything stays in the micro-unit integer domain: centroid
    means are exact floor-divisions (pymod-adjusted so Spark's
    truncating div and flooring engines agree), residuals are integer
    differences, so the ranking replays bit-for-bit in the oracle.

    Plan shape: centroid means are a 2^bits x D broadcast (collapsed
    to per-cell arrays); candidates compute residual + codes IN-ROW
    off that broadcast (single pass, like pq_codebook); the residual
    codebook is one skinny aggregate; scoring joins the candidate scan
    against a broadcast (LUT x probe-cells x centroid-term) frame on
    the coarse cell — identical join topology to the non-residual
    variant, so the 100 TB story carries over unchanged.
    """
    from hha_spark.operators.semantic import signbit_cell

    quant = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(Q_COMP)).cast("long"),
    )

    # --- coarse centroids: exact integer means per (cell, idx) -----
    cand_base = candidates.select(
        F.col(id_col).alias("cid"),
        signbit_cell(vec_col, bits=coarse_bits).alias("cell"),
        quant.alias("qs"),
    )
    cent = (
        cand_base.select("cell", F.posexplode("qs").alias("idx", "q"))
        .groupBy("cell", "idx")
        .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "cell", "idx",
            F.expr("(s - ((s % n + n) % n)) div n").alias("cm"),
        )
    )
    # collapse to (cell, cm_arr) for in-row residual computation
    cent_arr = cent.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "cm"))),
            lambda st: st["cm"],
        ).alias("cm_arr")
    )

    # --- candidate residuals + residual subspace codes, in-row -----
    rbits = " + ".join(
        f"{1 << j} * CAST(rs[m * {D_SUB} + {j}] >= 0 AS INT)"
        for j in range(D_SUB)
    )
    cand_res = cand_base.join(F.broadcast(cent_arr), on="cell").select(
        "cid", "cell",
        F.expr("zip_with(qs, cm_arr, (q, c) -> q - c)").alias("rs"),
    ).select(
        "cid", "cell", "rs",
        F.expr(f"transform(sequence(0, {M_SUB - 1}), m -> {rbits})")
        .alias("rcodes"),
    )

    # --- residual codebook: skinny combinable aggregate ------------
    rcb = (
        cand_res.select(
            F.posexplode("rs").alias("idx", "r"), F.col("rcodes")
        )
        .select(
            "idx", "r",
            (F.col("idx") / F.lit(D_SUB)).cast("int").alias("m"),
            F.expr(f"rcodes[CAST(idx / {D_SUB} AS INT)]").alias("cell"),
        )
        .groupBy("m", "cell", "idx")
        .agg(F.sum("r").alias("s"), F.count(F.lit(1)).alias("n"))
    )

    # --- per-query state: residual ADC LUT + centroid dot terms ----
    lut = pq_query_lut(queries, rcb, id_col=id_col, vec_col=vec_col)
    q_el = _quantized_el(queries, id_col=id_col, vec_col=vec_col)
    qcent = (
        q_el.join(F.broadcast(cent), on="idx")
        .groupBy(F.col("vec_id").alias("qid"), "cell")
        .agg(F.sum(F.col("q") * F.col("cm")).alias("qc"))
    )
    base_cell = signbit_cell(vec_col, bits=coarse_bits)
    probes = F.array(
        base_cell,
        *[base_cell.bitwiseXOR(F.lit(1 << j)) for j in range(coarse_bits)],
    )
    qcells = queries.select(
        F.col(id_col).alias("qid"), F.explode(probes).alias("cell")
    )
    # every factor is |Q|-scale; broadcast the two smaller ones so the
    # query-side assembly never sort-merges (plan-audited)
    qside = lut.join(F.broadcast(qcells), on="qid").join(
        F.broadcast(qcent), on=["qid", "cell"]
    )

    # --- scoring: centroid term + M residual lookups ---------------
    # unrolled for the same codegen reason as the ADC kernels above
    score = F.expr(
        "qc + " + " + ".join(
            f"lut[{m * CELLS} + rcodes[{m}]]" for m in range(M_SUB)
        )
    )
    pairs = (
        cand_res.join(F.broadcast(qside), on="cell")
        .where(F.col("qid") != F.col("cid"))
        .select("qid", "cid", score.alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("cid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "cid", F.col("score").cast("long").alias("score"), "rank")
    )
