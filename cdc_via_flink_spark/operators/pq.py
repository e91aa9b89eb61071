"""Product quantization (PQ) with asymmetric distance computation —
the memory-compression half of a production IVF-PQ ANN index
(SURVEY.md X2 scale path; the reference has no vector surface at all —
this extends the engine for the embedding workloads the mandate adds).

A 64-dim float vector becomes M=8 one-byte codes (32× smaller than
float32): split each vector into M contiguous subvectors, train a
K=16-entry codebook per subspace (Lloyd's iterations, L2 metric on
normalized vectors), store each subvector's nearest-codeword index.
Query time is ADC: one M×K lookup table of exact query-to-codeword dot
products per query, then every corpus score is M table lookups —
approximating cosine (vectors are normalized first, so dot == cosine).

Spark shape, built-ins only (no UDFs, no Python on the corpus path):

- codebooks live in ONE broadcast row (``cb[m][k][d]`` nested arrays),
  so encode/score are pure per-row expressions: the corpus is NEVER
  shuffled until the final bounded top-k window (which Catalyst caps
  via WindowGroupLimit, see scripts/bench_topk_stress.py);
- training shuffles only (M × K × d_sub) partial-mean keys per
  iteration — independent of corpus size, the kmeans.py property;
- determinism: every-Kth-vector init, fixed iteration count, rounded
  distances with first-match argmin, id tie-breaks — reproducible
  across engines, runs, and cluster sizes.

Iterative training is not SQL-expressible, so the declared query
(sim_pq_topk) follows the house rows-only pattern: in-query recall@k
columns against the exact brute-force top-k with an asserted floor
(plans/similarity_queries.py); invariants in tests/test_pq.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from cdc_via_flink_spark.functions.vectors import dot, norm, to_double


def _normalized(vec: Column) -> Column:
    n = norm(vec)
    return F.transform(vec, lambda x: x / n)


def _sub(v: Column, m: Column | int, d_sub: int) -> Column:
    """Subvector m (0-based) of a flat vector: slice is 1-based."""
    m_col = F.lit(m) if isinstance(m, int) else m
    return F.slice(v, m_col * d_sub + 1, d_sub)


def _l2sq(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _codes_expr(v: Column, cb: Column, m: int, d_sub: int) -> Column:
    """codes[m] = argmin_k L2(v_sub_m, cb[m][k]) as a pure expression.

    Distances are rounded (6 d.p.) and argmin is array_position's
    FIRST match, so ties break toward the lower code deterministically.
    """

    def code_for(mi: Column) -> Column:
        dists = F.transform(
            cb[mi], lambda c: F.round(_l2sq(_sub(v, mi, d_sub), c), 6)
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    return F.transform(F.sequence(F.lit(0), F.lit(m - 1)), code_for)


def pq_fit(
    corpus: DataFrame,
    m: int = 8,
    codebook_k: int = 16,
    max_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Train per-subspace codebooks on NORMALIZED vectors; returns a
    ONE-row frame with column ``cb``: array<array<array<double>>>
    indexed [m][k][d_sub]. See _fit_vdf for the training recipe."""
    v_df = corpus.select(
        F.col(id_col).alias("vec_id"),
        _normalized(to_double(F.col(vec_col))).alias("v"),
    )
    return _fit_vdf(v_df, m=m, codebook_k=codebook_k, max_iter=max_iter)


def _fit_vdf(
    v_df: DataFrame, m: int, codebook_k: int, max_iter: int
) -> DataFrame:
    """Codebook training over a prepared (vec_id, v) frame — shared by
    flat PQ (normalized vectors) and IVF-PQ (cluster residuals, NOT
    normalized: residual geometry must be preserved).

    Init: for each subspace, codeword k starts as the subvector of the
    (k * ceil(n / K))-th vector (deterministic spread). Each Lloyd
    iteration assigns codes with the same expression the encoder uses
    and replaces each codeword by its members' per-dimension mean
    (empty codewords keep their previous value so code indices never
    shift)."""
    # one tiny scalar job for BOTH fit probes (n and dim) — a 1-row
    # broadcastable aggregate; precedent: ivf.py centroids. min(size)
    # is deterministic where first() is not, and the fixed-dim
    # invariant makes min == every row's size.
    n, d = v_df.agg(
        F.count(F.lit(1)).alias("n"), F.min(F.size("v")).alias("d")
    ).head()
    stride = max(1, -(-n // codebook_k))  # ceil
    d_sub = d // m
    if d_sub * m != d:
        raise ValueError(f"dim {d} not divisible into {m} subvectors")

    # init cb row: pick the k-th init vector per codeword, slice per sub
    init = (
        v_df.filter((F.col("vec_id") % stride == 0) & (F.col("vec_id") / stride < codebook_k))
        .select((F.col("vec_id") / stride).cast("int").alias("k"), "v")
    )
    cb_row = init.groupBy().agg(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda mi: F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("k"), F.col("v")))),
                lambda s: F.slice(s.getField("v"), mi * d_sub + 1, d_sub),
            ),
        ).alias("cb")
    )

    for _ in range(max_iter):
        coded = v_df.crossJoin(F.broadcast(cb_row)).select(
            "v", _codes_expr(F.col("v"), F.col("cb"), m, d_sub).alias("codes")
        )
        # (sub, code, dim) partial means: M*K*d_sub keys, corpus-size
        # independent — the only shuffle in training.
        upd = (
            coded.select(
                F.posexplode(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(m - 1)),
                        lambda mi: F.struct(
                            F.element_at("codes", mi + 1).alias("code"),
                            _sub(F.col("v"), mi, d_sub).alias("sv"),
                        ),
                    )
                ).alias("sub", "sc")
            )
            .select("sub", F.col("sc.code").alias("code"), F.posexplode("sc.sv").alias("dim", "x"))
            .groupBy("sub", "code", "dim")
            .agg(F.avg("x").alias("mu"))
            .groupBy("sub", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "mu"))),
                    lambda s: s.getField("mu"),
                ).alias("newc")
            )
        )
        # fold updates back into the single cb row; empty codewords
        # keep their previous centroid (indices must not shift).
        # posexplode positions are 0-based, matching the code values.
        prev = cb_row.select(
            F.posexplode("cb").alias("sub", "cbm")
        ).select(
            "sub",
            F.posexplode("cbm").alias("code", "oldc"),
        )
        merged = prev.join(upd, ["sub", "code"], "left").select(
            "sub", "code", F.coalesce("newc", "oldc").alias("c")
        )
        cb_row = (
            merged.groupBy("sub")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("code", "c"))),
                    lambda s: s.getField("c"),
                ).alias("cbm")
            )
            .groupBy()
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sub", "cbm"))),
                    lambda s: s.getField("cbm"),
                ).alias("cb")
            )
            .localCheckpoint(eager=True)
        )
    return cb_row


def pq_topk(
    corpus: DataFrame,
    query_ids_below: int = 5,
    m: int = 8,
    codebook_k: int = 16,
    max_iter: int = 2,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ-ADC top-k: returns (query_id, vec_id, score, rn). ``score``
    is the ADC-approximate cosine (normalized-vector dot via codebook
    lookups), rounded to 6 d.p. with vec_id tie-break."""
    cb_row = pq_fit(
        corpus, m=m, codebook_k=codebook_k, max_iter=max_iter,
        vec_col=vec_col, id_col=id_col,
    )
    # dim off the checkpointed 1-row codebook (free) — no corpus scan
    d_sub = len(cb_row.head()["cb"][0][0])

    v_df = corpus.select(
        F.col(id_col).alias("vec_id"),
        _normalized(to_double(F.col(vec_col))).alias("v"),
    )
    encoded = v_df.crossJoin(F.broadcast(cb_row)).select(
        "vec_id", _codes_expr(F.col("v"), F.col("cb"), m, d_sub).alias("codes")
    )

    # Per-query ADC lookup table: lut[m][k] = dot(q_sub_m, cb[m][k]) —
    # exact dot products against codewords, M*K doubles per query.
    queries = v_df.filter(F.col("vec_id") < query_ids_below).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    luts = queries.crossJoin(F.broadcast(cb_row)).select(
        "query_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda mi: F.transform(
                F.col("cb")[mi], lambda c: dot(_sub(F.col("qv"), mi, d_sub), c)
            ),
        ).alias("lut"),
    )

    # Score every corpus code array against every (broadcast) query
    # LUT: M element_at lookups per pair, zero corpus shuffle.
    scored = encoded.crossJoin(F.broadcast(luts)).filter(
        F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        F.round(
            F.aggregate(
                F.sequence(F.lit(0), F.lit(m - 1)),
                F.lit(0.0),
                lambda acc, mi: acc
                + F.element_at(
                    F.col("lut")[mi], F.element_at("codes", mi + 1) + 1
                ),
            ),
            6,
        ).alias("score"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "score", "rn")
    )


def pq_rerank_topk(
    corpus: DataFrame,
    query_ids_below: int = 5,
    m: int = 8,
    codebook_k: int = 16,
    max_iter: int = 2,
    shortlist: int = 50,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The production PQ pattern: ADC over the compressed codes builds
    a ``shortlist``-sized candidate set per query (the cheap scan —
    codes are 32× smaller than the vectors, so at 100 TB this is the
    only full pass and it reads 1/32nd of the bytes), then ONLY the
    shortlisted original vectors are fetched (bounded semi-join on
    vec_id) and reranked by exact cosine. Returns
    (query_id, vec_id, cos, rn)."""
    cand = pq_topk(
        corpus,
        query_ids_below=query_ids_below,
        m=m,
        codebook_k=codebook_k,
        max_iter=max_iter,
        k=shortlist,
        vec_col=vec_col,
        id_col=id_col,
    ).select("query_id", "vec_id")
    v_df = corpus.select(
        F.col(id_col).alias("vec_id"),
        _normalized(to_double(F.col(vec_col))).alias("v"),
    )
    queries = v_df.filter(F.col("vec_id") < query_ids_below).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    exact = (
        v_df.join(F.broadcast(cand), "vec_id")  # shortlist ids broadcast:
        # the original-vector fetch is a broadcast hash join — the
        # corpus is scanned once and NEVER shuffled for the rerank
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(dot(F.col("v"), F.col("qv")), 6).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        exact.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cos", "rn")
    )


def ivfpq_topk(
    corpus: DataFrame,
    query_ids_below: int = 5,
    every_k: int = 40,
    coarse_iter: int = 2,
    m: int = 8,
    codebook_k: int = 16,
    pq_iter: int = 2,
    nprobe: int = 4,
    shortlist: int = 50,
    k: int = 5,
    train_mod: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Composed IVF + PQ over RESIDUALS — the production ANN index
    layout (FAISS IVFPQ): a coarse k-means partitions the corpus into
    inverted lists; each vector stores only its cluster id + the PQ
    codes of its RESIDUAL (v − centroid), so the exact decomposition
    dot(q, v) = dot(q, c) + dot(q, r) turns scoring into one scalar
    per probed cluster plus M table lookups. Residual codebooks are
    SHARED across clusters (standard; per-cluster books would be K×
    the broadcast). Queries probe ``nprobe`` lists, score candidates
    by ADC, and exact-rerank a ``shortlist``.

    Scale: the corpus shuffles ONCE (by cluster assignment, as in
    ivf.py); codes are 32× smaller than floats; per-query work is
    bounded by probed-list sizes, not corpus size. Returns
    (query_id, vec_id, cos, rn) like the other top-k operators."""
    from cdc_via_flink_spark.operators.kmeans import _nearest, kmeans_fit

    # coarse quantizer on the normalized corpus (cosine geometry)
    norm_corpus = corpus.select(
        F.col(id_col).alias("vec_id"),
        _normalized(to_double(F.col(vec_col))).alias("embedding"),
    )
    # coarse quantizer trained on the xxhash 1/train_mod sample —
    # sublinear fit cost; the corpus is assigned exactly once below
    cents = kmeans_fit(
        norm_corpus, every_k=every_k, max_iter=coarse_iter, train_mod=train_mod
    )
    v_df = norm_corpus.select("vec_id", F.col("embedding").alias("v"))
    assigned = _nearest(v_df, cents)  # (vec_id, v, cluster_id)

    resid = assigned.join(
        F.broadcast(cents),
        assigned.cluster_id == cents.centroid_id,
    ).select(
        "vec_id",
        "cluster_id",
        F.zip_with("v", "cv", lambda x, y: x - y).alias("r"),
    )
    cb_row = _fit_vdf(
        resid.select("vec_id", F.col("r").alias("v")),
        m=m,
        codebook_k=codebook_k,
        max_iter=pq_iter,
    )
    d_sub = len(cb_row.head()["cb"][0][0])  # off the checkpointed row
    codes = resid.crossJoin(F.broadcast(cb_row)).select(
        "vec_id",
        "cluster_id",
        _codes_expr(F.col("r"), F.col("cb"), m, d_sub).alias("codes"),
    )

    queries = v_df.filter(F.col("vec_id") < query_ids_below).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    # probe the nprobe nearest lists; carry dot(q, centroid) — the
    # scalar half of the score decomposition
    q_scored = queries.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "qv",
        "centroid_id",
        F.round(dot(F.col("qv"), F.col("cv")), 9).alias("c_dot"),
    )
    wq = W.partitionBy("query_id").orderBy(F.col("c_dot").desc(), F.col("centroid_id"))
    probes = (
        q_scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", F.col("centroid_id").alias("cluster_id"), "c_dot")
    )
    luts = probes.select("query_id", "qv").distinct().crossJoin(
        F.broadcast(cb_row)
    ).select(
        "query_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda mi: F.transform(
                F.col("cb")[mi], lambda c: dot(_sub(F.col("qv"), mi, d_sub), c)
            ),
        ).alias("lut"),
    )
    cand = (
        probes.join(codes, "cluster_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(luts), "query_id")
    )
    adc = cand.select(
        "query_id",
        "vec_id",
        F.round(
            F.col("c_dot")
            + F.aggregate(
                F.sequence(F.lit(0), F.lit(m - 1)),
                F.lit(0.0),
                lambda acc, mi: acc
                + F.element_at(
                    F.col("lut")[mi], F.element_at("codes", mi + 1) + 1
                ),
            ),
            6,
        ).alias("score"),
    )
    ws = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    short = (
        adc.withColumn("srn", F.row_number().over(ws))
        .filter(F.col("srn") <= shortlist)
        .select("query_id", "vec_id")
    )
    exact = (
        v_df.join(F.broadcast(short), "vec_id")  # same no-corpus-shuffle
        # broadcast fetch as pq_rerank_topk
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(dot(F.col("v"), F.col("qv")), 6).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        exact.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cos", "rn")
    )
