"""Batch model inference as literal JVM expressions.

The reference's final ETL stage loads a trained rpart decision tree
and scores it over PC columns inside each task's R process
(/root/reference/code/use-cases/example_docker/classify-ancestry-trace.r:21-29)
— one model, many rows, the canonical "broadcast the model, stream the
data" shape. The rebuild makes that a first-class operator instead of
a subprocess: the model rides the plan as *literal expressions*
(nested CASE WHEN for trees, dot products for linear models), so
scoring is whole-stage-codegen'd JVM work with zero Python in the
per-row path and zero extra shuffle.

Two model families, both oracle-checkable:

- **linear**: fit IN the engine with the ANSI aggregates
  ``regr_slope`` / ``regr_intercept`` (exact closed form — both Spark
  and DuckDB implement them), optionally per group. The fitted frame
  is GROUPS-sized, broadcast back for scoring. Coefficients are
  rounded before use so both engines score the identical model.
- **tree**: a pinned spec (nested ``(feature, threshold, low, high)``
  tuples, leaves are strings) compiled by the SAME structure into a
  Spark Column and a SQL CASE expression — parity by construction,
  mirroring how a trained rpart/XGBoost tree ships to production as
  generated code.

At 100 TB: the fit is one aggregation (map-side partial regr moments),
the score is a narrow map over the fact scan with a GROUPS-sized
broadcast join — no state, no skew sensitivity, no Python workers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register

# --------------------------------------------------------------------
# literal decision trees

#: nested spec: (feature, threshold, low_subtree, high_subtree) where
#: the low branch takes feature < threshold; leaves are class labels.
TreeSpec = tuple | str

#: pinned example tree over lineitem — the stand-in for a trained
#: rpart model (structure chosen for class balance on the fixture)
ORDER_TREE: TreeSpec = (
    "l_quantity",
    25.0,
    ("l_discount", 0.05, "small-full", "small-discounted"),
    ("l_extendedprice", 30000.0, "bulk-low", "bulk-high"),
)


def tree_column(node: TreeSpec) -> Column:
    """Compile a tree spec into one nested CASE Column (pure JVM)."""
    if isinstance(node, str):
        return F.lit(node)
    feat, thr, lo, hi = node
    return F.when(F.col(feat) < F.lit(thr), tree_column(lo)).otherwise(
        tree_column(hi)
    )


def tree_sql(node: TreeSpec) -> str:
    """The same tree as an ANSI CASE expression — generated from the
    same spec object as :func:`tree_column`, so the two scorers cannot
    drift."""
    if isinstance(node, str):
        return f"'{node}'"
    feat, thr, lo, hi = node
    return (
        f"CASE WHEN {feat} < {thr!r} THEN {tree_sql(lo)} "
        f"ELSE {tree_sql(hi)} END"
    )


def tree_predict(node: TreeSpec, row: dict) -> str:
    """Pure-Python reference evaluator (tests pin both compilers to
    this)."""
    while not isinstance(node, str):
        feat, thr, lo, hi = node
        node = lo if row[feat] < thr else hi
    return node


# --------------------------------------------------------------------
# linear models, fitted in-engine

#: decimals both engines round coefficients to before scoring — the
#: fitted values differ in the last ulps between engines (summation
#: order), the rounded model is identical
COEF_DECIMALS = 6


def linear_fit(
    df: DataFrame,
    y: str,
    x: str,
    by: list[str] | None = None,
    decimals: int = COEF_DECIMALS,
) -> DataFrame:
    """OLS y ~ x (optionally per group): one aggregation using the
    exact ANSI regr_* closed forms. Output is GROUPS-sized (or 1 row):
    (by..., slope, icept)."""
    aggs = [
        F.round(F.regr_slope(F.col(y), F.col(x)), decimals).alias("slope"),
        F.round(F.regr_intercept(F.col(y), F.col(x)), decimals).alias(
            "icept"
        ),
    ]
    return df.groupBy(*(by or [])).agg(*aggs)


def linear_score(
    df: DataFrame, model: DataFrame, y: str, x: str, by: list[str]
) -> DataFrame:
    """Broadcast the GROUPS-sized model frame and append ``pred`` /
    ``resid`` as codegen'd arithmetic."""
    scored = df.join(F.broadcast(model), on=by)
    pred = F.col("icept") + F.col("slope") * F.col(x)
    return scored.withColumn("pred", pred).withColumn(
        "resid", F.col(y) - pred
    )


# --------------------------------------------------------------------
# declared query

#: md5-hex first char < 'c' → 12/16 of rows train the model, the rest
#: are scored — the q_hash_split determinism contract (stable across
#: engines/reruns/partitionings, no RNG state)
_TRAIN_HI = "c"

_MODEL_ORACLE = f"""
WITH keyed AS (
  SELECT l_returnflag, l_quantity, l_discount, l_extendedprice,
         substr(md5(CAST(l_orderkey AS VARCHAR) || ':'
                    || CAST(l_linenumber AS VARCHAR)), 1, 1) AS hx
  FROM lineitem
),
model AS (
  SELECT l_returnflag,
         ROUND(regr_slope(l_extendedprice, l_quantity), {COEF_DECIMALS})
           AS slope,
         ROUND(regr_intercept(l_extendedprice, l_quantity), {COEF_DECIMALS})
           AS icept
  FROM keyed WHERE hx < '{_TRAIN_HI}'
  GROUP BY l_returnflag
),
scored AS (
  SELECT k.l_returnflag,
         {tree_sql(ORDER_TREE)} AS tree_class,
         k.l_extendedprice - (m.icept + m.slope * k.l_quantity) AS resid
  FROM keyed k JOIN model m USING (l_returnflag)
  WHERE k.hx >= '{_TRAIN_HI}'
)
SELECT l_returnflag, tree_class,
       COUNT(*) AS n_scored,
       ROUND(SQRT(AVG(resid * resid)), 2) AS rmse,
       ROUND(AVG(ABS(resid)), 2) AS mae
FROM scored
GROUP BY l_returnflag, tree_class
"""


@register("q_model_score", oracle=_MODEL_ORACLE)
def q_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-and-score batch inference, entirely in-plan.

    Hash-split lineitem (md5 key prefix, engine-portable) into a 75%
    train / 25% score partition; fit a per-returnflag OLS of
    extendedprice on quantity with the exact regr_* aggregates; score
    the held-out rows through the broadcast 3-row model AND the pinned
    literal decision tree; report per (flag, tree class) count, RMSE
    and MAE. The scoring scan is pure codegen'd expressions — the
    native replacement for the reference's per-task rpart subprocess
    (classify-ancestry-trace.r:21-29).
    """
    keyed = spark.table("lineitem").select(
        "l_returnflag",
        "l_quantity",
        "l_discount",
        "l_extendedprice",
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            1,
            1,
        ).alias("hx"),
    )
    model = linear_fit(
        keyed.filter(F.col("hx") < _TRAIN_HI),
        y="l_extendedprice",
        x="l_quantity",
        by=["l_returnflag"],
    )
    scored = linear_score(
        keyed.filter(F.col("hx") >= _TRAIN_HI),
        model,
        y="l_extendedprice",
        x="l_quantity",
        by=["l_returnflag"],
    ).withColumn("tree_class", tree_column(ORDER_TREE))
    return scored.groupBy("l_returnflag", "tree_class").agg(
        F.count("*").alias("n_scored"),
        F.round(F.sqrt(F.avg(F.col("resid") * F.col("resid"))), 2).alias(
            "rmse"
        ),
        F.round(F.avg(F.abs("resid")), 2).alias("mae"),
    )


# --------------------------------------------------------------------
# logistic regression (IRLS), fitted by iterated aggregations

#: IRLS iterations / ridge / probability clamp — fixed so the fit is
#: deterministic across runs and machines
IRLS_ITERS = 8
IRLS_RIDGE = 1e-3
_MU_EPS = 1e-6


def logistic_fit(
    df: DataFrame,
    y: str,
    xs: list[str],
    iters: int = IRLS_ITERS,
    ridge: float = IRLS_RIDGE,
) -> np.ndarray:
    """IRLS logistic fit of ``y`` (0/1 column) on ``xs``; returns
    [intercept, coef...].

    Each iteration is ONE aggregation: the weighted normal-equation
    moments XᵀWX ((p+1)² scalars) and XᵀWz (p+1 scalars) computed as
    explicit column products — the per-row working weights/response
    derive from the CURRENT coefficients riding in as literals, so
    every pass is whole-stage-codegen'd JVM work and the driver only
    ever sees a (p+1)(p+2)-number moment row. A ridge term keeps the
    solve stable when classes are (near-)separable; the feature frame
    should be persisted by the caller (it is scanned once per
    iteration).

    numpy is driver-side only: the solve of a (p+1)×(p+1) system.
    """
    import numpy as _np

    cols = [F.lit(1.0)] + [F.col(c).cast("double") for c in xs]
    p1 = len(cols)
    beta = _np.zeros(p1)
    for _ in range(iters):
        eta = sum(
            (float(beta[i]) * cols[i] for i in range(1, p1)),
            F.lit(float(beta[0])),
        )
        mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        mu = F.least(F.greatest(mu, F.lit(_MU_EPS)), F.lit(1.0 - _MU_EPS))
        w = mu * (F.lit(1.0) - mu)
        z = eta + (F.col(y).cast("double") - mu) / w
        aggs = []
        for i in range(p1):
            for j in range(i, p1):
                aggs.append(
                    F.sum(w * cols[i] * cols[j]).alias(f"xx_{i}_{j}")
                )
        for i in range(p1):
            aggs.append(F.sum(w * cols[i] * z).alias(f"xz_{i}"))
        row = df.agg(*aggs).first()
        if row["xx_0_0"] is None:
            raise ValueError(
                "logistic_fit needs a non-empty training frame"
            )
        xtwx = _np.zeros((p1, p1))
        xtwz = _np.zeros(p1)
        for i in range(p1):
            for j in range(i, p1):
                xtwx[i, j] = xtwx[j, i] = row[f"xx_{i}_{j}"] or 0.0
            xtwz[i] = row[f"xz_{i}"] or 0.0
        beta = _np.linalg.solve(xtwx + ridge * _np.eye(p1), xtwz)
    return beta


#: published logistic model: P(long_doc | n_toks, mean_wlen) fitted
#: once by the in-engine IRLS trainer above (8 iterations, ridge 1e-3,
#: sf0.01 train split hx < 'c'), coefficients rounded to 4 dp and
#: FROZEN — batch inference with a shipped model is the 100 TB path
#: (training happens once; scoring scans everything). The trainer
#: itself stays pinned by tests/test_model.py (numpy-IRLS parity and
#: test_logit_frozen_model_agrees_with_refit).
LOGIT_BETA = (-71.125, 0.9169, 5.4121)
#: decision cutoff in LINEAR (log-odds) space: eta >= logit(train
#: prevalence 0.6173). Comparing eta — a fixed-order polynomial of
#: exact doubles — avoids exp(), so Spark and the SQL oracle decide
#: every row bit-identically.
LOGIT_ETA_CUT = 0.4781

_LOGIT_ORACLE = f"""
WITH keyed AS (
  SELECT CAST(length(text) >= 250 AS INTEGER) AS long_doc,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_toks,
         length(text) * 1.0
           / greatest(len(string_split(text, ' ')), 1) AS mean_wlen,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS hx
  FROM documents
),
scored AS (
  SELECT long_doc AS actual,
         CAST({LOGIT_BETA[0]} + {LOGIT_BETA[1]} * n_toks
              + {LOGIT_BETA[2]} * mean_wlen >= {LOGIT_ETA_CUT}
              AS INTEGER) AS predicted
  FROM keyed WHERE hx >= '{_TRAIN_HI}'
)
SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n
FROM scored GROUP BY actual, predicted
ORDER BY actual, predicted
"""


@register("q_logit_score", oracle=_LOGIT_ORACLE)
def q_logit_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic batch inference over the held-out hash split: label
    documents long (n_chars ≥ 250), score P(long | token count, mean
    word length) through the PUBLISHED literal coefficients
    (``LOGIT_BETA``, fitted once by the in-engine IRLS trainer and
    frozen), decide in log-odds space at ``LOGIT_ETA_CUT``, and report
    the confusion matrix.

    The label is a genuine but NONLINEAR function of the features
    (chars ≈ tokens × word length), so the linear model holds a real
    boundary rather than memorizing a column. The decision compares
    eta = b0 + b1·x1 + b2·x2 — multiplications and additions of exact
    doubles in a fixed order, no exp() — so the DuckDB oracle replays
    every per-row decision bit-identically (VERDICT r07 item 5; the
    q_score_calibrate literal-replay pattern). Trainer parity vs a
    pure-numpy IRLS and the no-Python-stage plan stay pinned in
    tests/test_model.py."""
    toks = F.split("text", " ")
    keyed = spark.table("documents").select(
        (F.length("text") >= 250).cast("int").alias("long_doc"),
        F.size(toks).cast("double").alias("n_toks"),
        (
            F.length("text") / F.greatest(F.size(toks), F.lit(1))
        ).alias("mean_wlen"),
        F.substring(
            F.md5(F.col("doc_id").cast("string")), 1, 1
        ).alias("hx"),
    )
    eta = (
        F.lit(LOGIT_BETA[0])
        + F.lit(LOGIT_BETA[1]) * F.col("n_toks")
        + F.lit(LOGIT_BETA[2]) * F.col("mean_wlen")
    )
    scored = keyed.filter(F.col("hx") >= _TRAIN_HI).select(
        F.col("long_doc").alias("actual"),
        (eta >= F.lit(LOGIT_ETA_CUT)).cast("int").alias("predicted"),
    )
    return (
        scored.groupBy("actual", "predicted")
        .agg(F.count("*").alias("n"))
        .orderBy("actual", "predicted")
    )


# --------------------------------------------------------------------
# k-fold cross-validation from sufficient statistics

K_FOLDS = 5

_CV_ORACLE = f"""
WITH keyed AS (
  SELECT l_quantity AS x, l_extendedprice AS y,
         CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':'
                             || CAST(l_linenumber AS VARCHAR)), 1, 2)
              AS INTEGER) % {K_FOLDS} AS fold
  FROM lineitem
),
fold_stats AS (
  SELECT fold, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM keyed GROUP BY fold
),
totals AS (
  SELECT SUM(n) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
         SUM(sxy) AS sxy, SUM(sxx) AS sxx
  FROM fold_stats
),
models AS (
  SELECT f.fold,
         ROUND((t.sxy - f.sxy - (t.sx - f.sx) * (t.sy - f.sy) / (t.n - f.n))
               / (t.sxx - f.sxx - (t.sx - f.sx) * (t.sx - f.sx) / (t.n - f.n)),
               6) AS slope,
         ROUND((t.sy - f.sy) / (t.n - f.n)
               - ((t.sxy - f.sxy - (t.sx - f.sx) * (t.sy - f.sy) / (t.n - f.n))
                  / (t.sxx - f.sxx - (t.sx - f.sx) * (t.sx - f.sx) / (t.n - f.n)))
                 * (t.sx - f.sx) / (t.n - f.n),
               6) AS icept
  FROM fold_stats f CROSS JOIN totals t
)
SELECT k.fold, COUNT(*) AS n_test, m.slope, m.icept,
       ROUND(SQRT(AVG((k.y - (m.icept + m.slope * k.x))
                      * (k.y - (m.icept + m.slope * k.x)))), 2) AS rmse
FROM keyed k JOIN models m ON k.fold = m.fold
GROUP BY k.fold, m.slope, m.icept
"""


@register("q_crossval", oracle=_CV_ORACLE)
def q_crossval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation of the OLS model in TWO passes total,
    independent of k.

    The naive form refits k times (k scans); the scale shape computes
    per-fold sufficient statistics (n, Σx, Σy, Σxy, Σx²) in ONE
    aggregation, derives every fold's leave-that-fold-out model by
    SUBTRACTING its stats from the totals (GROUPS-sized arithmetic —
    the same trick jackknife/LOO estimators use), and scores each
    fold against its own held-out model in one more pass with the
    k-row model table broadcast. Fold assignment is the engine-
    portable md5 hash (q_hash_split contract), so both engines build
    identical folds; coefficients round before scoring so both score
    the identical models.

    The narrow 4-column projection is spread (session.spread) before
    the md5 fold expression: both passes compute it, and the fixture
    scan's 3 parquet splits otherwise cap those stages at 3 tasks;
    the spread exchanges canonicalize identically so ReuseExchange
    ships the rebalance once (r10).

    The explicit ``fold IS NOT NULL`` filter on ``keyed`` is a no-op
    on the data (md5 over non-null key casts never yields NULL) but
    load-bearing for the plan (r13): the inner model join infers
    isnotnull(fold) into the scoring and fold-stats branches' scans,
    while the totals derivation carried no such filter — so its spread
    exchange canonicalized DIFFERENTLY and ReuseExchange left an extra
    full scan + md5 pass live (the r10 note above was only 2/3 true:
    the executed plan showed two concurrent 3-task rebalance stages).
    With the filter stated once on keyed, the subtrees canonicalize
    equal and the duplicate exchange dedups at runtime: executed
    (isFinalPlan=true) plan goes 8 parquet scans / 2 ReusedExchange →
    7 scans / 4 ReusedExchange (plans/r13/q_crossval_*.txt). sf0.1
    wall-clock is parity-in-noise in an interleaved in-process A/B
    (best 2.11 → 2.11 s, then 1.54 → 1.83 s on the rerun — the extra
    stage overlaps other subtrees on 32 idle cores); the claim is the
    removed duplicate corpus scan + md5 pass, which at 100 TB is a
    full extra pass over the table, not the local seconds. Output
    oracle-verified at sf0.001/0.01/0.1 after the change.
    """
    from pyanamo_spark.session import spread

    keyed = spread(
        spark.table("lineitem"),
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
    ).select(
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
        # engine-portable fold: first md5 hex byte as int (q_hash_split
        # determinism contract; 256 values mod 5 is near-uniform)
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("l_orderkey").cast("string"),
                            F.col("l_linenumber").cast("string"),
                        )
                    ),
                    1,
                    2,
                ),
                16,
                10,
            ).cast("int")
            % K_FOLDS
        ).cast("long").alias("fold"),
    ).filter(F.col("fold").isNotNull())
    fold_stats = keyed.groupBy("fold").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    totals = fold_stats.agg(
        F.sum("n").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxy").alias("tsxy"),
        F.sum("sxx").alias("tsxx"),
    )
    cn = F.col("tn") - F.col("n")
    csx = F.col("tsx") - F.col("sx")
    csy = F.col("tsy") - F.col("sy")
    csxy = F.col("tsxy") - F.col("sxy")
    csxx = F.col("tsxx") - F.col("sxx")
    slope = (csxy - csx * csy / cn) / (csxx - csx * csx / cn)
    models = fold_stats.crossJoin(F.broadcast(totals)).select(
        "fold",
        F.round(slope, 6).alias("slope"),
        F.round(csy / cn - slope * csx / cn, 6).alias("icept"),
    )
    resid = F.col("y") - (F.col("icept") + F.col("slope") * F.col("x"))
    return (
        keyed.join(F.broadcast(models), "fold")
        .groupBy("fold", "slope", "icept")
        .agg(
            F.count("*").alias("n_test"),
            F.round(F.sqrt(F.avg(resid * resid)), 2).alias("rmse"),
        )
        .select("fold", "n_test", "slope", "icept", "rmse")
    )
