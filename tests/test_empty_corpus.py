"""Empty-corpus contract: every declared query must either return an
empty result with its normal schema or raise a clear ValueError from a
model-fit step — never crash deep inside Spark. (A sub-span-length
document bug that motivated this net: plans that look right on the
fixture can throw at runtime on degenerate rows.)"""

from __future__ import annotations

import pytest

from pyanamo_spark.catalog import TABLES
from pyanamo_spark.registry import QUERIES, load_all

load_all()

#: model-fit queries that cannot produce a model from nothing; their
#: contract is a clear ValueError, not an empty result
#: (q_logit_score left this set in r08 — it now scores through frozen
#: literal coefficients and must return an EMPTY confusion matrix)
FIT_QUERIES = {
    "q_pca_project",
    "q_knn_ivf",
    "q_semantic_prune",
    # builds the same IVF quantizer as q_knn_ivf (write_index), so the
    # lifecycle certification raises the same clear no-model ValueError
    "q_index_lifecycle",
}

#: queries whose CORRECT empty-input output is non-empty: ungrouped
#: aggregates yield their single zero/null row (SQL semantics), the
#: funnel reports all stages at zero, and the MERGE's literal updates
#: batch inserts into the empty store
NONEMPTY_ON_EMPTY = {
    "q_threshold_counts",
    "q_dedup_stats",
    "q_small_qty_revenue",
    "q_brand_revenue",
    "q_promo_share",
    "q_revenue_forecast",
    "q_funnel",
    "q_merge_upsert",
    "q_ingest_csv",  # ingests its own literal CSV; corpus-independent
    "q_curation_funnel",  # funnel report: 5 stage rows of zeros
    "q_table_stats",  # ANALYZE report: one zero-count row per column
    "q_validate",  # constraint report: one all-pass row per rule
    "q_funnel_latency",  # 1-row report: zero conversions, null p50/p90
    "q_contrastive_pairs",  # audit report: the structure row certifies
    # the (vacuously sound) triplet contract on empty input, exactly as
    # its oracle's literal UNION row does
    "q_join_cardinality",  # 1-row pre-flight: zero predicted rows
    "q_zipf",  # 1-row corpus report: zero vocab, null slope/r2
    "q_ab_test",  # 1-row experiment readout: null counts/means
    "q_gini",  # 1-row concentration readout: null gini/share
    "q_autocorr",  # 1-row series readout: zero days, null acf
    "q_backtest",  # 1-row forecast scorecard: zero eval days, null MAE
    "q_token_budget",  # 1-row budget plan: null threshold, zero docs
    "q_sample_topk",  # 1-row sample audit: n_sampled=0, flags pass
    "q_capacity_plan",  # per-table plan: one zero-row entry per table
}


@pytest.fixture(scope="module")
def empty_sf(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        (
            spark.read.parquet(f"{sf_dir}/{t}.parquet")
            .limit(0)
            .write.mode("overwrite")
            .parquet(str(out / f"{t}.parquet"))
        )
    return str(out)


def test_every_query_handles_empty_corpus(spark, empty_sf):
    failures = []
    for name, fn in QUERIES.items():
        try:
            rows = fn(spark, empty_sf).limit(5).collect()
            assert rows == [] or name in NONEMPTY_ON_EMPTY, name
        except ValueError:
            if name not in FIT_QUERIES:
                failures.append((name, "unexpected ValueError"))
        except AssertionError:
            failures.append((name, "non-empty result on empty input"))
        except Exception as e:  # noqa: BLE001 — the contract being tested
            failures.append((name, f"{type(e).__name__}"))
    assert not failures, failures
