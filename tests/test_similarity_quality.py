"""ANN quality: the learned-IVF probe (q94) must recall at least as
much of the exact top-3 as the untrained sign-bucket probe (q28) on the
same queries — the whole point of spending a Lloyd update on the cells.
Both queries carry recall in-band (``in_exact_top3``), so this is a
direct comparison of the gated artifacts, no separate harness.
"""

from __future__ import annotations

import pytest

from etl_pipeline_stock_market_data_postgresql_spark.workload.similarity import (
    N_QUERIES, q28_ivf_topk, q94_learned_ivf)


@pytest.fixture(scope="module")
def recalls(spark, sf_dir):
    def recall(df):
        rows = df.collect()
        return sum(r["in_exact_top3"] for r in rows), len(rows)

    return (recall(q94_learned_ivf(spark, sf_dir)),
            recall(q28_ivf_topk(spark, sf_dir)))


def test_learned_ivf_recall_at_least_sign_bucket(recalls):
    (learned_hits, learned_n), (sign_hits, sign_n) = recalls
    assert learned_hits >= sign_hits, (learned_hits, sign_hits)


def test_learned_ivf_returns_full_topk(recalls):
    # every query should fill its top-3 from the probed cells (nprobe=2
    # of K=8 cells holds far more than 3 candidates at every test SF)
    (learned_hits, learned_n), _ = recalls
    assert learned_n == 3 * N_QUERIES, learned_n
