"""Term-level text ops (inverted-index stats, TF-IDF top-k), grouped
p-quantile, and the Bloom membership sketch — verified against DuckDB
and planted-key probes."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from geotreehealth_ray.pipelines import sketch, text
from geotreehealth_ray.pipelines.relational import grouped_quantile

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def orders_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/orders.parquet")


def _duck(sql):
    con = duckdb.connect()
    for t in ("documents", "orders"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.sql(sql).df()


_TOKS = """
    SELECT doc_id, t.term FROM documents,
      unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
    WHERE t.term <> ''
"""


def test_term_stats_match_duckdb(docs_ds):
    got = (
        text.term_stats(docs_ds, min_df=3)
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    exp = _duck(
        f"""WITH toks AS ({_TOKS})
        SELECT term, count(DISTINCT doc_id)::BIGINT AS df,
               count(*)::BIGINT AS cf
        FROM toks GROUP BY term HAVING count(DISTINCT doc_id) >= 3
        ORDER BY term"""
    )
    pd.testing.assert_frame_equal(got[["term", "df", "cf"]], exp)


def test_tfidf_topk_match_duckdb(docs_ds):
    got = text.tfidf_topk(docs_ds, k=5).to_pandas()
    got = got.sort_values(["doc_id", "term"]).reset_index(drop=True)
    exp = _duck(
        f"""WITH toks AS ({_TOKS}),
        tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
               FROM toks GROUP BY 1, 2),
        dfreq AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
                  FROM toks GROUP BY 1),
        ranked AS (
          SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
                 row_number() OVER (PARTITION BY tf.doc_id
                   ORDER BY tf.tf DESC, dfreq.df ASC, tf.term ASC) AS rnk
          FROM tf JOIN dfreq USING (term))
        SELECT doc_id, term, tf, df FROM ranked WHERE rnk <= 5
        ORDER BY doc_id, term"""
    )
    pd.testing.assert_frame_equal(got[["doc_id", "term", "tf", "df"]], exp)
    # every doc with >= 5 distinct terms contributes exactly 5 rows
    assert (got.groupby("doc_id").size() <= 5).all()


def test_grouped_quantile_is_exact_and_float_safe(orders_ds):
    got = (
        grouped_quantile(
            orders_ds, "o_orderpriority", "o_totalprice",
            num=9, den=10, alias="p90_price",
        )
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    exp = _duck(
        """SELECT o_orderpriority, p90_price FROM (
             SELECT o_orderpriority, o_totalprice AS p90_price,
                    row_number() OVER (PARTITION BY o_orderpriority
                                       ORDER BY o_totalprice) AS rn,
                    count(*) OVER (PARTITION BY o_orderpriority) AS cnt
             FROM orders) t
           WHERE rn = (cnt * 9 + 9) // 10
           ORDER BY o_orderpriority"""
    )
    pd.testing.assert_frame_equal(got, exp)
    # the float hazard the integer rank avoids: ceil(0.9*10) == 10 in
    # exact math but ceil() of the binary float 9.000000000000002 is 10
    # only because numpy rounds — with n=10, rank must be 9 (0-based)
    n = 10
    assert (n * 9 + 9) // 10 - 1 == 8


def test_grouped_quantile_p100_is_max(orders_ds):
    got = (
        grouped_quantile(
            orders_ds, "o_orderpriority", "o_totalprice",
            num=1, den=1, alias="mx",
        )
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    exp = _duck(
        "SELECT o_orderpriority, max(o_totalprice) AS mx FROM orders "
        "GROUP BY 1 ORDER BY 1"
    )
    pd.testing.assert_frame_equal(got, exp)


def test_bloom_words_match_duckdb_and_probe(orders_ds):
    got = (
        sketch.bloom_words(orders_ds, "o_custkey")
        .to_pandas()
        .sort_values("word")
        .reset_index(drop=True)
    )
    exp = _duck(
        """WITH h AS (
             SELECT list_reduce(
                      list_prepend(14695981039346656037::UBIGINT,
                        list_transform(range(0, 8),
                          i -> ((o_custkey >> (8*i)) & 255)::UBIGINT)),
                      (acc, b) -> ((xor(acc, b)::UHUGEINT
                                    * 1099511628211::UHUGEINT)
                                   % 18446744073709551616::UHUGEINT)::UBIGINT
                    ) AS hv
             FROM orders),
           pos AS (
             SELECT CAST((hv >> (18 * i)) & 262143 AS BIGINT) AS p
             FROM h, range(0, 3) AS r(i))
           SELECT p >> 5 AS word,
                  bit_or(1::BIGINT << CAST(p & 31 AS INTEGER)) AS bits
           FROM pos GROUP BY 1 ORDER BY 1"""
    )
    pd.testing.assert_frame_equal(
        got.astype({"word": "int64", "bits": "int64"}), exp
    )
    # no false negatives: every real key probes positive
    keys = pq.read_table(f"{SF}/orders.parquet", columns=["o_custkey"])
    keys = keys["o_custkey"].to_numpy()
    assert sketch.bloom_might_contain(got, keys).all()
    # false-positive rate near design point on keys never inserted
    absent = np.arange(10_000_000, 10_050_000, dtype=np.int64)
    fpr = sketch.bloom_might_contain(got, absent).mean()
    n_distinct = len(np.unique(keys))
    m = 1 << sketch.BLOOM_BITS_LOG2
    expected = (1.0 - np.exp(-sketch.BLOOM_K * n_distinct / m)) ** sketch.BLOOM_K
    assert fpr <= max(5 * expected, 1e-3)


def test_grouped_quantile_cont_matches_numpy(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import grouped_quantile_cont

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, 800),
        "v": rng.integers(-1000, 100000, 800).astype("int64"),
    })
    for num, den in ((50, 100), (95, 100), (1, 3), (0, 1), (1, 1)):
        out = grouped_quantile_cont(
            rd.from_pandas(df).repartition(6), "k", "v", num, den
        ).to_pandas().sort_values("k").reset_index(drop=True)
        for _, row in out.iterrows():
            vals = np.sort(df[df["k"] == row["k"]]["v"].to_numpy())
            want = np.quantile(vals, num / den, method="linear")
            assert abs(row["q_scaled"] / den - want) < 1e-9, (num, den)
