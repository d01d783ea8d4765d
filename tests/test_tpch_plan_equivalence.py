"""Property tests that the re-planned TPC-H formulations are equivalent
to the textbook correlated-subquery forms they replace. The oracle sweep
proves Ray == oracle SQL; these prove oracle SQL == the ORIGINAL query
shape (both run in DuckDB on random tables, no Ray), so the chain
Ray == staged plan == correlated original is closed.

Q21: the staged per-order counts (qualify iff >1 distinct supplier and
exactly one late; offender = sum(late * suppkey)) must equal the
EXISTS / NOT-EXISTS self-join counting DISTINCT qualifying orders per
supplier.

Q17: the cross-multiplied integer threshold (5 * qty * cnt < sum_qty)
must equal the correlated float-average subquery
qty < 0.2 * avg(qty per part) — exactly, because 0.2 = 1/5 is the only
float involved and cross-multiplication removes it.
"""

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

# small keyspaces force collisions: multi-supplier orders, repeated
# (order, supplier) pairs with mixed lateness, multi-line parts
_LINE = st.tuples(
    st.integers(0, 11),   # orderkey
    st.integers(0, 4),    # suppkey
    st.integers(-5, 120), # ship lag days vs order date (>60 == late)
    st.integers(1, 60),   # quantity
)


_STAGED_Q21 = """
WITH l AS (
  SELECT o AS k, s,
         max(CASE WHEN lag > 60 THEN 1 ELSE 0 END) AS late
  FROM rel GROUP BY 1, 2),
q AS (
  SELECT k, sum(late * s) AS offender
  FROM l GROUP BY k HAVING count(*) > 1 AND sum(late) = 1)
SELECT offender::BIGINT AS s, count(*)::BIGINT AS numwait
FROM q GROUP BY 1 ORDER BY 1
"""

_EXISTS_Q21 = """
SELECT l1.s, count(DISTINCT l1.o)::BIGINT AS numwait
FROM rel l1
WHERE l1.lag > 60
  AND EXISTS (SELECT 1 FROM rel l2
              WHERE l2.o = l1.o AND l2.s <> l1.s)
  AND NOT EXISTS (SELECT 1 FROM rel l3
                  WHERE l3.o = l1.o AND l3.s <> l1.s AND l3.lag > 60)
GROUP BY 1 ORDER BY 1
"""


@settings(max_examples=40, deadline=None)
@given(st.lists(_LINE, min_size=1, max_size=60))
def test_q21_staged_counts_equal_exists_form(lines):
    rel = pd.DataFrame(lines, columns=["o", "s", "lag", "qty"])
    con = duckdb.connect()
    con.register("rel", rel)
    staged = con.sql(_STAGED_Q21).df()
    exists = con.sql(_EXISTS_Q21).df()
    pd.testing.assert_frame_equal(staged, exists)


_STAGED_Q17 = """
WITH stats AS (
  SELECT p, sum(qty) AS sq, count(*) AS cnt FROM rel GROUP BY 1)
SELECT coalesce(sum(rel.qty), 0)::BIGINT AS total
FROM rel JOIN stats ON stats.p = rel.p
WHERE 5 * rel.qty * stats.cnt < stats.sq
"""

_CORRELATED_Q17 = """
SELECT coalesce(sum(qty), 0)::BIGINT AS total
FROM rel r1
WHERE r1.qty < 0.2 * (SELECT avg(r2.qty) FROM rel r2 WHERE r2.p = r1.p)
"""


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 6), st.integers(1, 500)),
                min_size=1, max_size=60))
def test_q17_cross_multiplied_threshold_equals_correlated_avg(pairs):
    rel = pd.DataFrame(pairs, columns=["p", "qty"])
    con = duckdb.connect()
    con.register("rel", rel)
    staged = con.sql(_STAGED_Q17).df()
    corr = con.sql(_CORRELATED_Q17).df()
    pd.testing.assert_frame_equal(staged, corr)
