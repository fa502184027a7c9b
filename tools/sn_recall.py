#!/usr/bin/env python3
"""Recall of sorted-neighborhood blocking vs exact all-pairs ground truth.

Re-measures the round-12 recall law (fixed w=5: 15.2% at sf0.01 ->
1.6% at sf0.1) at the ADAPTIVE window (FuzzyJoin.windowFromClusterSize:
q90 first-token cluster size + 1, clamped to [2, 64]) — the round-13
verdict-#4 deliverable: a second operating point whose recall is
re-measured, so the window-scaling fix is priced, not just shipped.

Usage: python3 tools/sn_recall.py <sfDir> [quantile]
"""
import sys, math
import duckdb

sf = sys.argv[1]
quant = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
con = duckdb.connect()
con.execute(f"CREATE VIEW part AS SELECT * FROM read_parquet('{sf}/part.parquet')")

ENT = """
  SELECT p_partkey AS id, p_name AS key,
    p_name || ' ' || p_brand || ' ' || p_type || ' ' ||
      CAST(p_size AS VARCHAR) AS txt
  FROM part"""

# adaptive window: same derivation as the engine (discrete quantile by
# ROW_NUMBER position, 0.9 cast DOUBLE)
w = con.execute(f"""
  WITH ent AS ({ENT}),
  cl AS (SELECT split_part(key, ' ', 1) AS c, COUNT(*) AS n
         FROM ent GROUP BY 1)
  SELECT CAST(LEAST(64, GREATEST(2, n + 1)) AS BIGINT) AS w
  FROM (SELECT n, ROW_NUMBER() OVER (ORDER BY n) AS r,
          COUNT(*) OVER () AS tot FROM cl)
  WHERE r = CAST(CEIL(CAST({quant} AS DOUBLE) * tot) AS BIGINT)""").fetchone()[0]

# Materialize the all-pairs ground truth ONCE — it is the expensive
# pass (n^2 list intersections; ~1 h at sf0.1 on 2 cores) and the
# first version of this script recomputed it per operating point.
con.execute(f"""
  CREATE TEMP TABLE truth AS
  WITH ent AS ({ENT}),
  tri AS (
    SELECT id, list_distinct(list_transform(
      range(1, length(txt) - 3), i -> substr(txt, i, 5))) AS t
    FROM ent WHERE length(txt) >= 5)
  SELECT a.id AS id_a, b.id AS id_b
  FROM tri a JOIN tri b ON a.id < b.id
  WHERE len(list_intersect(a.t, b.t)) * 1.0 /
    (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) >= 0.5""")

def measure(window):
    truth, caught = con.execute(f"""
      WITH ent AS ({ENT}),
      r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY key, id) AS rn FROM ent),
      cand AS (
        SELECT LEAST(a.id, b.id) AS id_a, GREATEST(a.id, b.id) AS id_b
        FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + {window} - 1)
      SELECT (SELECT COUNT(*) FROM truth),
        (SELECT COUNT(*) FROM truth JOIN cand USING (id_a, id_b))""").fetchone()
    return truth, caught

for window, tag in [(5, "fixed_w5"), (w, f"adaptive_w{w}")]:
    truth, caught = measure(window)
    n = con.execute("SELECT COUNT(*) FROM part").fetchone()[0]
    print(f'{{"workload":"sn_recall","sf":"{sf}","mode":"{tag}","window":{window},'
          f'"rows":{n},"candidates":{n*(window-1)},"true_pairs":{truth},'
          f'"caught":{caught},"recall_pct":{100.0*caught/truth:.1f}}}')
