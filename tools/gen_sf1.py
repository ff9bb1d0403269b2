#!/usr/bin/env python3
"""Build the synthetic sf1 testdata (10x sf0.1) used for the 100x
whole-board sweep (BASELINE.md round-5): documents replicated with
shifted doc_ids (decade structure preserved: 5000 % 10 == 0),
embeddings with shifted vec_ids and a per-replica perturbation on
element 1 large enough (0.05*k) that replica similarities stay
distinct at the oracles' 4-decimal rounding; all other tables copied
as-is (the relational entries are not the scale subjects).

Usage: python3 tools/gen_sf1.py [src_sf_dir] [out_dir] [replicas]
`replicas` defaults to 10 (sf1); 40 gives the sf4 point used for the
round-6 second-decade sweep of the four blocked-recompute entries.
Then:  sbt "runMain graft.Verify <out_dir> /tmp/verify_sf1"
       + tools/compare_oracle.py in the usual main/blocked split
       (add `AND a.doc_id // 10 = b.doc_id // 10` to the 4 pair-join
       oracles; cross-decade pairs are impossible by construction).
"""
import sys, os, shutil
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT doc_id + 5000*k AS doc_id, text, lang, source, n_chars
  FROM read_parquet('{src}/documents.parquet'), range({K}) t(k)
  ORDER BY doc_id
) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
con.execute(f"""
COPY (
  SELECT vec_id + 2000*k AS vec_id,
         CAST(list_prepend(embedding[1] + 0.05*k, embedding[2:]) AS FLOAT[]) AS embedding,
         label
  FROM read_parquet('{src}/embeddings.parquet'), range({K}) t(k)
  ORDER BY vec_id
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]:
    shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
docs = con.execute(f"SELECT count(*) FROM read_parquet('{out}/documents.parquet')").fetchone()[0]
vecs = con.execute(f"SELECT count(*) FROM read_parquet('{out}/embeddings.parquet')").fetchone()[0]
print(f"{out}: {docs} documents, {vecs} embeddings")
