#!/usr/bin/env python3
"""Extract DATA fixtures (no code) from the reference artifacts:

- the raw OLTP fact table (SQLite TEXT columns, 1,878 rows) -> parquet
- the reference's own materialized outputs (output.db QUART_*/MODE_*
  partition tables) -> parquet golden files

These feed GoldenPipelineSpec: graft's ETL over the raw fixture must
reproduce the reference's checked-in outputs.
"""
import sqlite3
import pandas as pd

OUT = "src/test/resources/reference"

con = sqlite3.connect("/root/reference/assets/oltp/dummy_ojol_transactions_raw_only.sqlite")
raw = pd.read_sql_query(
    "SELECT * FROM dummy_ojol_transactions_raw_only_query_get_transaction_list_koto", con)
raw = raw.astype(str)  # keep every column TEXT, exactly as the source
raw.to_parquet(f"{OUT}/raw_fact.parquet", index=False)
print("raw_fact:", len(raw), list(raw.columns))

con2 = sqlite3.connect("/root/reference/output.db")
tables = [r[0] for r in con2.execute("SELECT name FROM sqlite_master WHERE type='table'").fetchall()]
for t in tables:
    if t.startswith("QUART_") or t.startswith("MODE_"):
        df = pd.read_sql_query(f'SELECT * FROM "{t}"', con2)
        df.to_parquet(f"{OUT}/golden_{t}.parquet", index=False)
        print(t, len(df))
