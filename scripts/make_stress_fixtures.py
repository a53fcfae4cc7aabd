#!/usr/bin/env python3
"""Build the round-9 scale-stress fixtures (dev tool; mirrors the driver's
fixture schemas exactly — the driver's own testdata stays read-only):

  sf1   — 10× sf0.1 by key-remapped replication: every copy shifts every
          key-domain column (orderkey/custkey/partkey/suppkey/event_id/
          user_id/doc_id/vec_id) by i*100_000_000, preserving referential
          integrity per copy while text/value/timestamp distributions stay
          the driver's. Embeddings get a per-copy epsilon on the first
          component so replication cannot fabricate exact similarity ties
          the small-SF gates never exercise. Replicated TEXT is a feature:
          each document now has 10 exact-duplicate copies, so dedup/LSH
          clustering is stressed with larger components than any driver SF.

  skew  — sf0.1-sized but adversarial: 50% of events collapse onto ONE hot
          user_id (the per-user windows in cdc_merge_upsert and
          cohort_retention concentrate a hot key on one task), and 30% of
          documents become stopword-heavy (hot tokens for inverted_index /
          ngram_topk / tfidf; near-identical docs for LSH banding).

Usage: python3 scripts/make_stress_fixtures.py <outRoot>   # e.g. /tmp/graft_stress
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10
SHIFT = 100_000_000  # > any sf0.1 key, so copies never collide

def main(out_root: str) -> None:
    sf1 = os.path.join(out_root, "sf1")
    skew = os.path.join(out_root, "skew")
    os.makedirs(sf1, exist_ok=True)
    os.makedirs(skew, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(16, os.cpu_count() or 4)}")

    def src(t):
        return f"read_parquet('{SRC}/{t}.parquet')"

    def copy(sql, dest):
        con.execute(f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET)")
        print("wrote", dest, flush=True)

    # ---- sf1: key-remapped replication -----------------------------------
    # dimension tables with tiny fixed key domains stay single-copy
    for t in ("region", "nation"):
        copy(f"SELECT * FROM {src(t)}", f"{sf1}/{t}.parquet")
    rep = f"(SELECT i FROM range({COPIES}) r(i)) reps"
    copy(f"""SELECT c_custkey + i*{SHIFT} AS c_custkey, c_name,
                    c_nationkey, c_acctbal, c_mktsegment
             FROM {src('customer')}, {rep}""", f"{sf1}/customer.parquet")
    copy(f"""SELECT s_suppkey + i*{SHIFT} AS s_suppkey, s_name, s_nationkey,
                    s_acctbal
             FROM {src('supplier')}, {rep}""", f"{sf1}/supplier.parquet")
    copy(f"""SELECT p_partkey + i*{SHIFT} AS p_partkey, p_name, p_brand,
                    p_type, p_size, p_retailprice
             FROM {src('part')}, {rep}""", f"{sf1}/part.parquet")
    copy(f"""SELECT o_orderkey + i*{SHIFT} AS o_orderkey,
                    o_custkey + i*{SHIFT} AS o_custkey,
                    o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
             FROM {src('orders')}, {rep}""", f"{sf1}/orders.parquet")
    copy(f"""SELECT l_orderkey + i*{SHIFT} AS l_orderkey,
                    l_partkey + i*{SHIFT} AS l_partkey,
                    l_suppkey + i*{SHIFT} AS l_suppkey,
                    l_linenumber, l_quantity, l_extendedprice, l_discount,
                    l_tax, l_returnflag, l_linestatus, l_shipdate
             FROM {src('lineitem')}, {rep}""", f"{sf1}/lineitem.parquet")
    copy(f"""SELECT event_id + i*{SHIFT} AS event_id, ts,
                    user_id + i*{SHIFT} AS user_id, event_type, value, props
             FROM {src('events')}, {rep}""", f"{sf1}/events.parquet")
    copy(f"""SELECT doc_id + i*{SHIFT} AS doc_id, text, lang, source, n_chars
             FROM {src('documents')}, {rep}""", f"{sf1}/documents.parquet")
    # epsilon on the first component: exactly representable in float32,
    # breaks the exact-tie degeneracy replication would otherwise create
    copy(f"""SELECT vec_id + i*{SHIFT} AS vec_id,
                    list_prepend(CAST(embedding[1] + i*0.001 AS FLOAT),
                                 embedding[2:])::FLOAT[] AS embedding,
                    label
             FROM {src('embeddings')}, {rep}""", f"{sf1}/embeddings.parquet")

    # ---- skew: hot user + stopword-heavy corpus slice --------------------
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"):
        copy(f"SELECT * FROM {src(t)}", f"{skew}/{t}.parquet")
    copy(f"""SELECT event_id, ts,
                    CASE WHEN event_id % 2 = 0 THEN 7 ELSE user_id END AS user_id,
                    event_type, value, props
             FROM {src('events')}""", f"{skew}/events.parquet")
    # 30% of docs become a stopword loop (hot tokens); ANOTHER 30% keep
    # their distinct text but gain ONE shared boilerplate sentence — the
    # hot-POSTING shape (one fingerprint/shingle with df ≈ 30% of the
    # corpus inside otherwise-unrelated docs), the straggler trap for any
    # whole-partition window keyed on the posting (fingerprint_winnowing /
    # span_dup_fraction must stay bounded: partial-agg + join-back, r12).
    # The sentence is 12 tokens, > w + k − 1 = 7, so winnowing GUARANTEES
    # every planted doc shares a fingerprint. n_chars stays consistent
    # with the new text so length-derived stats remain honest.
    stop = "the of and a to in that it is was"
    boiler = ("this document is provided as is without warranty of any "
              "kind whatsoever")
    copy(f"""SELECT doc_id,
                    CASE WHEN doc_id % 10 < 3
                         THEN repeat('{stop} ', 20) || '{stop}'
                         WHEN doc_id % 10 < 6
                         THEN text || ' {boiler}'
                         ELSE text END AS text,
                    lang, source,
                    CASE WHEN doc_id % 10 < 3
                         THEN length(repeat('{stop} ', 20) || '{stop}')
                         WHEN doc_id % 10 < 6
                         THEN n_chars + length(' {boiler}')
                         ELSE n_chars END AS n_chars
             FROM {src('documents')}""", f"{skew}/documents.parquet")
    print("done:", sf1, skew)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_stress")
