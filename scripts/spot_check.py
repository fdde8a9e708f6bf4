#!/usr/bin/env python3
"""Adversarial spot-checks with INDEPENDENTLY-written SQL (deliberately not
the oracle text): cross-validates invariants of a Verify output dir.
Usage: python3 scripts/spot_check.py <sfDir> <verifyOutDir>"""
import sys, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['events', 'customer', 'nation', 'documents', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

def sp(q):
    return pd.concat(map(pd.read_parquet, glob.glob(f'{outdir}/{q}/*.parquet')))

ok = True
def check(name, cond):
    global ok
    print(('OK  ' if cond else 'FAIL'), name)
    ok = ok and cond

r = sp('q_balance_reconcile')
expect = con.sql("""
WITH c AS (SELECT event_id, row_number() OVER (PARTITION BY user_id
  ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) rn
  FROM events WHERE event_id % 10 != 0 AND user_id != 0 AND event_type != 'error')
SELECT count(*) FROM c WHERE event_id % 97 = 0 AND rn > 1""").fetchone()[0]
check('reconcile: DISCREPANCY count == injected-error rows past bootstrap',
      (r.recon_status == 'DISCREPANCY').sum() == expect)

v = sp('q_velocity_count')
c0, c1 = con.sql("""
WITH u AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP))//1000//3600000 AS b
  FROM events WHERE event_id % 10 != 0 AND user_id != 0)
SELECT count(*), sum(n) FROM (SELECT count(*) n FROM u GROUP BY user_id, b
  HAVING count(*) >= 2)""").fetchone()
check('velocity: window count and event total', (len(v), v.n_txns.sum()) == (c0, int(c1)))

s2 = sp('q_scd2_history')
cur = s2[s2.is_current].groupby('account_id').size()
check('scd2: exactly one current version per account',
      bool((cur == 1).all()) and len(cur) == s2.account_id.nunique())

tk = sp('q_topk_spenders')
top = con.sql("""
SELECT user_id FROM events WHERE event_id % 10 != 0 AND user_id != 0
  AND event_type IN ('purchase','click')
GROUP BY 1 ORDER BY round(sum(value), 2) DESC, user_id LIMIT 10""").df()
check('topk: set equals independent ranking', set(tk.account_id) == set(top.user_id))

pk = sp('q_seq_pack')
by_shard = pk.groupby('shard').agg(tok=('n_tokens', 'sum'), end=('end_offset', 'max'))
check('seq_pack: per-shard token sums equal the stream end (no gaps/overlap)',
      bool((by_shard.tok == by_shard.end).all()))

card = sp('q_dataset_card').iloc[0]
ndocs = con.sql('SELECT count(*) FROM documents').fetchone()[0]
check('dataset_card: split sizes partition the corpus and n_docs matches',
      int(card.n_train + card.n_val + card.n_test) == ndocs
      and int(card.n_docs) == ndocs)

hh = sp('q_heavy_hitters').sort_values(['txn_type', 'rank'])
mono = hh.groupby('txn_type').n.apply(lambda s: bool((s.diff().dropna() <= 0).all()))
check('heavy_hitters: counts non-increasing with rank within each group',
      bool(mono.all()))

cl = sp('q_dedup_clusters')
check('dedup_clusters: every label is the minimum doc_id of its component',
      bool((cl.groupby('cluster_id').doc_id.min() ==
            cl.groupby('cluster_id').cluster_id.first()).all()))

cdc = sp('q_cdc_account_dim')
tomb = con.sql('SELECT count(*) FROM customer WHERE c_custkey % 13 = 0').fetchone()[0]
total = con.sql('SELECT count(*) FROM customer').fetchone()[0]
check('cdc_account_dim: exactly the non-tombstoned accounts survive',
      len(cdc) == total - tomb and cdc.account_id.is_unique)

bloom = sp('q_decontaminate_bloom').sort_values('doc_id').reset_index(drop=True)
exact = sp('q_decontaminate').sort_values('doc_id').reset_index(drop=True)
check('decontaminate: bloom-prefiltered composition == inverted-index result',
      bloom.equals(exact))

mix = sp('q_mixture_sample')
lang = sp('q_text_langid')[['doc_id', 'pred_lang']]
merged = lang.merge(mix[['doc_id']].assign(kept=True), on='doc_id', how='left')
merged.kept = merged.kept.eq(True)
non_en = merged[merged.pred_lang != 'en']
en = merged[merged.pred_lang == 'en']
en_rate = en.kept.mean() if len(en) else 0.5
check('mixture_sample: non-en strata kept whole, en near its 1/2 fraction',
      bool(non_en.kept.all()) and 0.35 < en_rate < 0.65
      and mix.doc_id.is_unique)

con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sfdir}/lineitem.parquet')")
con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sfdir}/orders.parquet')")
con.execute(f"CREATE VIEW supplier AS SELECT * FROM read_parquet('{sfdir}/supplier.parquet')")
con.execute(f"CREATE VIEW region AS SELECT * FROM read_parquet('{sfdir}/region.parquet')")
q5 = sp('q_local_supplier_volume')
# independently-written twin: float sum with a tolerance (NOT the decimal
# oracle text), filtering via semi-joins instead of the join chain
q5x = con.sql("""
SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS rev
FROM lineitem l, orders o, customer c, supplier s, nation n
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
  AND s.s_nationkey = n.n_nationkey
  AND n.n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
  AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1""").df().set_index('n_name').rev
q5m = q5.set_index('n_name').revenue_micros / 1e6  # exact micro-NGN out
check('q5 volume: decimal-exact revenue within float-sum tolerance per nation',
      set(q5m.index) == set(q5x.index)
      and all(abs(q5m[k] - q5x[k]) < 1e-4 * max(1.0, abs(q5x[k])) for k in q5x.index))

man = sp('q_training_manifest')
cur = sp('q_corpus_curate')
dec = sp('q_decontaminate')
check('manifest: subset of curated ids, disjoint from contaminated, split arithmetic holds',
      set(man.doc_id) <= set(cur.doc_id)
      and not (set(man.doc_id) & set(dec.doc_id))
      and all((('train' if i % 100 < 90 else 'val' if i % 100 < 95 else 'test') == s)
              for i, s in zip(man.doc_id, man.split)))

# round-10 session additions ------------------------------------------------
for t in ['lineitem', 'orders']:
    con.execute(f"CREATE VIEW IF NOT EXISTS {t} AS "
                f"SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

tri = sp('q_triangles')
# handshake-style invariants: triangle participation sums to 3x the number
# of triangles, and no node's count exceeds C(deg, 2)
check('triangles: total participation divisible by 3, count <= C(deg,2)',
      int(tri.tri_cnt.sum()) % 3 == 0
      and bool((tri.tri_cnt <= tri.deg * (tri.deg - 1) // 2).all()))

fk = sp('q_fk_audit')
li_n, ord_n = con.sql(
    "SELECT (SELECT count(*) FROM lineitem), (SELECT count(*) FROM orders)"
).fetchone()
fkm = fk.set_index('rel')
check('fk audit: child row counts match the tables; orphans <= distinct fks',
      int(fkm.loc['lineitem.l_orderkey->orders'].child_rows) == li_n
      and int(fkm.loc['orders.o_custkey->customer'].child_rows) == ord_n
      and bool((fk.orphan_keys <= fk.distinct_fks).all())
      and bool((fk.orphan_rows >= fk.orphan_keys).all()))

ck = sp('q_table_checksum')
check('checksum: bucket row counts partition the fact table',
      int(ck.n_rows.sum()) == li_n and len(ck) <= 64
      and bool((ck.n_rows > 0).all()))

bf = sp('q_benford')
pos = con.sql("SELECT count(*) FROM orders WHERE o_totalprice > 0").fetchone()[0]
check('benford: observed digits partition the positive rows, 9 rows out',
      int(bf.observed.sum()) == pos and len(bf) == 9)

ed = sp('q_equidepth_hist')
ordn = con.sql("SELECT o_orderpriority g, count(*) n FROM orders GROUP BY 1").df()
check('equi-depth: per-group bucket counts sum to the group size, '
      'buckets within [0, 8)',
      ed.groupby('grp').cnt.sum().sort_index().tolist()
        == ordn.set_index('g').n.sort_index().tolist()
      and ed.bucket.between(0, 7).all())

psi = sp('q_psi_drift')
check('psi: full 8-bucket grid per group, ref counts partition the 1996- '
      'snapshot',
      bool((psi.groupby('grp').bucket.count() == 8).all())
      and int(psi.cnt_ref.sum()) == con.sql(
        "SELECT count(*) FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'"
      ).fetchone()[0])

fp = sp('q_frequent_pairs')
check('frequent pairs: support bound holds and lift is positive',
      bool((fp.pair_cnt <= fp[['a_cnt', 'b_cnt']].min(axis=1)).all())
      and bool((fp.lift_micro > 0).all()) and bool((fp.pair_cnt >= 2).all()))

kc = sp('q_kcore')
check('k-core: surviving degrees respect the pre-peel bound',
      bool((kc.deg >= 1).all()) and kc.node.is_unique)

bm = sp('q_bm25_topk')
nq = con.sql("SELECT count(*) FROM documents WHERE doc_id % 997 = 0").fetchone()[0]
check('bm25: every eval doc is a query, <=10 ranked hits each, scores '
      'non-negative and rank-ordered',
      bm.query_id.nunique() == nq
      and bool((bm.groupby('query_id').doc_rank.max() <= 10).all())
      # strict > 0 at the SFs this spot check runs at: the zero-floor
      # case (idf clamped to 1 micro-nat AND the per-term tf division
      # flooring to 0) only binds past ~5e5 docs, far beyond any test
      # corpus — relaxing to >= 0 here would mask a regression that
      # produces spurious zero scores. Gate on corpus size so a future
      # huge-SF run relaxes automatically instead of false-failing.
      and bool((bm.score_micro > 0).all()
               if con.sql("SELECT count(*) FROM documents").fetchone()[0] < 500000
               else (bm.score_micro >= 0).all())
      # within each query, rank order == (score DESC, doc_id ASC) order
      and bool(bm.sort_values(['query_id', 'doc_rank'])
               .groupby('query_id').score_micro
               .apply(lambda s: s.is_monotonic_decreasing
                      or (s.diff().dropna() <= 0).all()).all()))

ws = sp('q_weighted_sample')
check('weighted sample: exactly 500 rows, unique docs, ranks 1..500, '
      'weights positive',
      len(ws) == 500 and ws.doc_id.is_unique
      and sorted(ws.sample_rank) == list(range(1, 501))
      and bool((ws.n_tokens > 0).all()))

ls_ = sp('q_leakage_safe_split')
ndocs2 = con.sql('SELECT count(*) FROM documents').fetchone()[0]
check('leakage split: one row per doc, every group wholly in one split, '
      'cuts honored',
      len(ls_) == ndocs2 and ls_.doc_id.is_unique
      and bool((ls_.groupby('group_key').split.nunique() == 1).all())
      and bool(((ls_.split_key < 90) == (ls_.split == 'train')).all())
      and bool((ls_.split_key.between(90, 94) == (ls_.split == 'val')).all()))

ql = sp('q_ql_topk')
rr = sp('q_hybrid_rrf')
bm2 = sp('q_bm25_topk')
check('hybrid rrf: fused docs come from the two input lists and scores '
      'match the rank formula bounds',
      set(map(tuple, rr[['query_id', 'doc_id']].values))
      <= (set(map(tuple, bm2[['query_id', 'doc_id']].values))
          | set(map(tuple, ql[['query_id', 'doc_id']].values)))
      and bool((rr.rrf_micro >= 1000000 // 70).all())
      and bool((rr.rrf_micro <= 2 * (1000000 // 61)).all()))

ka = sp('q_k_anonymity')
ncust = con.sql('SELECT count(*) FROM customer').fetchone()[0]
check('k-anonymity: group sizes partition the customer table, at_risk '
      'iff group_n < 5',
      int(ka.group_n.sum()) == ncust
      and bool((ka.at_risk == (ka.group_n < 5)).all()))

print('RESULT:', 'ALL OK' if ok else 'FAIL')
sys.exit(0 if ok else 1)
