#!/usr/bin/env python3
"""Generate scale-test parquet tables above the driver's sf0.1.

Usage: python3 tools/gen_scale.py <sf> <outdir>     e.g. 1 /tmp/graftscale/sf1

Mimics the driver testdata's schemas and value distributions (sampled from
/root/testdata/sf0.1 — vocab, category mixes, per-order line counts, date
ranges) so query selectivities carry over, but is NOT bit-compatible with
the driver generator: these tables exist only to measure how operator cost
scales between two locally-generated SFs (SCALE.md linearity table), never
for oracle correctness. Row counts scale linearly from the sf0.1 bench
point (lineitem 6M/sf, documents 500k/sf... see COUNTS). Deterministic
(seed = 42 + table hash) so reruns are comparable.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array([
    'a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup', 'fast',
    'filter', 'group', 'hash', 'join', 'key', 'line', 'merge', 'order',
    'part', 'query', 'row', 'scan', 'slow', 'small', 'sort', 'spark',
    'stream', 'table', 'the', 'value', 'vector', 'window'])
REGIONS = ['AFRICA', 'AMERICA', 'ASIA', 'EUROPE', 'MIDDLE EAST']
LANGS = (['en'] * 41 + ['zh'] * 15 + ['es'] * 15 + ['fr'] * 15 + ['de'] * 14)
US_DAY = 86_400_000_000


def rng_for(name):
    return np.random.default_rng(42 + sum(ord(c) for c in name))


def write(out, name, cols):
    pq.write_table(pa.table(cols), os.path.join(out, f'{name}.parquet'))
    print(f'{name}: {len(next(iter(cols.values())))} rows', flush=True)


def ts_array(us):
    return pa.array(us, type=pa.timestamp('us'))


def main(sf, out):
    os.makedirs(out, exist_ok=True)
    k = sf / 0.1  # row multiplier vs the sampled sf0.1 tables
    n_orders = int(150_000 * k)
    n_cust = int(15_000 * k)
    n_supp = int(1_000 * k)
    n_part = int(20_000 * k)
    n_events = int(100_000 * k)
    n_users = int(1_500 * k)
    n_docs = int(5_000 * k)
    n_vecs = int(2_000 * k)

    write(out, 'region', {
        'r_regionkey': pa.array(range(5), type=pa.int32()),
        'r_name': REGIONS})
    write(out, 'nation', {
        'n_nationkey': pa.array(range(25), type=pa.int32()),
        'n_name': [f'NATION_{i}' for i in range(25)],
        'n_regionkey': pa.array([i % 5 for i in range(25)], type=pa.int32())})

    r = rng_for('customer')
    write(out, 'customer', {
        'c_custkey': np.arange(n_cust, dtype=np.int64),
        'c_name': [f'Customer#{i:09d}' for i in range(n_cust)],
        'c_nationkey': r.integers(0, 25, n_cust, dtype=np.int32),
        'c_acctbal': np.round(r.uniform(-1000, 10_000, n_cust), 2),
        'c_mktsegment': r.choice(
            ['MACHINERY', 'AUTOMOBILE', 'HOUSEHOLD', 'BUILDING', 'FURNITURE'],
            n_cust)})

    r = rng_for('supplier')
    write(out, 'supplier', {
        's_suppkey': np.arange(n_supp, dtype=np.int64),
        's_name': [f'Supplier#{i:09d}' for i in range(n_supp)],
        's_nationkey': r.integers(0, 25, n_supp, dtype=np.int32),
        's_acctbal': np.round(r.uniform(-1000, 10_000, n_supp), 2)})

    r = rng_for('part')
    adj = ['large', 'small', 'smooth', 'shiny', 'rusty', 'bright', 'plain']
    noun = ['ring', 'bolt', 'washer', 'spring', 'gear', 'wheel', 'pin']
    write(out, 'part', {
        'p_partkey': np.arange(n_part, dtype=np.int64),
        'p_name': [f'{r.choice(adj)} {r.choice(noun)}' for _ in range(n_part)],
        'p_brand': [f'Brand#{i}' for i in r.integers(1, 26, n_part)],
        'p_type': r.choice(['ECONOMY', 'LARGE', 'MEDIUM', 'PROMO', 'SMALL',
                            'STANDARD'], n_part),
        'p_size': r.integers(1, 51, n_part, dtype=np.int32),
        'p_retailprice': np.round(r.uniform(900, 2000, n_part), 2)})

    r = rng_for('orders')
    d0 = np.datetime64('1995-01-01').astype('datetime64[us]').astype(np.int64)
    write(out, 'orders', {
        'o_orderkey': np.arange(n_orders, dtype=np.int64),
        'o_custkey': r.integers(0, n_cust, n_orders, dtype=np.int64),
        'o_orderstatus': r.choice(['P', 'O', 'F'], n_orders),
        'o_totalprice': np.round(r.uniform(1000, 500_000, n_orders), 2),
        'o_orderdate': ts_array(
            d0 + r.integers(0, 2404, n_orders, dtype=np.int64) * US_DAY),
        'o_orderpriority': r.choice(
            ['1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW'],
            n_orders)})

    r = rng_for('lineitem')
    lines = r.integers(1, 8, n_orders)  # ~4 lines/order, driver-like
    okey = np.repeat(np.arange(n_orders, dtype=np.int64), lines)
    n_li = len(okey)
    linenum = (np.concatenate([np.arange(c) for c in lines]) + 1)
    write(out, 'lineitem', {
        'l_orderkey': okey,
        'l_partkey': r.integers(0, n_part, n_li, dtype=np.int64),
        'l_suppkey': r.integers(0, n_supp, n_li, dtype=np.int64),
        'l_linenumber': linenum.astype(np.int32),
        'l_quantity': r.integers(1, 51, n_li).astype(np.float64),
        'l_extendedprice': np.round(r.uniform(900, 105_000, n_li), 2),
        'l_discount': np.round(r.integers(0, 11, n_li) / 100.0, 2),
        'l_tax': np.round(r.integers(0, 9, n_li) / 100.0, 2),
        'l_returnflag': r.choice(['A', 'N', 'R'], n_li),
        'l_linestatus': r.choice(['F', 'O'], n_li),
        'l_shipdate': ts_array(
            d0 + r.integers(1, 2500, n_li, dtype=np.int64) * US_DAY)})

    r = rng_for('events')
    e0 = np.datetime64('2024-01-01').astype('datetime64[us]').astype(np.int64)
    span = 30 * US_DAY
    write(out, 'events', {
        'event_id': np.arange(n_events, dtype=np.int64),
        'ts': ts_array(np.sort(r.integers(0, span, n_events)) + e0),
        'user_id': r.integers(0, n_users, n_events, dtype=np.int64),
        'event_type': r.choice(['view', 'click', 'signup', 'purchase',
                                'error'], n_events),
        'value': np.round(r.gamma(2.0, 60.0, n_events), 2),
        'props': [f'{{"k": {v}}}' for v in r.integers(0, 100, n_events)]})

    r = rng_for('documents')
    wc = r.integers(10, 101, n_docs)
    words = VOCAB[r.integers(0, len(VOCAB), int(wc.sum()))]
    offs = np.concatenate([[0], np.cumsum(wc)])
    texts = [' '.join(words[offs[i]:offs[i + 1]]) for i in range(n_docs)]
    # plant the same near-dup mass the driver corpus carries: ~2% of docs
    # copy an earlier doc with one word changed (keeps dedup pipelines'
    # pair volume LINEAR in sf — pure replication would square it)
    for i in r.choice(np.arange(1, n_docs), max(1, n_docs // 50),
                      replace=False):
        src = texts[int(r.integers(0, i))].split()
        src[int(r.integers(0, len(src)))] = str(VOCAB[int(r.integers(0, len(VOCAB)))])
        texts[int(i)] = ' '.join(src)
    write(out, 'documents', {
        'doc_id': np.arange(n_docs, dtype=np.int64),
        'text': texts,
        'lang': r.choice(np.array(LANGS), n_docs),
        'source': [f'src{i}' for i in r.integers(0, 20, n_docs)],
        'n_chars': np.array([len(t) for t in texts], dtype=np.int64)})

    r = rng_for('embeddings')
    labels = r.integers(0, 10, n_vecs).astype(np.int32)
    # the driver's embeddings are L2-normalized ISOTROPIC vectors with labels
    # independent of geometry (measured: unit norms, element std 1/8, mean
    # within-label cosine 0.0, max natural pairwise cosine ~0.6). The first
    # cut of this generator drew 10 geometric clusters instead (mean
    # within-label cos 0.80) — a fidelity bug the round-12 full-suite sf1
    # sweep caught as a 15x superlinear emb_near_dup: at cos≈0.8 a large
    # fraction of the corpus co-buckets under SRP-LSH without passing the
    # 0.9 verify, so candidate volume goes quadratic on data the driver
    # distribution never produces.
    raw = r.normal(0, 1, (n_vecs, 64))
    vecs = (raw / np.linalg.norm(raw, axis=1, keepdims=True)).astype(np.float32)
    write(out, 'embeddings', {
        'vec_id': np.arange(n_vecs, dtype=np.int64),
        'embedding': pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
        'label': labels})


if __name__ == '__main__':
    main(float(sys.argv[1]), sys.argv[2])
