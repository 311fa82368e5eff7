"""Builder-owned stress data: a deterministic ~10x-sf0.1 twin of the
driver testdata, generated under the repo (NEVER touching
/root/testdata) so skew/memory claims above sf0.1 can be MEASURED
(CHECKALL + PLANAUDIT + timings) instead of argued.

Faithful to the driver tables in schema (same column names/types) and
in the properties the queries depend on: planted near-duplicate
documents (for the dedup family), clustered embeddings (for ANN/
kmeans), funnel-ordered event streams (for analytics), Zipf-ish skew
on events.user_id (so skew handling is actually exercised at this
scale — deliberately heavier than sf0.1). Value DISTRIBUTIONS need
not match the driver exactly: every oracled query is checked Spark vs
DuckDB on the SAME files, so correctness is scale-invariant; what
matters here is volume and shape.

Usage: python tools/gen_stress.py [out_dir] [scale]
       (defaults: stressdata/sf1, 10.0 = 10x the sf0.1 row counts)

Deterministic: numpy PCG64 with fixed per-table seeds; re-running
reproduces byte-identical logical content.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

WORDS = ("batch part spark line column order small sort fast value "
         "scan query agg table hash the a big merge group stream "
         "filter customer key slow vector join plan shuffle stage "
         "broadcast executor partition codegen arrow cache skew "
         "window state offset commit").split()


def _writer(path, schema):
    return pq.ParquetWriter(path, schema)


def gen_dims(out: str, rng: np.random.Generator) -> None:
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    pq.write_table(pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": regions}), f"{out}/region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }), f"{out}/nation.parquet")


def gen_customer(out: str, n: int, rng: np.random.Generator) -> None:
    segs = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE",
                     "HOUSEHOLD", "MACHINERY"])
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(n), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n)],
        "c_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n), 2),
        "c_mktsegment": segs[rng.integers(0, 5, n)],
    }), f"{out}/customer.parquet")


def gen_supplier(out: str, n: int, rng: np.random.Generator) -> None:
    pq.write_table(pa.table({
        "s_suppkey": pa.array(range(n), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n)],
        "s_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n), 2),
    }), f"{out}/supplier.parquet")


def gen_part(out: str, n: int, rng: np.random.Generator) -> None:
    # "widget" mirrors the driver tables (~12% of driver part names
    # contain it): q9_product_profit filters p_name LIKE '%widget%',
    # and the first sf1 generator had no widget noun at all — the
    # query hash-matched on 0 == 0 rows (r8 verdict "what's wrong" #1).
    adjs = ["large", "hot", "blue", "small", "green", "dim", "red"]
    nouns = ["ring", "bolt", "case", "drum", "wheel", "plate", "widget"]
    types = np.array(["ECONOMY", "LARGE", "MEDIUM", "PROMO",
                      "SMALL", "STANDARD"])
    a = rng.integers(0, len(adjs), n)
    b = rng.integers(0, len(nouns), n)
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(n), pa.int64()),
        "p_name": [f"{adjs[a[i]]} {nouns[b[i]]}" for i in range(n)],
        "p_brand": [f"Brand#{k}" for k in rng.integers(1, 26, n)],
        "p_type": types[rng.integers(0, 6, n)],
        "p_size": pa.array(rng.integers(1, 51, n), pa.int32()),
        "p_retailprice": np.round(900 + (np.arange(n) % 1000) / 10, 2),
    }), f"{out}/part.parquet")


def gen_orders_lineitem(out: str, n_orders: int, n_cust: int,
                        n_part: int, n_supp: int,
                        rng: np.random.Generator) -> int:
    day = np.timedelta64(86_400_000_000, "us")
    base = np.datetime64("1995-01-01T00:00:00", "us")
    statuses = np.array(["F", "O", "P"])
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                      "4-NOT SPECIFIED", "5-LOW"])
    o_schema = pa.schema([
        ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
        ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
        ("o_orderdate", pa.timestamp("us")),
        ("o_orderpriority", pa.string())])
    l_schema = pa.schema([
        ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()), ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("l_shipdate", pa.timestamp("us"))])
    rf = np.array(["A", "N", "R"])
    ls = np.array(["F", "O"])
    total_lines = 0
    ow = _writer(f"{out}/orders.parquet", o_schema)
    lw = _writer(f"{out}/lineitem.parquet", l_schema)
    chunk = 200_000
    for start in range(0, n_orders, chunk):
        m = min(chunk, n_orders - start)
        okey = np.arange(start, start + m, dtype=np.int64)
        odate = base + rng.integers(0, 2400, m) * day
        ow.write_table(pa.table({
            "o_orderkey": okey,
            "o_custkey": rng.integers(0, n_cust, m),
            "o_orderstatus": statuses[rng.integers(0, 3, m)],
            "o_totalprice": np.round(rng.uniform(900, 450_000, m), 2),
            "o_orderdate": odate,
            "o_orderpriority": prios[rng.integers(0, 5, m)],
        }, schema=o_schema))
        # 1..7 lines per order (mean 4 -> ~4x orders)
        nl = rng.integers(1, 8, m)
        tot = int(nl.sum())
        total_lines += tot
        rep = np.repeat(okey, nl)
        linenum = (np.arange(len(rep))
                   - np.repeat(np.cumsum(nl) - nl, nl) + 1)
        # l_partkey: 90% uniform + 10% Zipf(1.5) head. Uniform draws
        # over 10x the parts made every per-part signal vanish at sf1:
        # no part reached q11's 0.01%-of-total-value threshold and no
        # part pair co-occurred twice (triangle_copurchase's support-2
        # edge floor) — both queries hash-matched on 0 == 0 rows. The
        # head (top part ~4% of lines, share decaying k^-1.5) restores
        # the hot-SKU reality every retail basket corpus has, and is a
        # real skew-handling workload for the groupBy/join paths.
        hot = rng.random(tot) < 0.10
        zipf_head = np.minimum(rng.zipf(1.5, tot) - 1, n_part - 1)
        lw.write_table(pa.table({
            "l_orderkey": rep,
            "l_partkey": np.where(hot, zipf_head,
                                  rng.integers(0, n_part, tot)),
            "l_suppkey": rng.integers(0, n_supp, tot),
            "l_linenumber": linenum.astype(np.int32),
            "l_quantity": rng.integers(1, 51, tot).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105_000, tot), 2),
            "l_discount": np.round(rng.integers(0, 11, tot) / 100, 2),
            "l_tax": np.round(rng.integers(0, 9, tot) / 100, 2),
            "l_returnflag": rf[rng.integers(0, 3, tot)],
            "l_linestatus": ls[rng.integers(0, 2, tot)],
            "l_shipdate": (np.repeat(odate, nl)
                           + rng.integers(1, 95, tot) * day),
        }, schema=l_schema))
    ow.close()
    lw.close()
    return total_lines


def gen_events(out: str, n: int, n_users: int,
               rng: np.random.Generator) -> None:
    """Zipf-skewed users (heavier than sf0.1 — exercises salting/AQE),
    funnel-ordered types so analytics queries return rows."""
    types = np.array(["view", "click", "signup", "purchase", "error"])
    base = np.datetime64("2024-01-01T00:00:00", "us")
    schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string())])
    w = _writer(f"{out}/events.parquet", schema)
    chunk = 250_000
    for start in range(0, n, chunk):
        m = min(chunk, n - start)
        # Zipf over users, clipped: top user gets ~5-8% of events
        u = np.minimum(rng.zipf(1.3, m) - 1, n_users - 1)
        ts = base + (np.sort(rng.integers(0, 30 * 86_400_000, m))
                     + start // chunk).astype("int64") * np.timedelta64(1000, "us")
        # funnel ordering: later events in a user's life lean toward
        # later funnel stages (so funnel/path queries see conversions)
        stage = np.minimum((rng.integers(0, 10, m) + u % 3) // 2, 4)
        w.write_table(pa.table({
            "event_id": np.arange(start, start + m, dtype=np.int64),
            "ts": ts,
            "user_id": u.astype(np.int64),
            "event_type": types[stage],
            "value": np.round(rng.uniform(0, 200, m), 2),
            "props": [f'{{"k": {int(k)}}}'
                      for k in rng.integers(0, 100, m)],
        }, schema=schema))
    w.close()


def gen_documents(out: str, n: int, rng: np.random.Generator) -> None:
    """~8% planted near-dup pairs (copy with 1-2 word edits), ~2%
    exact dups — the dedup family's prey. Two measured calibrations
    from the first sf1 attempts (this is what stress data is FOR):

    - draws are UNIFORM, not Zipf: a Zipf draw over a small vocab
      makes random short docs near-identical — every pair query's
      candidate space went quadratic and the run wedged;
    - the vocab SCALES with the corpus (10k types at sf1 — Heaps'
      law: real corpora grow their vocabulary with size). Keeping the
      driver's ~40-type vocab at 50k docs puts ~every doc in ~every
      token's inverted-list bucket (~10^10 candidate pairs in the
      exact-Jaccard joins, on BOTH engines) — a degenerate language,
      not a bigger workload. Token DF at this setting is ~250-800
      docs/type, the regime the prefix-filtered joins are built for."""
    langs = np.array(["en", "en", "en", "de", "fr", "zh", "es"])
    n_src = 20
    schema = pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()),
        ("lang", pa.string()), ("source", pa.string()),
        ("n_chars", pa.int64())])
    w = _writer(f"{out}/documents.parquet", schema)
    vocab = np.array([f"{wd}{i}" for wd in WORDS for i in range(250)])
    chunk = 10_000
    prev_texts: list[str] = []
    prev_src0: str | None = None
    for start in range(0, n, chunk):
        m = min(chunk, n - start)
        texts = []
        for i in range(m):
            r = rng.random()
            # dups copy the doc 20 ids back -> SAME source bucket
            # (source = doc_id % 20), so source-blocked pair queries
            # (ngram_jaccard_pairs) see the planted pairs too
            donor = prev_texts[0] if len(prev_texts) == 20 else None
            if donor and r < 0.02:
                texts.append(donor)                     # exact dup
            elif donor and r < 0.10:
                words = donor.split()
                for _ in range(rng.integers(1, 3)):
                    words[int(rng.integers(0, len(words)))] = \
                        str(vocab[int(rng.integers(0, len(vocab)))])
                texts.append(" ".join(words))           # near dup
            elif (prev_src0 is not None and (start + i) % 20 != 0
                  and r < 0.115):
                # planted benchmark LEAKAGE: ~1.5% of non-src0 docs
                # copy the most recent src0 ("benchmark") doc with 1-2
                # word edits. The sf1 vocabulary scales with the corpus
                # (Heaps), so unlike the driver tables no 3-gram
                # shingle crosses sources by chance — without planted
                # cross-source copies benchmark_contamination
                # hash-matched on 0 == 0 rows at sf1. Real training
                # corpora contain eval-set leakage; the stress twin
                # now does too (~700 leaked docs at sf1).
                words = prev_src0.split()
                for _ in range(rng.integers(1, 3)):
                    words[int(rng.integers(0, len(words)))] = \
                        str(vocab[int(rng.integers(0, len(vocab)))])
                texts.append(" ".join(words))
            else:
                ln = int(rng.integers(8, 100))
                idx = rng.integers(0, len(vocab), ln)
                texts.append(" ".join(vocab[idx]))
            prev_texts.append(texts[-1])
            if len(prev_texts) > 20:
                prev_texts.pop(0)
            if (start + i) % 20 == 0:
                prev_src0 = texts[-1]
        w.write_table(pa.table({
            "doc_id": np.arange(start, start + m, dtype=np.int64),
            "text": texts,
            "lang": langs[rng.integers(0, len(langs), m)],
            "source": [f"src{d % n_src}" for d in range(start, start + m)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }, schema=schema))
    w.close()


def gen_embeddings(out: str, n: int, rng: np.random.Generator) -> None:
    """10 labeled clusters on the 64-dim sphere with DRIVER-CALIBRATED
    tightness: the driver data measures ~0.07 mean cosine to the
    own-label centroid (nearly uniform — labels are weak), so the
    centroid weight here is 0.14 over sigma=0.25 noise (cos ~
    0.14/sqrt(0.14^2+64*0.25^2) ~ 0.07). The first sf1 attempt used
    0.6/0.25 (cos ~ 0.29): the resulting tight clusters collapsed
    sign-LSH buckets and k-means cells into a few hot groups and the
    within-cell pair scans went quadratic — a data-distribution
    artifact, not an engine property, so the stress twin matches the
    driver's geometry."""
    dim, k = 64, 10
    cent = rng.normal(size=(k, dim))
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    labels = rng.integers(0, k, n)
    vecs = (cent[labels] * 0.14
            + rng.normal(scale=0.25, size=(n, dim))).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": pa.array([v for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), f"{out}/embeddings.parquet")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "stressdata/sf1"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    os.makedirs(out, exist_ok=True)
    s = lambda base: int(base * scale)  # noqa: E731

    gen_dims(out, np.random.default_rng(421))
    gen_customer(out, s(15_000), np.random.default_rng(422))
    gen_supplier(out, s(1_000), np.random.default_rng(423))
    gen_part(out, s(20_000), np.random.default_rng(424))
    nl = gen_orders_lineitem(out, s(150_000), s(15_000), s(20_000),
                             s(1_000), np.random.default_rng(425))
    gen_events(out, s(100_000), s(1_500), np.random.default_rng(426))
    gen_documents(out, s(5_000), np.random.default_rng(427))
    gen_embeddings(out, s(2_000), np.random.default_rng(428))
    print(f"wrote {out} at scale {scale} (lineitem rows: {nl})")


if __name__ == "__main__":
    main()
