#!/usr/bin/env python3
"""Generate a LOCAL sf1 decade (10x sf0.1) under target/sf1 for scale
curves. Mirrors the driver testdata's schemas exactly (pyarrow logical
types match pq.read_schema of /root/testdata/sf0.1) and its measured
distributions approximately: same dims, same vocab/word-salad document
shape with planted exact+near duplicates, unit-norm random embeddings
with uniform labels, 30-day microsecond event stream. Seed fixed —
regeneration is bit-identical. NOT oracle data: used only for the
BASELINE scale-curve sweeps.

With --docs-only --vocab N it instead writes JUST a documents table
whose texts draw from an N-word Zipf(1.07) vocabulary — the
realistic-vocabulary counterpart to the default 30-word salad, used
to measure the dedup_ngram_jaccard cost envelope when the shingle
space GROWS with the corpus (real corpora) instead of saturating
(the default generator's designed worst case).

With --vecs-only --nvecs N it writes JUST an embeddings table (same
64-dim unit-norm shape and 0.5% planted near-dup rate as the default)
— used to extend the ANN/semantic-dedup scale curves a further decade
past sf1's 8k vectors.

With --blob-vecs --nvecs N [--blobs B] it writes JUST an embeddings
table with PLANTED CLUSTER GEOMETRY: B blob centers (default
ceil(N/512) == KMeans.adaptiveK(N)) drawn isotropically, each vector =
normalize(center + N(0, 0.08)^64) giving within-blob cos ~= 0.71 vs
the isotropic sea's ~0.125-sd noise floor — the round-14 diagnosis's
"real embedding corpora have cluster structure this corpus
deliberately lacks" corpus, used to re-run the C87 recall ladder
where blocking-by-quantization CAN carry signal. Blob membership is
round-robin by vec_id (vec i -> blob i % B) so the k lowest vec_ids —
KMeans's deterministic seeds — hit k DISTINCT blobs (the seed caveat
in the round-14 diagnosis); the 0.5% planted near-dup twins are kept
(same construction as --vecs-only).

With --skew-docs --ndocs N it writes JUST a documents table with a
PLANTED POWER-LAW duplicate-cluster distribution: ~10% of all docs are
near-duplicates of ONE seed (a single mega-component for the
connected-components stage), the next clusters follow a Zipf size law,
and the rest are unique — the skew-resilience corpus for
dedup_cluster / dedup_split_leakage (round-11 verdict, task 2).

With --chain-docs --ndocs N it writes JUST a documents table of
SLIDING TOKEN WINDOWS over one long unique-token stream (width 100,
step 2): doc_i near-dups only its ~±6 neighbors, so the MinHash
component is ONE chain whose diameter GROWS with the corpus — the
transitive-but-not-direct shape that forces connectedComponentsAuto
past its propagation budget into the star phase inside the shipping
dedup_cluster query (round-13 queue item c; ClusterSpec carries the
300-doc correctness twin)."""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

args = [a for a in sys.argv[1:] if not a.startswith("--")]
flags = {a.split("=")[0]: (a.split("=")[1] if "=" in a else True)
         for a in sys.argv[1:] if a.startswith("--")}
OUT = args[0] if args else "/root/repo/target/sf1"
os.makedirs(OUT, exist_ok=True)
rng = np.random.RandomState(int(flags.get("--seed", 42)))

DOCS_ONLY = "--docs-only" in flags
ZIPF_VOCAB = int(flags.get("--vocab", 0))
N_DOCS_OVERRIDE = int(flags.get("--ndocs", 0))
VECS_ONLY = "--vecs-only" in flags
N_VECS_OVERRIDE = int(flags.get("--nvecs", 0))
SKEW_DOCS = "--skew-docs" in flags
CHAIN_DOCS = "--chain-docs" in flags
BLOB_VECS = "--blob-vecs" in flags
N_BLOBS_OVERRIDE = int(flags.get("--blobs", 0))

N_CUST, N_SUPP, N_PART = 150_000, 10_000, 200_000
N_ORDERS, N_LINE = 1_500_000, 6_000_000
N_EVENTS, N_DOCS, N_VECS = 1_000_000, 50_000, 8_000

def write(name, table):
    # bounded row groups: pyarrow's default writes ONE group for these
    # table sizes, and a single-rowgroup parquet file is UNSPLITTABLE —
    # Spark scans it as one task no matter what maxPartitionBytes says
    # (measured: the 512k-vector decade's k-means fits ran on 2 of 32
    # cores). 64k rows ≈ 16–20 MB groups here — the layout any real
    # writer produces.
    pq.write_table(table, f"{OUT}/{name}.parquet", row_group_size=64 * 1024)
    print(name, table.num_rows)

if CHAIN_DOCS:
    n_docs = N_DOCS_OVERRIDE or 50_000
    width, step = 100, 2
    stream = [f"w{i}" for i in range(n_docs * step + width)]
    texts = [" ".join(stream[i * step:i * step + width]) for i in range(n_docs)]
    langs = ["de", "en", "es", "fr", "zh"]
    write("documents", pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": texts,
        "lang": [langs[j] for j in rng.choice(5, n_docs, p=[.12, .40, .12, .12, .24])],
        "source": [f"src{i % 20}" for i in range(n_docs)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))
    print("chain corpus: width", width, "step", step,
          "expected diameter ~", n_docs // 6)
    print("DONE", OUT)
    sys.exit(0)

if SKEW_DOCS:
    n_docs = N_DOCS_OVERRIDE or 50_000
    V = 30_000
    vocab = np.array([f"w{i:05d}" for i in range(V)])
    p = 1.0 / np.power(np.arange(1, V + 1), 1.07)
    p /= p.sum()

    def fresh_text():
        n = rng.randint(30, 100)
        return " ".join(vocab[rng.choice(V, n, p=p)])

    def near_dup(t):
        w = t.split()
        for _ in range(2):                   # two words flipped, like the
            w[rng.randint(0, len(w))] = "dup"  # default generator's near-dups
        return " ".join(w)

    # cluster-size plan: one mega-cluster of 10% of the corpus, then
    # Zipf(1.5) sizes (capped at 1% of corpus) until ~25% of docs are in
    # some cluster; everything else is unique
    sizes = [max(2, n_docs // 10)]
    budget = n_docs // 4 - sizes[0]
    rank = 2
    while budget > 0:
        s = min(max(2, int(sizes[0] / rank ** 1.5)), n_docs // 100)
        sizes.append(s)
        budget -= s
        rank += 1
    texts = []
    for s in sizes:
        seed = fresh_text()
        texts.append(seed)
        texts.extend(near_dup(seed) for _ in range(s - 1))
    while len(texts) < n_docs:
        texts.append(fresh_text())
    texts = texts[:n_docs]
    order = rng.permutation(n_docs)          # clusters scattered over ids
    texts = [texts[i] for i in order]
    langs = ["de", "en", "es", "fr", "zh"]
    write("documents", pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": texts,
        "lang": [langs[j] for j in rng.choice(5, n_docs, p=[.12, .40, .12, .12, .24])],
        "source": [f"src{i % 20}" for i in range(n_docs)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))
    print("mega cluster:", sizes[0], "planted clusters:", len(sizes),
          "clustered docs:", sum(sizes))
    print("DONE", OUT)
    sys.exit(0)

if BLOB_VECS:
    n_vecs = N_VECS_OVERRIDE or 512_000
    B = N_BLOBS_OVERRIDE or -(-n_vecs // 512)   # ceil = KMeans.adaptiveK(n)
    centers = rng.normal(0, 1, (B, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # round-robin membership: the k lowest vec_ids (KMeans's seeds when
    # k <= B) land in k distinct blobs
    assign = np.arange(n_vecs) % B
    # per-coordinate sd 0.08 -> total noise norm^2 ~= 64*0.0064 = 0.41,
    # within-blob cos ~= 1/(1+0.41) ~= 0.71 (printed below on every run)
    E = centers[assign] + 0.08 * rng.normal(0, 1, (n_vecs, 64))
    # the same 0.5% planted near-dup twins as --vecs-only (per-i draws
    # AFTER the bulk normal draw, replayable from the seed)
    for i in range(200, n_vecs):
        if rng.random_sample() < 0.005:
            j = rng.randint(0, i)
            E[i] = E[j] + rng.normal(0, 0.05, 64)
            assign[i] = assign[j]
    E = (E / np.linalg.norm(E, axis=1, keepdims=True)).astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": pa.array(range(n_vecs), pa.int64()),
        "embedding": pa.array([row for row in E.tolist()], pa.list_(pa.float32())),
        "label": pa.array(rng.randint(0, 10, n_vecs), pa.int32())}))
    # within- vs cross-blob contrast, printed so every regeneration
    # documents the geometry it produced
    same = [float(np.dot(E[i], E[i + B])) for i in range(200) if i + B < n_vecs]
    cross = [float(np.dot(E[i], E[i + 1])) for i in range(200)]
    print("blobs:", B, "within-blob cos ~", round(float(np.mean(same)), 3),
          "cross-blob cos ~", round(float(np.mean(cross)), 3))
    print("DONE", OUT)
    sys.exit(0)

if VECS_ONLY:
    n_vecs = N_VECS_OVERRIDE or 64_000
    E = rng.normal(0, 1, (n_vecs, 64))
    for i in range(200, n_vecs):
        if rng.random_sample() < 0.005:
            j = rng.randint(0, i)
            E[i] = E[j] + rng.normal(0, 0.05, 64)
    E = (E / np.linalg.norm(E, axis=1, keepdims=True)).astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": pa.array(range(n_vecs), pa.int64()),
        "embedding": pa.array([row for row in E.tolist()], pa.list_(pa.float32())),
        "label": pa.array(rng.randint(0, 10, n_vecs), pa.int32())}))
    print("DONE", OUT)
    sys.exit(0)

if DOCS_ONLY:
    # Realistic-vocabulary documents table: Zipf(1.07) over V words, same
    # doc-length range and planted-dup rates as the default generator.
    # The whole token stream draws in ONE choice call (cumsum reuse).
    V = ZIPF_VOCAB or 30_000
    n_docs = N_DOCS_OVERRIDE or 50_000
    vocab = np.array([f"w{i:05d}" for i in range(V)])
    p = 1.0 / np.power(np.arange(1, V + 1), 1.07)
    p /= p.sum()
    lens = rng.randint(8, 100, n_docs)
    toks = rng.choice(V, lens.sum(), p=p)
    texts, pos = [], 0
    for i in range(n_docs):
        n = lens[i]
        t = " ".join(vocab[toks[pos:pos + n]])
        pos += n
        r = rng.random_sample()
        if i > 100 and r < 0.002:          # exact duplicate
            t = texts[rng.randint(0, i)]
        elif i > 100 and r < 0.012:        # near-duplicate
            w = texts[rng.randint(0, i)].split()
            for _ in range(2):
                w[rng.randint(0, len(w))] = "dup"
            t = " ".join(w)
        texts.append(t)
    langs = ["de", "en", "es", "fr", "zh"]
    write("documents", pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": texts,
        "lang": [langs[j] for j in rng.choice(5, n_docs, p=[.12, .40, .12, .12, .24])],
        "source": [f"src{i % 20}" for i in range(n_docs)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))
    print("DONE", OUT)
    sys.exit(0)

# region / nation — fixed dims
write("region", pa.table({
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}))
write("nation", pa.table({
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
write("customer", pa.table({
    "c_custkey": pa.array(range(N_CUST), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": pa.array(rng.randint(0, 25, N_CUST), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
    "c_mktsegment": np.array(segs)[rng.randint(0, 5, N_CUST)]}))

write("supplier", pa.table({
    "s_suppkey": pa.array(range(N_SUPP), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": pa.array(rng.randint(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2)}))

adjs = ["large", "hot", "blue", "small", "green", "dim", "red", "cold"]
nouns = ["ring", "bolt", "case", "drum", "plate", "wire", "tube", "disk"]
types = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ai = rng.randint(0, len(adjs), N_PART); ni = rng.randint(0, len(nouns), N_PART)
write("part", pa.table({
    "p_partkey": pa.array(range(N_PART), pa.int64()),
    "p_name": [f"{adjs[a]} {nouns[n]}" for a, n in zip(ai, ni)],
    "p_brand": [f"Brand#{i}" for i in rng.randint(1, 26, N_PART)],
    "p_type": np.array(types)[rng.randint(0, len(types), N_PART)],
    "p_size": pa.array(rng.randint(1, 51, N_PART), pa.int32()),
    "p_retailprice": np.round(900 + (np.arange(N_PART) % 20000) * 0.1, 2)}))

D0 = np.datetime64("1995-01-01")
span_days = (np.datetime64("2001-08-01") - D0).astype(int)
odate = D0 + rng.randint(0, span_days + 1, N_ORDERS).astype("timedelta64[D]")
prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
write("orders", pa.table({
    "o_orderkey": pa.array(range(N_ORDERS), pa.int64()),
    "o_custkey": pa.array(rng.randint(0, N_CUST, N_ORDERS), pa.int64()),
    "o_orderstatus": np.array(["O", "F", "P"])[rng.choice(3, N_ORDERS, p=[.5, .45, .05])],
    "o_totalprice": np.round(rng.uniform(1000, 400000, N_ORDERS), 2),
    "o_orderdate": pa.array(odate.astype("datetime64[us]")),
    "o_orderpriority": np.array(prios)[rng.randint(0, 5, N_ORDERS)]}))

sdate = D0 + rng.randint(1, span_days + 96, N_LINE).astype("timedelta64[D]")
write("lineitem", pa.table({
    "l_orderkey": pa.array(rng.randint(0, N_ORDERS, N_LINE), pa.int64()),
    "l_partkey": pa.array(rng.randint(0, N_PART, N_LINE), pa.int64()),
    "l_suppkey": pa.array(rng.randint(0, N_SUPP, N_LINE), pa.int64()),
    "l_linenumber": pa.array(rng.randint(1, 8, N_LINE), pa.int32()),
    "l_quantity": rng.randint(1, 51, N_LINE).astype(float),
    "l_extendedprice": np.round(rng.uniform(900, 105000, N_LINE), 2),
    "l_discount": np.round(rng.randint(0, 11, N_LINE) * 0.01, 2),
    "l_tax": np.round(rng.randint(0, 9, N_LINE) * 0.01, 2),
    "l_returnflag": np.array(["N", "A", "R"])[rng.choice(3, N_LINE, p=[.5, .25, .25])],
    "l_linestatus": np.array(["O", "F"])[rng.randint(0, 2, N_LINE)],
    "l_shipdate": pa.array(sdate.astype("datetime64[us]"))}))

T0 = np.datetime64("2024-01-01T00:00:00", "us")
offs = np.sort(rng.uniform(0, 30 * 86400_000_000, N_EVENTS)).astype("int64")
etypes = ["click", "error", "purchase", "signup", "view"]
write("events", pa.table({
    "event_id": pa.array(range(N_EVENTS), pa.int64()),
    "ts": pa.array(T0 + offs.astype("timedelta64[us]")),
    "user_id": pa.array(rng.randint(0, 15000, N_EVENTS), pa.int64()),
    "event_type": np.array(etypes)[rng.randint(0, 5, N_EVENTS)],
    "value": np.round(np.abs(rng.normal(0, 65, N_EVENTS)), 2),
    "props": [f'{{"k": {k}}}' for k in rng.randint(0, 100, N_EVENTS)]}))

VOCAB = ("spark window merge table column vector stream value data small "
         "join filter big group hash customer sort order slow line part "
         "fast the row agg key query a scan batch").split()
langs = ["de", "en", "es", "fr", "zh"]
texts, lang_col, src_col = [], [], []
for i in range(N_DOCS):
    r = rng.random_sample()
    if i > 100 and r < 0.002:          # exact duplicate of an earlier doc
        t = texts[rng.randint(0, i)]
    elif i > 100 and r < 0.012:        # near-duplicate: two words flipped
        w = texts[rng.randint(0, i)].split()
        for _ in range(2):
            w[rng.randint(0, len(w))] = "dup"
        t = " ".join(w)
    else:
        n = rng.randint(8, 100)
        t = " ".join(np.array(VOCAB)[rng.randint(0, len(VOCAB), n)])
    texts.append(t)
    lang_col.append(langs[rng.choice(5, p=[.12, .40, .12, .12, .24])])
    src_col.append(f"src{i % 20}")
write("documents", pa.table({
    "doc_id": pa.array(range(N_DOCS), pa.int64()),
    "text": texts, "lang": lang_col, "source": src_col,
    "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

E = rng.normal(0, 1, (N_VECS, 64))
# plant 0.5% near-duplicate vectors of earlier ids
for i in range(200, N_VECS):
    if rng.random_sample() < 0.005:
        j = rng.randint(0, i)
        E[i] = E[j] + rng.normal(0, 0.05, 64)
E = (E / np.linalg.norm(E, axis=1, keepdims=True)).astype(np.float32)
write("embeddings", pa.table({
    "vec_id": pa.array(range(N_VECS), pa.int64()),
    "embedding": pa.array([row for row in E.tolist()], pa.list_(pa.float32())),
    "label": pa.array(rng.randint(0, 10, N_VECS), pa.int32())}))
print("DONE", OUT)
