#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), re-runs
the matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
same sfDir parquet tables, and compares rows / schema (column names) / value
hash, like the driver does: columns sorted by name, values stringified.
"""
import sys, os, json, glob, hashlib

import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Names eligible for GRAFT_SAMPLE_DOCS: pairwise operators whose oracle twin
# carries the /*GRAFT_DOC_SAMPLE*/ marker in its base-corpus CTE and whose
# pair semantics depend only on the two endpoint docs (signatures/grams are
# per-doc, so a corpus restriction restricts the result set exactly).
# dedup_exact is NOT eligible: its keep_id is the min over a full hash
# group, which a corpus cut changes.
DOC_SAMPLED = {"dedup_minhash", "dedup_simhash", "dedup_fingerprint",
               "ngram_jaccard"}
# Names eligible for GRAFT_SAMPLE_QUERIES: ANN twins with the
# /*GRAFT_QUERY_SAMPLE*/ marker — per-query independence, full training.
QUERY_SAMPLED = {"ann_ivf", "ann_ivf_index", "ann_ivfpq", "ann_ivfpq_index"}
# Doc-sampled names whose operator carries a maxBucket degenerate-bucket
# guard. The guard thresholds FULL-corpus bucket counts, which a sampled
# twin cannot know — but sample ⊆ corpus means sampled_count ≤ full_count,
# so every bucket Spark kept (full ≤ maxBucket) the sampled twin also
# keeps: spark ⊆ oracle holds BY CONSTRUCTION, and the only legal
# divergence is oracle SURPLUS pairs from buckets the full corpus shed
# (e.g. a 1079-member simhash block sampling to ~108). Under doc sampling
# these names therefore use an EXACT SUBSET compare: every Spark row must
# appear in the oracle byte-identically (a real kernel bug still fails),
# and the surplus — pairs only the full-corpus guard removed — is
# reported and bounded. The shed semantics themselves are adjudicated
# EXACTLY by the full-twin gates at sf0.01/0.1/1.
SHED_GUARDED = {"dedup_minhash", "dedup_simhash", "dedup_fingerprint"}
# surplus beyond this fraction of oracle rows is not explainable as a
# shed boundary and fails the check
SHED_SURPLUS_MAX = 0.01


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6g}" if v == v else "NaN"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_digest(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    h = hashlib.sha256()
    data = [tbl.column(c).to_pylist() for c in cols]
    for row in zip(*data) if data else []:
        h.update(("|".join(norm_cell(v) for v in row) + "\n").encode())
    return h.hexdigest()


def check_events_no_boundary_gap(con):
    """Testdata guard for q10/q13: the sessionizers agree at an EXACT
    30-minute gap by construction (both continue the session; pinned by
    RelationalSpec's boundary test on a temp parquet), but the shared
    DuckDB oracle would also mask a divergence as long as the GENERATED
    events never land exactly on the boundary. Assert that here — in the
    oracle harness, where the testdata contract belongs — so the Scala
    spec carries only production-path assertions.
    """
    n = con.execute(
        "SELECT count(*) FROM ("
        "  SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER ("
        "    PARTITION BY user_id ORDER BY ts, event_id) AS gap"
        "  FROM events) WHERE gap = 1800000000"
    ).fetchone()[0]
    if n:
        print(f"FAIL testdata: {n} exact-30-min gap(s) in events — the "
              "q10/q13 oracle compare cannot adjudicate the session "
              "boundary on this data")
        sys.exit(1)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            # driver testdata is one pyarrow FILE per table; Spark-written
            # twins (ReplicateSf) are DIRECTORIES of part files — glob them
            if os.path.isdir(p):
                p = os.path.join(p, "*.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    # The testdata-contract guards protect the DRIVER corpus's adjudication
    # assumptions (a silent green must not rest on data that cannot
    # distinguish the two sides). The hostile differentials
    # (tools/*_differential.py) deliberately feed guard-violating data to
    # make divergence VISIBLE — they opt out explicitly.
    if not os.environ.get("GRAFT_HOSTILE_DATA"):
        if os.path.exists(os.path.join(sf_dir, "events.parquet")):
            check_events_no_boundary_gap(con)
        # The flat-text guard (check_documents_flat_text) retired in round
        # 16: the four line-structured twins now implement the REAL line
        # semantics (per-line keep rule, corpus line frequency, page/
        # header/footer stripping) and adjudicate line-bearing text —
        # tools/lines_differential.py proves it against a hostile line
        # corpus, so driver docs growing newlines would no longer break
        # the compare.
    results, n_pass = {}, 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and name not in only:
            continue
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "err": None}
        try:
            files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
            # Sampled adjudication — three deterministic md5-cutoff modes
            # for results whose full DuckDB re-derivation is too expensive
            # at sf10-class corpora. All cuts evaluate in DuckDB on BOTH
            # sides, so the sampling function is engine-identical by
            # construction; the COMPARE is still Spark output vs oracle
            # output on the same subset. Sampling applies only to
            # ORACLE-adjudicated names: a rows-only query has no oracle
            # side to restrict, and cutting its Spark rows could sample a
            # small result to 0 rows and spuriously fail the rows>0 check.
            #
            #  - GRAFT_SAMPLE_PAIRS=<den>: pair results (id1/id2 columns)
            #    restrict to pairs whose md5(id1||'|'||id2) head falls
            #    under the cutoff. The cut sits ABOVE the oracle pipeline
            #    (pruning only the final pair rows) — right for twins
            #    whose cost is in the pair expansion/verify stage (the
            #    40k-doc ngram_jaccard 58M-pair run passes on a 45k
            #    sample; dedup_semantic's in-cell cosine verify prunes the
            #    same way).
            #  - GRAFT_SAMPLE_DOCS=<den>: for the per-doc-signature twins
            #    (DOC_SAMPLED below) the expensive work is per-DOCUMENT
            #    (murmur/xxhash signatures for every doc), which a pair
            #    cut cannot prune — so the cut goes INSIDE the twin: the
            #    /*GRAFT_DOC_SAMPLE*/ marker in its base-corpus CTE
            #    becomes a WHERE on md5(doc_id), signatures are computed
            #    only for the ~1/den sampled base docs (planted mutants
            #    follow their base doc), and the Spark side restricts to
            #    pairs with BOTH endpoint base ids in the sample (~1/den²
            #    of pairs). Sound because these operators are pairwise:
            #    a pair's emission depends only on its two docs'
            #    signatures, so the restricted result equals the full
            #    result restricted — except a full-corpus maxBucket shed
            #    that the sampled corpus no longer triggers, which would
            #    surface loudly as extra oracle rows, not silently.
            #  - GRAFT_SAMPLE_QUERIES=<den>: for the ANN twins
            #    (QUERY_SAMPLED) training + corpus assignment must stay
            #    FULL (the quantizer depends on every vector) but each
            #    query is independent — the /*GRAFT_QUERY_SAMPLE*/ marker
            #    cuts the twin's query CTE on md5(vec_id) and both sides
            #    restrict to the sampled query_ids.
            sample_den = int(os.environ.get("GRAFT_SAMPLE_PAIRS", "0") or 0)
            doc_den = int(os.environ.get("GRAFT_SAMPLE_DOCS", "0") or 0)
            query_den = int(os.environ.get("GRAFT_SAMPLE_QUERIES", "0") or 0)
            schema_names = set(pq.read_schema(files[0]).names)
            oracle_sql = oracle.get(name)
            conds = []

            def md5_cut(expr, den):
                return (f"('0x' || substr(md5({expr} || ''), 1, 8))::BIGINT"
                        f" * {den} < 4294967296")

            # planted ids sit at base+1e6 (exact copies) / base+2e6 (near
            # copies) / base+1e5 (embedding mutants); replica shifts are
            # multiples of 1e7 — so base id = id minus its planted offset
            def base_id(col):
                return f"({col} - 1000000*(({col} % 10000000) // 1000000))"

            if sample_den and oracle_sql and {"id1", "id2"} <= schema_names:
                conds.append(f"('0x' || substr(md5(id1 || '|' || id2), 1, 8))::BIGINT"
                             f" * {sample_den} < 4294967296")
                entry["sampled_den"] = sample_den
            if doc_den and oracle_sql and name in DOC_SAMPLED:
                oracle_sql = oracle_sql.replace(
                    "/*GRAFT_DOC_SAMPLE*/", f"WHERE {md5_cut('doc_id', doc_den)}")
                conds.append(f"({md5_cut(base_id('id1'), doc_den)}) AND "
                             f"({md5_cut(base_id('id2'), doc_den)})")
                entry["sampled_docs_den"] = doc_den
            if query_den and oracle_sql and name in QUERY_SAMPLED:
                oracle_sql = oracle_sql.replace(
                    "/*GRAFT_QUERY_SAMPLE*/", f"AND {md5_cut('vec_id', query_den)}")
                conds.append(md5_cut("query_id", query_den))
                entry["sampled_queries_den"] = query_den

            if conds:
                order_by = ", ".join(f'"{c}"' for c in sorted(schema_names))
                where = " AND ".join(f"({c})" for c in conds)
                entry["spark_rows_full"] = sum(
                    pq.read_metadata(f).num_rows for f in files)
                spark_tbl = con.execute(
                    f"SELECT * FROM read_parquet({files!r}) WHERE {where} "
                    f"ORDER BY {order_by}").fetch_arrow_table()
                oracle_for_name = (f"SELECT * FROM (\n{oracle_sql}\n) "
                                   f"WHERE {where} ORDER BY {order_by}")
            else:
                spark_tbl = pq.read_table(files[0]) if len(files) == 1 else \
                    pa.concat_tables([pq.read_table(f) for f in files])
                oracle_for_name = oracle_sql
            entry["spark_rows"] = spark_tbl.num_rows
            if name not in oracle:
                entry["rows_match"] = spark_tbl.num_rows > 0
                entry["schema_match"] = entry["hash_match"] = None
                entry["err"] = None if spark_tbl.num_rows > 0 else "0 rows (rows-only check)"
                results[name] = entry
                if entry["rows_match"]:
                    n_pass += 1
                continue
            duck_tbl = con.execute(oracle_for_name).fetch_arrow_table()
            entry["oracle_rows"] = duck_tbl.num_rows
            if doc_den and name in DOC_SAMPLED and name in SHED_GUARDED:
                # exact SUBSET compare (see SHED_GUARDED): every Spark row
                # byte-identical in the oracle; surplus = full-corpus-shed
                # pairs only, bounded
                entry["schema_match"] = \
                    sorted(spark_tbl.column_names) == sorted(duck_tbl.column_names)
                scols = sorted(spark_tbl.column_names)

                def rowset(tbl):
                    data = [tbl.column(c).to_pylist() for c in scols]
                    return {"|".join(norm_cell(v) for v in row)
                            for row in (zip(*data) if data else [])}
                sset, oset = rowset(spark_tbl), rowset(duck_tbl)
                surplus = len(oset - sset)
                missing = len(sset - oset)
                ok = (entry["schema_match"] and missing == 0 and
                      surplus <= max(1, int(SHED_SURPLUS_MAX * max(1, duck_tbl.num_rows))))
                entry["rows_match"] = ok
                entry["hash_match"] = None
                entry["shed_subset"] = {"surplus": surplus, "missing": missing}
                if not ok:
                    entry["err"] = (f"shed-subset check failed: {missing} spark "
                                    f"rows missing from oracle, surplus {surplus}")
                results[name] = entry
                if ok:
                    n_pass += 1
                continue
            entry["rows_match"] = spark_tbl.num_rows == duck_tbl.num_rows
            entry["schema_match"] = sorted(spark_tbl.column_names) == sorted(duck_tbl.column_names)
            if entry["rows_match"] and entry["schema_match"]:
                hs, hd = table_digest(spark_tbl), table_digest(duck_tbl)
                entry["hash_match"] = hs == hd
                if not entry["hash_match"]:
                    # show first differing row to debug
                    scols = sorted(spark_tbl.column_names)
                    sp = list(zip(*[spark_tbl.column(c).to_pylist() for c in scols]))
                    du = list(zip(*[duck_tbl.column(c).to_pylist() for c in scols]))
                    for i, (a, b) in enumerate(zip(sp, du)):
                        if [norm_cell(v) for v in a] != [norm_cell(v) for v in b]:
                            entry["err"] = f"first diff row {i}: spark={a} oracle={b} cols={scols}"
                            break
            else:
                entry["err"] = (f"rows {spark_tbl.num_rows} vs {duck_tbl.num_rows}; "
                                f"cols {sorted(spark_tbl.column_names)} vs {sorted(duck_tbl.column_names)}")
        except Exception as e:
            entry["err"] = f"{type(e).__name__}: {e}"[:500]
        results[name] = entry
        if entry["rows_match"] and entry["schema_match"] in (True, None) and entry["hash_match"] in (True, None):
            n_pass += 1
    for name, r in results.items():
        ok = r["rows_match"] and r["schema_match"] in (True, None) and r["hash_match"] in (True, None)
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name}: rows={r.get('spark_rows')}/{r.get('oracle_rows','-')} "
              f"schema={r['schema_match']} hash={r['hash_match']}"
              + (f" err={r['err']}" if r["err"] else ""))
    print(f"== {n_pass}/{len(results)} pass ==")
    sys.exit(0 if n_pass == len(results) else 1)


if __name__ == "__main__":
    main()
