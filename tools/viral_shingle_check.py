#!/usr/bin/env python3
"""Cross-engine teeth check for the NgramDfCap mirror (round 11).

PairMiningSpec pins the SPARK side of ngramPairs on a synthetic corpus
where one shingle's df exceeds NgramDfCap; this script pins the DUCKDB
side: it rebuilds the SAME corpus, runs the q_dedup_ngram oracle SQL
(which embeds the capped-postings CTE) against it, and compares with an
independent capped recompute in plain Python. Both engines checked
against one independent semantics = structural agreement, corpus be
damned.

Usage:
    python3 tools/viral_shingle_check.py <oracle_sql.json>

where <oracle_sql.json> is any Verify dump's oracle map (the script
reads the q_dedup_ngram entry so it always tests the LIVE CTE).
"""
import itertools
import json
import re
import sys

import duckdb

# graft.operators.TextPipeline.NgramDfCap — parsed from the live oracle
# SQL in main() so a Scala-side cap change can't silently no-op the
# teeth check (ADVICE r11 #3); module-level default only for corpus().
CAP = 256


def corpus():
    docs = []
    for k in range(CAP + 20):
        p = k // 2
        uniq = " ".join(f"u{k}_{i}" for i in range(3))
        docs.append((k, f"v0 v1 v2 s{p}_a s{p}_b s{p}_c s{p}_d s{p}_e "
                     + uniq))
    docs.append((9000, "v0 v1 v2 dup dup2 dup3 dup4 dup5 dup6"))
    docs.append((9001, "v0 v1 v2 dup dup2 dup3 dup4 dup5 dup6"))
    return docs


def expected(docs):
    sets = {i: {" ".join(t.split(" ")[j:j + 3])
                for j in range(len(t.split(" ")) - 2)} for i, t in docs}
    df = {}
    for sh in sets.values():
        for g in sh:
            df[g] = df.get(g, 0) + 1
    kept = {g for g, n in df.items() if 2 <= n <= CAP}
    out = set()
    for i, j in itertools.combinations(sorted(sets), 2):
        inter = len(sets[i] & sets[j] & kept)
        union = len(sets[i]) + len(sets[j]) - inter
        jac = inter / union if union else float("nan")
        if union and jac >= 0.5:
            out.add((i, j, inter, jac))
    return out


def main(oracle_json):
    global CAP
    sql = json.load(open(oracle_json))["q_dedup_ngram"]
    m = re.search(r"HAVING COUNT\(\*\) BETWEEN 2 AND (\d+)", sql)
    assert m, "df-cap clause not found in q_dedup_ngram oracle — " \
        "the CTE shape drifted; update this script's replace targets"
    CAP = int(m.group(1))
    assert CAP == 256, f"NgramDfCap drifted to {CAP}: update the " \
        "expected() assertion below if intentional"
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", corpus())
    got = set(map(tuple, con.sql(sql).fetchall()))
    want = expected(corpus())
    assert want == {(9000, 9001, 6, 0.75)}, \
        f"synthetic expectation drifted: {want}"
    if got != want:
        print(f"FAIL: DuckDB CTE returned {sorted(got)[:5]}... "
              f"({len(got)} rows), capped expectation {sorted(want)}")
        return 1
    # teeth: uncapped semantics WOULD differ on this corpus
    uncapped = con.sql(sql.replace(
        f"HAVING COUNT(*) BETWEEN 2 AND {CAP}",
        "HAVING COUNT(*) >= 2")).fetchall()
    if set(map(tuple, uncapped)) == want:
        print("FAIL: corpus does not separate capped from uncapped — "
              "no teeth")
        return 1
    print(f"ok: DuckDB capped CTE matches the independent recompute "
          f"({len(got)} pair) and diverges from uncapped "
          f"({len(uncapped)} pairs) as designed")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
