#!/usr/bin/env python3
"""Regenerate the committed BPE merge-table fixture oracles.

The greedy BPE fold is not SQL-expressible, so t_bpe_train /
t_bpe_train_driver carry SELF-ORACLES: the merge tables produced by
the implementation (independently pinned bit-equal to an in-JVM
reference implementation in BpeSuite) are committed as VALUES
fixtures, dispatched on a corpus fingerprint (sum(length(text))) so
one oracle string serves every known scale factor. A content
regression in either trainer turns the driver gate red instead of
passing rows-only.

Usage: python3 tools/gen_bpe_oracle.py <verifyOut_sf0.001> <verifyOut_sf0.01>
Paste the printed Scala snippets over the existing oracle entries.
"""
import sys

import duckdb

con = duckdb.connect()


def fingerprint(sf_dir):
    return con.execute(
        "SELECT sum(length(text)) FROM "
        f"read_parquet('{sf_dir}/documents.parquet')").fetchone()[0]


def rows(out_dir, gate):
    return con.execute(
        f"SELECT * FROM read_parquet('{out_dir}/{gate}/*.parquet') "
        "ORDER BY rank").fetchall()


def sql_for(gate, fixtures):
    # fixtures: list of (fingerprint, rows)
    blocks = []
    for fp, rs in fixtures:
        vals = ",".join(
            f"({r},'{l}','{rt}',{c})" for r, l, rt, c in rs)
        blocks.append(
            "SELECT rank::INTEGER AS rank, l AS \"left\", "
            "r AS \"right\", c::BIGINT AS pair_count "
            f"FROM (VALUES {vals}) fix(rank, l, r, c) "
            f"WHERE (SELECT sum(length(text)) FROM documents) = {fp}")
    return " UNION ALL ".join(blocks) + " ORDER BY rank"


def scala_string(s, width=68):
    # chunk into a Scala concatenation of short literals
    chunks = [s[i:i + width] for i in range(0, len(s), width)]
    lines = ['        "' + c.replace('"', '\\"') + '" +'
             for c in chunks]
    lines[-1] = lines[-1][:-2]
    return "\n".join(lines)


def main(out1, out2):
    fps = [fingerprint(d) for d in
           ("/root/testdata/sf0.001", "/root/testdata/sf0.01")]
    assert fps[0] != fps[1], "corpus fingerprints collide"
    for gate in ("t_bpe_train", "t_bpe_train_driver"):
        fixtures = [(fps[0], rows(out1, gate)), (fps[1], rows(out2, gate))]
        for l, r in [(a, b) for _, rs in fixtures for _, a, b, _ in rs]:
            assert "'" not in l + r and "\\" not in l + r, (l, r)
        # parenthesize: -> and + share Scala infix precedence, so a
        # bare chunk concatenation would parse as (k -> c1) + c2
        print(f'    "{gate}" -> (')
        print(scala_string(sql_for(gate, fixtures)) + "),")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
