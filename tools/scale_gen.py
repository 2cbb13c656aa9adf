#!/usr/bin/env python3
"""Materialize an N x disjoint-copy scale-up of the testdata dir (the
ScaleProbe copy semantics, persisted as a real sf-dir layout so BOTH
engines read identical parquet): fact tables get id-offset copies with
their referenced dims offset consistently (joins keep 1:1 semantics per
copy), documents get alphabet-ROTATED text per copy (disjoint token
spaces - near-dup pair structure stays per-copy), embeddings get
dimension-ROTATED vectors per copy (rotation is an isometry - within-
copy cosines exactly preserved). events keeps its TIMESTAMP type (the
engine's nanosAsLong path and the DuckDB oracle both depend on the
parquet logical type).

Usage: scale_gen.py <srcSfDir> <outDir> [factor=10]
"""
import os, string, sys
import duckdb

M = 1_000_000
G = 1_000_000_000


def rot(k):
    a = string.ascii_lowercase
    return a[k % 26:] + a[:k % 26]


def main(src, out, factor=10):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql("SET threads TO 16")

    def gen(table, select_fmt):
        parts = [select_fmt.format(k=k) for k in range(factor)]
        q = " UNION ALL ".join(
            f"SELECT {p} FROM '{src}/{table}.parquet'" for p in parts)
        con.sql(f"COPY ({q}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        print(f"{table}: x{factor}")

    for t in ("region", "nation", "supplier"):
        con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: verbatim")

    gen("customer", "c_custkey + {k} * " + str(M) + " AS c_custkey, "
        "c_name, c_nationkey, c_acctbal, c_mktsegment")
    gen("part", "p_partkey + {k} * " + str(M) + " AS p_partkey, p_name, "
        "p_brand, p_type, p_size, p_retailprice")
    gen("orders", "o_orderkey + {k}::BIGINT * " + str(G) + " AS o_orderkey, "
        "o_custkey + {k} * " + str(M) + " AS o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority")
    gen("lineitem", "l_orderkey + {k}::BIGINT * " + str(G) + " AS l_orderkey, "
        "l_partkey + {k} * " + str(M) + " AS l_partkey, l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate")
    gen("events", "event_id + {k} * " + str(M) + " AS event_id, ts, "
        "user_id + {k} * " + str(M) + " AS user_id, event_type, value, "
        "props")

    # documents: rotate the LOWERCASED text (tokenizers lowercase
    # downstream; rotating raw text would leave uppercase letters
    # unrotated and couple the copies' token spaces)
    doc_parts = []
    for k in range(factor):
        doc_parts.append(
            f"SELECT doc_id + {k * M} AS doc_id, "
            f"translate(lower(text), '{rot(0)}', '{rot(k)}') AS text, "
            f"lang, source, n_chars FROM '{src}/documents.parquet'")
    con.sql(f"COPY ({' UNION ALL '.join(doc_parts)}) "
            f"TO '{out}/documents.parquet' (FORMAT PARQUET)")
    print(f"documents: x{factor} (rotated)")

    # embeddings: cyclic dim rotation per copy (isometry)
    dim = len(con.sql(
        f"SELECT embedding FROM '{src}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0])
    emb_parts = []
    for k in range(factor):
        s = (k * 7) % dim
        if s == 0:
            e = "embedding"
        else:
            e = (f"list_concat(embedding[{s + 1}:{dim}], "
                 f"embedding[1:{s}]) ")
        emb_parts.append(
            f"SELECT vec_id + {k * M} AS vec_id, {e} AS embedding "
            f"FROM '{src}/embeddings.parquet'")
    con.sql(f"COPY ({' UNION ALL '.join(emb_parts)}) "
            f"TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    print(f"embeddings: x{factor} (dim-rotated, dim={dim})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 10)
