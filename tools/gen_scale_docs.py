"""Generate a 10x-scale rehearsal dataset (sf1-shaped documents +
embeddings) by bootstrap-resampling the sf0.1 tables' empirical
distributions — token frequencies, token-count-per-doc, lang/source
mixes, exact-dup rate, embedding coordinate distribution — so the
dedup/ANN bench workload keeps its statistical shape at 10x rows.

Usage: python tools/gen_scale_docs.py [out_dir] [scale] [--files-per-table N]
Default out_dir=/tmp/sfscale1, scale=10 (50k docs, 20k vectors),
files-per-table 32.

File layout (r13 verdict item 6): by default each table is written as
a parquet DIRECTORY of N files >= cores — the realistic 100 TB layout,
where every scan stage starts wide.  The original single-file form
(``--files-per-table 1``) packs the whole table into one parquet row
group, which serializes on one core ANY expression Catalyst evaluates
inside the scan stage — the entire r13 one-row-group straggler family
was an artifact of that layout.  Keep a narrow copy around as the
regression canary for the pushdown class.

The driver's /root/testdata is read-only; rehearsal data is scratch
(regenerate on demand, deterministic under seed 42 — the row CONTENT
is identical at any file count; only the file split differs).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def write_split(tbl: pa.Table, dest: str, n_files: int) -> None:
    """Write ``tbl`` as a single parquet file (n_files=1, legacy
    narrow layout) or a directory of ``n_files`` row-slice files."""
    if n_files <= 1:
        pq.write_table(tbl, dest)
        return
    if os.path.isfile(dest):
        os.remove(dest)
    os.makedirs(dest, exist_ok=True)
    n = tbl.num_rows
    step = (n + n_files - 1) // n_files
    for i in range(n_files):
        lo = i * step
        if lo >= n:
            break
        pq.write_table(
            tbl.slice(lo, min(step, n - lo)),
            os.path.join(dest, f"part-{i:05d}.parquet"),
        )


def main() -> None:
    argv = sys.argv[1:]
    n_files = 32
    if "--files-per-table" in argv:
        i = argv.index("--files-per-table")
        n_files = int(argv[i + 1])
        del argv[i:i + 2]
    out = argv[0] if argv else "/tmp/sfscale1"
    scale = int(argv[1]) if len(argv) > 1 else 10
    rng = np.random.default_rng(42)
    con = duckdb.connect()

    # ORDER BY everywhere a result feeds the rng (r14): DuckDB's
    # parallel hash aggregation returns groups in nondeterministic
    # order, and rng.choice over a reordered vocab/freq array yields a
    # DIFFERENT corpus realization per run — the "deterministic under
    # seed 42" contract silently did not hold before this.
    toks = con.execute(
        f"""SELECT tok, count(*) AS n FROM (
            SELECT unnest(regexp_split_to_array(trim(text), ' +')) AS tok
            FROM read_parquet('{SRC}/documents.parquet')) GROUP BY tok
            ORDER BY tok"""
    ).fetchall()
    vocab = np.array([t for t, _ in toks])
    freq = np.array([n for _, n in toks], dtype=float)
    freq /= freq.sum()
    lens = np.array(
        [
            r[0]
            for r in con.execute(
                f"""SELECT len(regexp_split_to_array(trim(text), ' +'))
                    FROM read_parquet('{SRC}/documents.parquet')
                    ORDER BY doc_id"""
            ).fetchall()
        ]
    )
    meta = con.execute(
        f"SELECT lang, source FROM read_parquet('{SRC}/documents.parquet') "
        "ORDER BY doc_id"
    ).fetchall()
    langs = np.array([m[0] for m in meta])
    sources = np.array([m[1] for m in meta])
    n_src = con.execute(
        f"SELECT count(*) FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    n_dups_src = n_src - con.execute(
        f"""SELECT count(DISTINCT md5(text))
            FROM read_parquet('{SRC}/documents.parquet')"""
    ).fetchone()[0]

    n = n_src * scale
    texts = []
    for i in range(n):
        k = int(rng.choice(lens))
        texts.append(" ".join(rng.choice(vocab, size=k, p=freq)))
    # exact-dup rate scaled from the source table (8/5000 at sf0.1)
    for _ in range(n_dups_src * scale):
        a, b = rng.integers(0, n, size=2)
        texts[int(a)] = texts[int(b)]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(rng.choice(langs, size=n), pa.string()),
            "source": pa.array(rng.choice(sources, size=n), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    os.makedirs(out, exist_ok=True)
    write_split(tbl, f"{out}/documents.parquet", n_files)

    n_vec = (
        con.execute(
            f"SELECT count(*) FROM read_parquet('{SRC}/embeddings.parquet')"
        ).fetchone()[0]
        * scale
    )
    emb = rng.normal(0.0, 0.12, size=(n_vec, 64)).astype(np.float32)
    etbl = pa.table(
        {
            "vec_id": pa.array(range(n_vec), pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, 8, size=n_vec), pa.int32()
            ),
        }
    )
    write_split(etbl, f"{out}/embeddings.parquet", n_files)
    print(
        f"wrote {out}: {n} docs, {n_vec} vectors, "
        f"{n_files} file(s) per table"
    )


if __name__ == "__main__":
    main()
