"""Deterministic local scale-up of the driver testdata (sf0.1 -> ~sf1)
for the scale rehearsal (BENCH_NOTES "sf0.1 -> sf1 scaling" table).

Usage: python tools/gen_scale.py [factor] [src_dir] [dst_dir]
Defaults: 10 /root/testdata/sf0.1 /root/repo/.cache/sf1

Each output table is `factor` key-offset copies of the source.  Fact
keys (user_id, doc_id, vec_id, orderkey, custkey, event_id) shift by
copy x max_key so uniqueness properties survive; copy 0 is the source
verbatim.  Content is PERTURBED per copy so the duplication structure
stays distribution-comparable instead of every row gaining factor-1
exact twins (which would turn the near-dup suites into an artificial
quadratic blowup the real corpus doesn't have):

- documents: ~30% of tokens get a per-(copy, token) suffix, chosen by
  xxhash64 — cross-copy Jaccard/SimHash similarity drops below the
  suite thresholds while within-copy duplicate structure is preserved
  exactly.
- embeddings: vectors rotate by a deterministic per-copy sign-flip +
  coordinate roll — norms and label geometry preserved, cross-copy
  cosine decorrelated.
- events/orders/lineitem/customer: keys shift; values/timestamps kept
  (10x series, 10x orders — the realistic growth axis).
- dimensions (region, nation, part, supplier): copied once, unscaled,
  like real dimension tables.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".cache",
            "sf1",
        )
    )
    from stdb_spark.session import get_spark

    spark = get_spark("gen-scale")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    copies = spark.range(factor).withColumnRenamed("id", "_k")

    # Fact tables write as MANY files.  The source sf0.1 tables are
    # single-file; a crossJoin-scaled copy inherits that and lands as
    # ONE parquet file with ONE row group — and parquet splits align to
    # row-group boundaries, so however many input splits Spark plans,
    # exactly one task gets all the rows.  Measured live in the r11
    # sf10 rehearsal: every documents-heavy stage ran (13 empty + 1
    # straggler)/14 — the whole gram pipeline on one core.  A real
    # 100 TB table is thousands of files; 32 here matches the local
    # core count (on a cluster you'd size by target file bytes).
    fact_files = 32

    def write(name, df, n_files=None):
        out = os.path.join(dst, f"{name}.parquet")
        if n_files:
            df = df.repartition(n_files)
        df.write.mode("overwrite").parquet(out)
        print(f"  {name}: {spark.read.parquet(out).count()} rows")

    # dimensions: verbatim, single file like real dim tables
    for t in ("region", "nation", "part", "supplier"):
        write(t, spark.read.parquet(f"{src}/{t}.parquet"))

    ev = spark.read.parquet(f"{src}/events.parquet")
    u_span = ev.agg(F.max("user_id")).first()[0] + 1
    e_span = ev.agg(F.max("event_id")).first()[0] + 1
    write(
        "events",
        ev.crossJoin(copies)
        .withColumn("event_id", (F.col("event_id") + F.col("_k") * e_span).cast("long"))
        .withColumn("user_id", (F.col("user_id") + F.col("_k") * u_span).cast("long"))
        .drop("_k"),
        n_files=fact_files,
    )

    cu = spark.read.parquet(f"{src}/customer.parquet")
    c_span = cu.agg(F.max("c_custkey")).first()[0] + 1
    write(
        "customer",
        cu.crossJoin(copies)
        .withColumn("c_custkey", (F.col("c_custkey") + F.col("_k") * c_span).cast("long"))
        .drop("_k"),
        n_files=fact_files,
    )

    o = spark.read.parquet(f"{src}/orders.parquet")
    ok_span = o.agg(F.max("o_orderkey")).first()[0] + 1
    write(
        "orders",
        o.crossJoin(copies)
        .withColumn("o_orderkey", (F.col("o_orderkey") + F.col("_k") * ok_span).cast("long"))
        .withColumn("o_custkey", (F.col("o_custkey") + F.col("_k") * c_span).cast("long"))
        .drop("_k"),
        n_files=fact_files,
    )

    li = spark.read.parquet(f"{src}/lineitem.parquet")
    write(
        "lineitem",
        li.crossJoin(copies)
        .withColumn("l_orderkey", (F.col("l_orderkey") + F.col("_k") * ok_span).cast("long"))
        .drop("_k"),
        n_files=fact_files,
    )

    docs = spark.read.parquet(f"{src}/documents.parquet")
    d_span = docs.agg(F.max("doc_id")).first()[0] + 1
    # per-(copy, position-salted token) mutation: ~30% of tokens in
    # copies k>0 gain a copy suffix — deterministic, order-free
    mutated = F.array_join(
        F.transform(
            F.split("text", " "),
            lambda tok: F.when(
                (F.col("_k") > 0)
                & (F.pmod(F.xxhash64(tok, F.col("_k")), F.lit(10)) < 3),
                F.concat(tok, F.lit("c"), F.col("_k").cast("string")),
            ).otherwise(tok),
        ),
        " ",
    )
    write(
        "documents",
        docs.crossJoin(copies)
        .withColumn("doc_id", (F.col("doc_id") + F.col("_k") * d_span).cast("long"))
        .withColumn("text", mutated)
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("_k"),
        n_files=fact_files,
    )

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    v_span = emb.agg(F.max("vec_id")).first()[0] + 1
    dim = len(emb.first()["embedding"])
    # per-copy deterministic decorrelation: roll coordinates by k and
    # flip signs by bit-parity of (k, index) — an orthogonal transform
    # (norms exact, within-copy geometry preserved, cross-copy cosine
    # scrambled)
    rolled = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.element_at(
            "embedding", (F.pmod(i + F.col("_k"), F.lit(dim)) + 1).cast("int")
        )
        * F.when(F.pmod(F.xxhash64(i, F.col("_k")), F.lit(2)) == 0, F.lit(1.0))
        .otherwise(F.lit(-1.0))
        .cast("float"),
    )
    write(
        "embeddings",
        emb.crossJoin(copies)
        .withColumn("vec_id", (F.col("vec_id") + F.col("_k") * v_span).cast("long"))
        .withColumn(
            "embedding",
            F.when(F.col("_k") == 0, F.col("embedding")).otherwise(
                rolled.cast("array<float>")
            ),
        )
        .drop("_k"),
        n_files=fact_files,
    )
    print(f"done -> {dst}")
    spark.stop()


if __name__ == "__main__":
    main()
