"""Adversarial-skew bench: the 100 TB story under hostile inputs.

Three skew classes that kill naive plans at crawl scale, each run
uniform vs adversarial on the same session and row count, printing
one JSON line and appending a row block to BENCH/SKEW.md:

  giant-page  one huge HTML page among N uniform pages through the
              full extract() path. The (size_bucket, crc32(url))
              repartition isolates the giant in its own partition;
              the pass criterion is wall(adversarial) close to
              max(wall(uniform), wall(giant alone)) — the giant's
              parse is irreducible per-row work, so the only honest
              win is that it does not SERIALIZE the rest of the
              corpus behind it.
  host-skew   one host owning 50% of rows through the host-keyed
              aggregation path (groupBy host). Spark's partial
              aggregation (map-side combine) absorbs key skew for
              algebraic aggs; criterion: within 2x of uniform.
  lsh-band    30% of the corpus sharing one near-identical text
              (one degenerate LSH band bucket) through
              minhash_lsh_pairs. The max_bucket cap bounds the
              candidate explosion; criterion: within 2x of uniform.

Usage:  python tools/skew_bench.py [--cpus 8] [--pages 16000]
        [--docs 30000] [--giant-mb 24] [--write-md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _timed(fn, reps: int = 2):
    """min-of-N wall time (the r3 bench lesson: single-shot timings
    on a shared host are noise; the min is the capacity number)."""
    best, out = None, None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def giant_page_case(spark, n_pages: int, giant_mb: int) -> dict:
    import pyspark.sql.functions as F

    from tika_spark.fixtures.pages import generate_pages_df
    from tika_spark.pipeline.job import extract

    pages = generate_pages_df(spark, n_pages, partitions=8)
    giant_html = ("<html><head><title>giant</title></head><body>"
                  + "<div class=x><p>some paragraph text with words "
                  "<a href='/l'>link</a></p></div>\n"
                  * (giant_mb * 13000)
                  + "</body></html>").encode()
    giant = spark.createDataFrame(
        [("http://giant.example/one", None, bytearray(giant_html),
          None, None, "synthetic")],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, source string")

    def run(df):
        return (extract(df, mode="text")
                .agg(F.count("*"), F.sum("n_chars")).collect())

    run(generate_pages_df(spark, 500, partitions=8))   # warm workers
    w_uniform, _ = _timed(lambda: run(pages))
    w_giant, _ = _timed(lambda: run(giant))
    w_adv, _ = _timed(lambda: run(pages.unionByName(giant)))
    floor = max(w_uniform, w_giant)
    return {"case": "giant-page", "n_pages": n_pages,
            "giant_mb": giant_mb,
            "wall_uniform_s": round(w_uniform, 2),
            "wall_giant_alone_s": round(w_giant, 2),
            "wall_adversarial_s": round(w_adv, 2),
            "floor_s": round(floor, 2),
            "ratio_vs_floor": round(w_adv / floor, 3),
            "pass_2x": w_adv <= 2 * floor}


def giant_capped_case(spark, n_pages: int, giant_mb: int,
                      cap_mb: int) -> dict:
    """The input-byte-cap policy case (round-5 fix of the giant-page
    residual): one giant_mb HTML page among n_pages uniform pages,
    run WITH ``ExtractConfig.max_input_bytes`` = cap_mb.  The giant
    parses only its cap_mb prefix (status='input_capped'), so the
    adversarial wall is bounded by max(uniform wall, cap-prefix
    parse) no matter how large the page is."""
    import pyspark.sql.functions as F

    from tika_spark.config import ExtractConfig
    from tika_spark.fixtures.pages import generate_pages_df
    from tika_spark.pipeline.job import extract

    cfg = ExtractConfig(mode="text",
                        max_input_bytes=cap_mb << 20)
    pages = generate_pages_df(spark, n_pages, partitions=8)
    giant_html = ("<html><head><title>giant</title></head><body>"
                  + "<div class=x><p>some paragraph text with words "
                  "<a href='/l'>link</a></p></div>\n"
                  * (giant_mb * 13000)
                  + "</body></html>").encode()
    giant = spark.createDataFrame(
        [("http://giant.example/one", None, bytearray(giant_html),
          None, None, "synthetic")],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, source string")

    def run(df):
        out = extract(df, mode="text", config=cfg)
        by = dict(out.groupBy("status").count().collect())
        return by

    run(generate_pages_df(spark, 500, partitions=8))   # warm workers
    w_uniform, _ = _timed(lambda: run(pages))
    w_prefix, _ = _timed(lambda: run(giant))   # cap_mb prefix alone
    w_adv, by = _timed(lambda: run(pages.unionByName(giant)))
    floor = max(w_uniform, w_prefix)
    return {"case": "giant-page-capped", "n_pages": n_pages,
            "giant_mb": giant_mb, "cap_mb": cap_mb,
            "status_counts": by,
            "capped_rows": by.get("input_capped", 0),
            "wall_uniform_s": round(w_uniform, 2),
            "wall_capped_prefix_alone_s": round(w_prefix, 2),
            "wall_adversarial_s": round(w_adv, 2),
            "floor_s": round(floor, 2),
            "ratio_vs_floor": round(w_adv / max(floor, 0.001), 3),
            "pass_2x": w_adv <= 2 * floor
            and by.get("input_capped", 0) == 1}


def host_skew_case(spark, n_rows: int) -> dict:
    import pyspark.sql.functions as F

    def table(skewed: bool):
        host = (F.when(F.col("id") % 2 == 0, F.lit("h0.example"))
                if skewed else
                F.concat(F.lit("h"), F.col("id") % 1000,
                         F.lit(".example")))
        if skewed:
            host = host.otherwise(
                F.concat(F.lit("h"), F.col("id") % 1000,
                         F.lit(".example")))
        return (spark.range(n_rows).repartition(8)
                .select(host.alias("host"),
                        F.md5(F.col("id").cast("string"))
                        .alias("text")))

    def run(df):
        return (df.groupBy("host")
                .agg(F.count("*").alias("n"),
                     F.sum(F.length("text")).alias("chars"))
                .agg(F.count("*"), F.max("n")).collect())

    w_uniform, _ = _timed(lambda: run(table(False)))
    w_adv, r = _timed(lambda: run(table(True)))
    return {"case": "host-skew", "n_rows": n_rows,
            "max_key_share": 0.5,
            "wall_uniform_s": round(w_uniform, 2),
            "wall_adversarial_s": round(w_adv, 2),
            "ratio": round(w_adv / w_uniform, 3),
            "pass_2x": w_adv <= 2 * w_uniform}


def lsh_band_case(spark, n_docs: int) -> dict:
    import pyspark.sql.functions as F

    from tika_spark.analysis.dedup import minhash_lsh_pairs

    viral = ("breaking news story shared everywhere on the web "
             "today with the same viral paragraph of text " * 6)

    def table(skewed: bool):
        uniq = F.concat(
            F.lit("document number "), F.col("id"),
            F.lit(" carries distinct content "),
            F.md5(F.col("id").cast("string")), F.lit(" "),
            F.md5((F.col("id") + 7).cast("string")))
        if skewed:
            text = F.when(
                F.col("id") % 10 < 3,
                F.concat(F.lit(viral + " tail "),
                         F.col("id"))).otherwise(uniq)
        else:
            text = uniq
        return (spark.range(n_docs).repartition(8)
                .select(F.col("id").alias("doc_id"),
                        text.alias("text")))

    def run(df):
        return minhash_lsh_pairs(df, max_bucket=200).count()

    w_uniform, n_u = _timed(lambda: run(table(False)))
    w_adv, n_a = _timed(lambda: run(table(True)))
    return {"case": "lsh-band", "n_docs": n_docs,
            "degenerate_share": 0.3, "max_bucket": 200,
            "pairs_uniform": n_u, "pairs_adversarial": n_a,
            "wall_uniform_s": round(w_uniform, 2),
            "wall_adversarial_s": round(w_adv, 2),
            "ratio": round(w_adv / w_uniform, 3),
            "pass_2x": w_adv <= 2 * w_uniform}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS",
                                               "8")))
    ap.add_argument("--pages", type=int, default=16000)
    ap.add_argument("--docs", type=int, default=30000)
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--giant-mb", type=int, default=16)
    ap.add_argument("--capped-giant-mb", type=int, default=200)
    ap.add_argument("--cap-mb", type=int, default=8)
    ap.add_argument("--write-md", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("tika-spark-skew-bench")
             .config("spark.driver.memory", "48g")
             .config("spark.driver.maxResultSize", "4g")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    try:
        results = [
            giant_page_case(spark, args.pages, args.giant_mb),
            giant_capped_case(spark, args.pages,
                              args.capped_giant_mb, args.cap_mb),
            host_skew_case(spark, args.rows),
            lsh_band_case(spark, args.docs),
        ]
    finally:
        spark.stop()
    line = json.dumps({"bench": "skew", "cpus": args.cpus,
                       "results": results})
    print(line)
    if args.write_md:
        md = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH", "SKEW.md")
        with open(md, "a") as f:
            f.write("\n```json\n" + line + "\n```\n")
    return 0 if all(r["pass_2x"] for r in results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
