"""Production entrypoint: admit a crawl batch through the dedup store.

    spark-submit --master <cluster> \\
        --py-files dist/gliner_spark.zip \\
        jobs/run_admit.py \\
        --input /path/or/s3/new_batch_parquet \\
        --store /path/or/s3/minhash_sig_store \\
        --verdicts /path/or/s3/verdicts_out \\
        [--threshold 0.8] [--n-perms 128] [--bands 32] [--k 3] \\
        [--stream --checkpoint /path/ckpt]

With ``--stream`` the input directory is consumed as a Structured
Streaming file source (availableNow — drains what exists, then stops):
each arriving parquet file admits as its own micro-batch through
``streaming.admit_stream.stream_admissions``, verdicts land
epoch-partitioned, and the source checkpoint makes restarts re-admit
nothing (streaming test pins stream ≡ sequential batch admission).

The operational form of ``plans.incremental.dedup_admit_batch``: the
batch dedups against EVERY previously admitted document via the
append-only signature store (band keys derive from stored signatures —
the corpus is never re-read), keeper signatures append to the store,
and the per-document verdict table (doc_id, dup_of, keep) is written
for the downstream curation/scoring jobs. A retried run returns the
same verdicts and leaves the store unchanged (left-anti append,
self-match exclusion) — safe under ordinary job retries.

All I/O goes through Spark readers/writers, so any Hadoop-supported
URI works for all three paths.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--store", required=True)
    ap.add_argument("--verdicts", required=True)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--n-perms", type=int, default=128)
    ap.add_argument("--bands", type=int, default=32)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("gliner-admit").getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    from gliner_spark.plans.incremental import dedup_admit_batch

    if args.stream:
        from gliner_spark.streaming.admit_stream import stream_admissions

        stream = spark.readStream.schema(
            spark.read.parquet(args.input).schema
        ).option("maxFilesPerTrigger", 1).parquet(args.input)
        q = stream_admissions(
            stream, args.store, args.verdicts,
            args.checkpoint or args.verdicts + "_ckpt",
            k=args.k, n_perms=args.n_perms, bands=args.bands,
            threshold=args.threshold,
        ).start()
        q.awaitTermination()
        v = spark.read.parquet(args.verdicts)
        print(f"admitted (stream): {v.where('keep').count()}/{v.count()} "
              f"-> store {args.store}, verdicts {args.verdicts}")
        spark.stop()
        return

    batch = spark.read.parquet(args.input)
    verdict = dedup_admit_batch(
        batch, args.store,
        k=args.k, n_perms=args.n_perms, bands=args.bands,
        threshold=args.threshold,
    )
    verdict.write.mode("overwrite").parquet(args.verdicts)
    kept = verdict.where("keep").count()
    total = verdict.count()
    print(f"admitted: {kept}/{total} -> store {args.store}, "
          f"verdicts {args.verdicts}")
    spark.stop()


if __name__ == "__main__":
    main()
