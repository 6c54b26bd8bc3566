"""CLI entry points — the `tetrex {index, query, inspect, track}`
surface (/root/reference/src/main.cpp:78-93,113-115) re-expressed for
spark-submit. Usage:

  spark-submit --py-files tetrex_spark.zip -m tetrex_spark.cli index \
      --corpus <parquet path | catalog table> --output <index_dir> [--bins 64 --k 3 --fpr 0.05]
  ... query  --index <index_dir> --corpus <parquet> --regex 'AC+G' [--regex-file f.tsv]
  ... inspect --index <index_dir>
  ... track  --corpus <parquet> --output <index_dir> [--min-gap 3 --max-gap 21]

The regex file format matches the reference's TSV (id \\t motif) source
(src/query.cpp:342-363); '-' reads patterns from stdin (S5, :479).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession

from .sources.corpus import read_corpus


def _spark(app: str) -> SparkSession:
    return (
        SparkSession.builder.appName(f"tetrex_spark-{app}")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def read_regex_file(path: str) -> list[tuple[str, str]]:
    """TSV (id \\t motif) -> [(id, motif)] — S6 parity; '-' = stdin."""
    fh = sys.stdin if path == "-" else open(path)
    out = []
    for line in fh:
        line = line.rstrip("\n")
        if not line:
            continue
        qid, _, motif = line.partition("\t")
        out.append((qid, motif) if motif else (qid, qid))
    if fh is not sys.stdin:
        fh.close()
    return out


def cmd_index(args) -> int:
    from .plans.planner import MotifIndex

    spark = _spark("index")
    corpus = read_corpus(spark, args.corpus)
    salt = getattr(args, "salt_hot_hosts", None)
    if salt and salt != "auto":
        salt = salt.split(",")
    MotifIndex.build(
        corpus, args.output, n_bins=args.bins, k=args.k,
        fpr=args.fpr, n_hashes=args.hash_count, salt_hot_hosts=salt,
    )
    n = corpus.count()
    # build golden parity: 'Indexed N sequences across B bins.'
    # (/root/reference/test/cli/kbioreg_test.cpp:38-40)
    print(f"Indexed {n} documents across {args.bins} bins.")
    return 0


def cmd_query(args) -> int:
    from .plans.planner import MotifIndex

    spark = _spark("query")
    idx = MotifIndex.load(spark, args.index)
    corpus = read_corpus(spark, args.corpus)
    patterns = [("q0", args.regex)] if args.regex else read_regex_file(args.regex_file)
    if getattr(args, "syntax", "posix") == "prosite":
        from .plans.rx import prosite_to_posix

        patterns = [(qid, prosite_to_posix(m)) for qid, m in patterns]
    # one batched pruned scan for the whole pattern file (query_many) —
    # the reference loops queries sequentially (src/query.cpp:342-373).
    # Repeated query ids in the file are disambiguated (q1, q1#2, ...)
    # instead of silently dropping earlier lines
    seen: dict[str, int] = {}
    uniq: dict[str, str] = {}
    for qid, motif in patterns:
        n = seen.get(qid, 0)
        seen[qid] = n + 1
        uniq[qid if n == 0 else f"{qid}#{n + 1}"] = motif
    hits = idx.query_many(corpus, uniq)
    multi = len(patterns) > 1
    if args.output:
        hits.write.mode("overwrite").partitionBy("query_id").parquet(args.output)
    else:
        # S7 TSV sink parity: [qid \t] url \t match \t start,end
        for r in hits.collect():
            qid = f"{r['query_id']}\t" if multi else ""
            print(f"{qid}{r['url']}\t{r['match']}\t{r['start']},{r['end']}")
    return 0


def cmd_inspect(args) -> int:
    """S9 parity (src/inspect_idx.cpp): print index params + bin stats."""
    from .sources.sketch_store import read_manifest, read_sketch_rows

    spark = _spark("inspect")
    manifest = read_manifest(args.index)
    print(json.dumps({k: v for k, v in manifest.items() if k != "specs"}, indent=2))
    for spec in manifest["specs"]:
        print(f"spec: {json.dumps(spec)}")
    rows = read_sketch_rows(spark, args.index)
    from pyspark.sql import functions as F

    stats = rows.groupBy("name").agg(
        F.count(F.lit(1)).alias("bins"),
        F.sum("n_items").alias("items"),
        F.max("n_items").alias("max_bin_items"),
    )
    for r in stats.collect():
        print(f"{r['name']}: bins={r['bins']} items={r['items']} "
              f"max_bin_items={r['max_bin_items']}")
    return 0


def cmd_track(args) -> int:
    """`tetrex track` analog: build the d-gram (gapped-gram) sketch
    (src/dGramIndex.cpp:20-38) alongside an existing index dir."""
    from .plans.dgram import build_dgram_index

    spark = _spark("track")
    corpus = read_corpus(spark, args.corpus)
    # default --bins to the existing index manifest's n_bins: a different
    # modulus would bucket d-grams into the wrong bin vectors (silent
    # recall loss); build_dgram_index raises on an explicit mismatch
    import os

    n_bins = args.bins
    if os.path.exists(f"{args.output}/manifest.json"):
        # an existing motif index: route through MotifIndex.track so the
        # manifest's (possibly hot-host-salted) bin assignment applies —
        # binning the d-grams with a different assignment would prune
        # wrong bins at gap-query time (silent recall loss)
        from .plans.planner import MotifIndex

        idx = MotifIndex.load(spark, args.output)
        n_bins = idx.manifest["n_bins"]
        idx.track(corpus, args.output,
                  min_gap=args.min_gap, max_gap=args.max_gap, fpr=args.fpr)
    else:
        build_dgram_index(
            corpus, args.output, n_bins=n_bins or 64,
            min_gap=args.min_gap, max_gap=args.max_gap, fpr=args.fpr,
        )
        n_bins = n_bins or 64
    print(f"Tracked d-grams (gap {args.min_gap}..{args.max_gap}) "
          f"across {n_bins} bins.")
    return 0


def cmd_analyze(args) -> int:
    """Training-pipeline curation gates over a corpus (beyond the
    reference's surface): per-doc repetition/quality stats with keep
    flags, PII redaction, token/language stats, per-host aggregates —
    one parquet table per gate under --output/<gate>/."""
    from .functions.analysis import (
        host_stats,
        pii_scrub,
        repetition_quality,
        text_stats,
    )

    spark = _spark("analyze")
    corpus = read_corpus(spark, args.corpus)
    gates = {
        "quality": lambda: repetition_quality(corpus, id_col="url"),
        "pii": lambda: pii_scrub(corpus, id_col="url"),
        "stats": lambda: text_stats(corpus, id_col="url"),
        "hosts": lambda: host_stats(corpus),
    }
    selected = args.gates.split(",") if args.gates else list(gates)
    unknown = set(selected) - set(gates)
    if unknown:
        raise SystemExit(f"unknown gates: {sorted(unknown)}")
    for g in selected:
        gates[g]().write.mode("overwrite").parquet(f"{args.output}/{g}")
        print(f"{g}: wrote {args.output}/{g}")
    return 0


def cmd_dedup(args) -> int:
    """Resumable near-dup dedup over a corpus: MinHash-LSH (default) or
    SimHash pairs through the matching checkpointed pipeline (a killed
    run resumes at the first uncommitted stage; re-running a finished one
    only re-reads), then the connected-components keep-list. Writes
    pairs/ and keep/ parquet under --output; stage lineage under
    --checkpoint."""
    from .lineage import CheckpointedDedup, CheckpointedSimhashDedup
    from .operators.clusters import dedup_keep_list

    from pyspark.sql import functions as F

    spark = _spark("dedup")
    corpus = read_corpus(spark, args.corpus)
    # the sig/set pipeline keys on int64 ids; string ids (urls) map
    # through xxhash64 (collision odds ~n^2/2^64) and join back below
    keyed = corpus.withColumn("_did", F.xxhash64(F.col(args.id_col)))
    ckpt = args.checkpoint or f"{args.output}/_checkpoint"
    if args.method == "simhash":
        cd = CheckpointedSimhashDedup(
            ckpt, max_hamming=args.max_hamming, n_blocks=args.n_blocks,
            n_chunks=args.chunks,
        )
    else:
        cd = CheckpointedDedup(
            ckpt, k=args.k, threshold=args.threshold, n_chunks=args.chunks,
        )
    pairs = cd.run(keyed, text_col=args.text_col, id_col="_did")
    pairs.write.mode("overwrite").parquet(f"{args.output}/pairs")
    stored = spark.read.parquet(f"{args.output}/pairs")
    ids = keyed.select(F.col("_did"), F.col(args.id_col))
    keep = (
        dedup_keep_list(ids.select("_did"), stored, id_col="_did")
        .join(ids.withColumnRenamed("_did", "id"), "id")
        .select(args.id_col, "component", "keep")
    )
    keep.write.mode("overwrite").parquet(f"{args.output}/keep")
    kept = keep.filter("keep = 1").count()
    total = keep.count()
    print(f"Deduplicated {total} documents: kept {kept}, "
          f"{stored.count()} near-dup pairs.")
    return 0


def cmd_embdedup(args) -> int:
    """Resumable embedding near-dup over an embeddings table: hyperplane
    bucket chunks + packed-BLAS exact-cosine verify through
    CheckpointedCosineDedup, then the connected-components keep-list.
    Writes pairs/ and keep/ parquet under --output."""
    from .lineage import CheckpointedCosineDedup
    from .operators.clusters import dedup_keep_list

    spark = _spark("embdedup")
    df = read_corpus(spark, args.corpus)
    if args.vec_col not in df.columns:
        raise SystemExit(
            f"--vec-col {args.vec_col!r} not in {args.corpus}: "
            f"columns are {df.columns}"
        )
    first = df.select(args.vec_col).head()
    if first is None or first[args.vec_col] is None:
        raise SystemExit(f"{args.corpus} is empty — nothing to dedup")
    dim = len(first[args.vec_col])
    from .operators.similarity import resolve_hyperplane_plan

    n_planes, n_bands = resolve_hyperplane_plan(
        args.threshold, args.recall, args.n_planes, args.n_bands
    )
    print(
        f"hyperplane plan: {n_planes} planes x {n_bands} bands "
        f"(threshold {args.threshold}, target recall {args.recall})"
    )
    cd = CheckpointedCosineDedup(
        args.checkpoint or f"{args.output}/_checkpoint",
        dim=dim, threshold=args.threshold, n_chunks=args.chunks,
        n_planes=n_planes, n_bands=n_bands,
    )
    pairs = cd.run(df, vec_col=args.vec_col, id_col=args.id_col)
    pairs.write.mode("overwrite").parquet(f"{args.output}/pairs")
    stored = spark.read.parquet(f"{args.output}/pairs")
    keep = dedup_keep_list(
        df.select(args.id_col), stored, id_col=args.id_col
    ).withColumnRenamed("id", args.id_col)
    keep.write.mode("overwrite").parquet(f"{args.output}/keep")
    kept = keep.filter("keep = 1").count()
    print(f"Deduplicated {keep.count()} vectors: kept {kept}, "
          f"{stored.count()} near-dup pairs.")
    return 0


def cmd_stripdup(args) -> int:
    """Substring-level dedup curation (Lee et al. 2021): write every
    maximal cross-doc shared span >= --min-len chars (spans/) and the
    cleaned corpus with all later copies of each span removed (clean/,
    lowest doc key survives). Span discovery runs ONCE; the committed
    spans/ parquet feeds the cleaning pass. The surviving copy is picked
    by the smallest doc key: the id column itself when integral, else a
    deterministic xxhash64 of it (stable but arbitrary precedence)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from .operators.substring import strip_dup_spans, substring_dup_spans

    spark = _spark("stripdup")
    corpus = read_corpus(spark, args.corpus)
    integral = isinstance(
        corpus.schema[args.id_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    )
    keyed = corpus.withColumn(
        "_did",
        F.col(args.id_col).cast("long") if integral
        else F.xxhash64(F.col(args.id_col)),
    )
    spans = substring_dup_spans(
        keyed, args.min_len, args.k, max_bucket=args.max_bucket,
        all_spans=True, text_col=args.text_col, id_col="_did",
    )
    spans.write.mode("overwrite").parquet(f"{args.output}/spans")
    stored = spark.read.parquet(f"{args.output}/spans")
    clean = strip_dup_spans(
        keyed, args.min_len, args.k, spans=stored,
        text_col=args.text_col, id_col="_did",
    )
    if integral:
        out = clean.withColumnRenamed("doc_id", args.id_col)
    else:
        ids = keyed.select("_did", args.id_col)
        out = clean.join(
            ids, clean["doc_id"] == ids["_did"]
        ).select(args.id_col, "clean_text")
    out.write.mode("overwrite").parquet(f"{args.output}/clean")
    n_docs = spark.read.parquet(f"{args.output}/clean").count()
    print(
        f"Stripped {stored.count()} duplicated spans "
        f"across {n_docs} documents."
    )
    return 0


def cmd_membindex(args) -> int:
    """Freeze a corpus into a bucketed Bloom membership index (16 B/doc
    hash table partitioned by bucket + one sized filter per bucket), the
    once-per-freeze half of the incremental dedup gate."""
    from .operators.incremental import build_membership_index

    spark = _spark("membindex")
    stats = build_membership_index(
        read_corpus(spark, args.corpus), args.output,
        n_buckets=args.n_buckets, fpr=args.fpr,
        text_col=args.text_col, id_col=args.id_col,
    )
    print(
        f"Membership index: {stats['n_keys']} distinct texts in "
        f"{stats['n_filled_buckets']}/{args.n_buckets} buckets."
    )
    return 0


def cmd_membgate(args) -> int:
    """Gate a crawl increment against a frozen membership index: write
    (id, is_new) verdicts, or only the new rows with --new-only. Cost is
    proportional to the increment; the reference corpus is never read
    beyond the candidate buckets' hash files."""
    from pyspark.sql import functions as F

    from .operators.incremental import incremental_exact_dedup

    spark = _spark("membgate")
    inc = read_corpus(spark, args.increment)
    verdict = incremental_exact_dedup(
        inc, args.index, text_col=args.text_col, id_col=args.id_col
    )
    if args.new_only:
        out = inc.join(
            verdict.filter("is_new").select(args.id_col), args.id_col
        )
    else:
        out = verdict
    out.write.mode("overwrite").parquet(args.output)
    n_new = verdict.filter("is_new").count()
    n_all = verdict.count()
    print(f"Gate: {n_new}/{n_all} increment docs are new.")
    return 0


def cmd_ndindex(args) -> int:
    """Freeze a corpus's MinHash LSH state (sharded band buckets +
    shingle sets, exact-dup pre-collapse) — the once-per-freeze half of
    the incremental NEAR-dup gate."""
    from .operators.incremental import build_neardup_index

    spark = _spark("ndindex")
    stats = build_neardup_index(
        read_corpus(spark, args.corpus), args.output,
        threshold=args.threshold, k=args.k, num_perm=args.num_perm,
        bands=args.bands, n_shards=args.n_shards,
        max_bucket=args.max_bucket,
        text_col=args.text_col, id_col=args.id_col,
    )
    print(
        f"Near-dup index: {stats['n_reps']} representatives frozen "
        f"({stats['n_dropped_buckets']} over-cap buckets dropped)."
    )
    return 0


def cmd_ndgate(args) -> int:
    """Gate a crawl increment against a frozen near-dup index: write
    (id, is_new) verdicts, or only the genuinely-new rows with
    --new-only. Cost is proportional to the increment plus its LSH
    candidates; the frozen corpus text is never read."""
    from .operators.incremental import incremental_neardup_gate

    spark = _spark("ndgate")
    inc = read_corpus(spark, args.increment)
    verdict = incremental_neardup_gate(
        inc, args.index, text_col=args.text_col, id_col=args.id_col
    )
    if args.new_only:
        out = inc.join(
            verdict.filter("is_new").select(args.id_col), args.id_col
        )
    else:
        out = verdict
    out.write.mode("overwrite").parquet(args.output)
    n_new = verdict.filter("is_new").count()
    n_all = verdict.count()
    print(f"Near-dup gate: {n_new}/{n_all} increment docs are new.")
    return 0


def cmd_decont(args) -> int:
    """Flag (or drop, with --clean-only) training docs sharing token
    n-grams with a benchmark/eval set."""
    from pyspark.sql import functions as F

    from .operators.decontam import decontaminate

    spark = _spark("decont")
    docs = read_corpus(spark, args.corpus)
    bench = read_corpus(spark, args.benchmark)
    verdict = decontaminate(
        docs, bench, n=args.n, min_hits=args.min_hits,
        text_col=args.text_col, id_col=args.id_col,
        bench_text_col=args.bench_text_col,
    )
    if args.clean_only:
        out = docs.join(
            verdict.filter("is_clean").select(args.id_col), args.id_col
        )
    else:
        out = verdict
    out.write.mode("overwrite").parquet(args.output)
    n_bad = verdict.filter(~F.col("is_clean")).count()
    n_all = verdict.count()
    print(f"Decontamination: {n_bad}/{n_all} docs contaminated.")
    return 0


def cmd_lmscore(args) -> int:
    """Fit a unigram LM on a reference corpus (or the corpus itself) and
    write per-doc perplexity scores."""
    from pyspark.sql import functions as F

    from .functions.lm import doc_logprob, unigram_model

    spark = _spark("lmscore")
    docs = read_corpus(spark, args.corpus)
    fit_on = read_corpus(spark, args.fit_corpus) if args.fit_corpus else docs
    model = unigram_model(fit_on, top_k=args.top_k, min_count=args.min_count,
                          text_col=args.text_col)
    scored = doc_logprob(docs, model, text_col=args.text_col,
                         id_col=args.id_col)
    scored.write.mode("overwrite").parquet(args.output)
    row = scored.agg(
        F.count("*").alias("n"),
        F.avg("perplexity").alias("mean_ppl"),
    ).collect()[0]
    print(f"Scored {row['n']} docs; mean perplexity {row['mean_ppl']:.2f}.")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="tetrex_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("index")
    pi.add_argument("--corpus", required=True)
    pi.add_argument("--output", required=True)
    pi.add_argument("--bins", type=int, default=64)
    pi.add_argument("--k", type=int, default=3)
    pi.add_argument("--fpr", type=float, default=0.05)
    pi.add_argument("--hash-count", type=int, default=3)
    pi.add_argument("--salt-hot-hosts", default=None,
                    help="'auto' (detect skewed hosts) or a comma host list")
    pi.set_defaults(fn=cmd_index)

    pq = sub.add_parser("query")
    pq.add_argument("--index", required=True)
    pq.add_argument("--corpus", required=True)
    pq_src = pq.add_mutually_exclusive_group(required=True)
    pq_src.add_argument("--regex")
    pq_src.add_argument("--regex-file")
    pq.add_argument("--syntax", choices=["posix", "prosite"], default="posix")
    pq.add_argument("--output")
    pq.set_defaults(fn=cmd_query)

    pins = sub.add_parser("inspect")
    pins.add_argument("--index", required=True)
    pins.set_defaults(fn=cmd_inspect)

    pt = sub.add_parser("track")
    pt.add_argument("--corpus", required=True)
    pt.add_argument("--output", required=True)
    pt.add_argument("--bins", type=int, default=None,
                    help="default: the existing index manifest's n_bins")
    pt.add_argument("--min-gap", type=int, default=3)
    pt.add_argument("--max-gap", type=int, default=21)
    pt.add_argument("--fpr", type=float, default=0.05)
    pt.set_defaults(fn=cmd_track)

    pa = sub.add_parser("analyze")
    pa.add_argument("--corpus", required=True)
    pa.add_argument("--output", required=True)
    pa.add_argument("--gates", default=None,
                    help="comma list of quality,pii,stats,hosts (default all)")
    pa.set_defaults(fn=cmd_analyze)

    pd_ = sub.add_parser("dedup")
    pd_.add_argument("--corpus", required=True)
    pd_.add_argument("--output", required=True)
    pd_.add_argument("--checkpoint", default=None,
                     help="stage-lineage dir (default <output>/_checkpoint)")
    pd_.add_argument("--id-col", default="url")
    pd_.add_argument("--text-col", default="text")
    pd_.add_argument("--method", choices=["minhash", "simhash"],
                     default="minhash")
    pd_.add_argument("--k", type=int, default=3,
                     help="minhash shingle width")
    pd_.add_argument("--threshold", type=float, default=0.8,
                     help="minhash jaccard threshold")
    pd_.add_argument("--max-hamming", type=int, default=3,
                     help="simhash hamming threshold")
    pd_.add_argument("--n-blocks", type=int, default=6,
                     help="simhash pigeonhole blocks (must exceed "
                          "--max-hamming; validated before any work runs)")
    pd_.add_argument("--chunks", type=int, default=8)
    pd_.set_defaults(fn=cmd_dedup)

    pe = sub.add_parser("embdedup")
    pe.add_argument("--corpus", required=True,
                    help="embeddings parquet/table: (id, array<float>)")
    pe.add_argument("--output", required=True)
    pe.add_argument("--checkpoint", default=None)
    pe.add_argument("--id-col", default="vec_id")
    pe.add_argument("--vec-col", default="embedding")
    pe.add_argument("--threshold", type=float, default=0.9)
    pe.add_argument("--recall", type=float, default=0.999,
                    help="target blocking recall AT the threshold; the "
                         "(planes, bands) plan is derived in closed form")
    pe.add_argument("--n-planes", type=int, default=None,
                    help="expert override (give with --n-bands)")
    pe.add_argument("--n-bands", type=int, default=None,
                    help="expert override (give with --n-planes)")
    pe.add_argument("--chunks", type=int, default=8)
    pe.set_defaults(fn=cmd_embdedup)

    ps = sub.add_parser("stripdup")
    ps.add_argument("--corpus", required=True)
    ps.add_argument("--output", required=True)
    ps.add_argument("--id-col", default="doc_id")
    ps.add_argument("--text-col", default="text")
    ps.add_argument("--min-len", type=int, default=40,
                    help="minimum duplicated span length (normalized chars)")
    ps.add_argument("--k", type=int, default=None,
                    help="anchor gram size (default min(32, min_len))")
    ps.add_argument("--max-bucket", type=int, default=512,
                    help="anchor bucket cap; over-cap buckets are "
                         "warn-logged and dropped")
    ps.set_defaults(fn=cmd_stripdup)

    pm = sub.add_parser("membindex")
    pm.add_argument("--corpus", required=True)
    pm.add_argument("--output", required=True)
    pm.add_argument("--id-col", default="doc_id")
    pm.add_argument("--text-col", default="text")
    pm.add_argument("--n-buckets", type=int, default=64,
                    help="hash-range buckets (size so one bucket's keys "
                         "fit a task: ~10M keys/bucket at scale)")
    pm.add_argument("--fpr", type=float, default=0.01)
    pm.set_defaults(fn=cmd_membindex)

    pg = sub.add_parser("membgate")
    pg.add_argument("--increment", required=True)
    pg.add_argument("--index", required=True)
    pg.add_argument("--output", required=True)
    pg.add_argument("--id-col", default="doc_id")
    pg.add_argument("--text-col", default="text")
    pg.add_argument("--new-only", action="store_true",
                    help="write the surviving increment rows instead of "
                         "(id, is_new) verdicts")
    pg.set_defaults(fn=cmd_membgate)

    pn = sub.add_parser("ndindex")
    pn.add_argument("--corpus", required=True)
    pn.add_argument("--output", required=True)
    pn.add_argument("--id-col", default="doc_id")
    pn.add_argument("--text-col", default="text")
    pn.add_argument("--threshold", type=float, default=0.8,
                    help="jaccard threshold the gate will enforce")
    pn.add_argument("--k", type=int, default=3, help="shingle width")
    pn.add_argument("--num-perm", type=int, default=128)
    pn.add_argument("--bands", type=int, default=32)
    pn.add_argument("--n-shards", type=int, default=None,
                    help="partition shards for buckets and sets (a small "
                         "increment reads only its shards); default: "
                         "scale-adaptive, ~100k reps per shard")
    pn.add_argument("--max-bucket", type=int, default=512,
                    help="bucket cap; over-cap buckets dropped and the "
                         "count recorded in params.json")
    pn.set_defaults(fn=cmd_ndindex)

    png = sub.add_parser("ndgate")
    png.add_argument("--increment", required=True)
    png.add_argument("--index", required=True)
    png.add_argument("--output", required=True)
    png.add_argument("--id-col", default="doc_id")
    png.add_argument("--text-col", default="text")
    png.add_argument("--new-only", action="store_true",
                     help="write the surviving increment rows instead of "
                          "(id, is_new) verdicts")
    png.set_defaults(fn=cmd_ndgate)

    pdc = sub.add_parser("decont")
    pdc.add_argument("--corpus", required=True)
    pdc.add_argument("--benchmark", required=True,
                     help="eval-set parquet/table with a text column")
    pdc.add_argument("--output", required=True)
    pdc.add_argument("--id-col", default="doc_id")
    pdc.add_argument("--text-col", default="text")
    pdc.add_argument("--bench-text-col", default="text")
    pdc.add_argument("--n", type=int, default=13, help="token n-gram width")
    pdc.add_argument("--min-hits", type=int, default=1,
                     help="shared distinct grams to count as contaminated")
    pdc.add_argument("--clean-only", action="store_true",
                     help="write surviving docs instead of verdicts")
    pdc.set_defaults(fn=cmd_decont)

    pl = sub.add_parser("lmscore")
    pl.add_argument("--corpus", required=True)
    pl.add_argument("--output", required=True)
    pl.add_argument("--fit-corpus", default=None,
                    help="reference corpus to fit the model on "
                         "(default: the corpus itself)")
    pl.add_argument("--id-col", default="doc_id")
    pl.add_argument("--text-col", default="text")
    pl.add_argument("--top-k", type=int, default=1_000_000)
    pl.add_argument("--min-count", type=int, default=1)
    pl.set_defaults(fn=cmd_lmscore)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
