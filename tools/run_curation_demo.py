"""Demo/verify driver #2: the full pretraining data-prep flow as ONE
spark-submit job — the composition the README documents, run end to end
over the synthetic ``documents`` table.

Usage: spark-submit tools/run_curation_demo.py [--sf-dir DIR] [--out DIR]

Stages (each prints a funnel row: docs in → docs out):
  0. crawl on-ramp       each doc rendered into HTML chrome (stand-in
                         for raw crawl pages) → extract_html_text →
                         normalize_text; the cleaned text continues
  1. quality gate        quality_stats keep=1 ∧ Gopher repetition keep=1
                         ∧ Gopher quality rules pass (corpus-tuned
                         thresholds: min_words=20, min_stop_hits=1)
  2. dedup               exact + MinHash-LSH pairs → connected components
                         → keep each cluster's min id
  2c. badwords           C4 blocked-word page drop (after dedup: the
                         synthetic dups are marked with the word 'dup')
  2b. leakage-safe split cluster-keyed train/valid/test; train continues
  3. decontaminate       drop docs sharing an 8-gram with a small
                         synthetic "benchmark" set
  3b. LM filter          trigram Stupid Backoff ppl per doc → drop the
                         per-language tail third (CCNet slice selection)
  4. mixture sample      sample_to_mixture to per-source token targets
                         (exact integer thresholds)
  4b. tokenizer          train_unigram on the kept corpus → encode →
                         per-language fertility report (telemetry)
  5. shuffle             global_shuffle — deterministic training order
  6. pack                tokenize (codepoints) → assemble_sequences

The final packed table is written to ``--out`` (parquet) when given;
the job prints the funnel, the achieved vs target mixture, and the
first packed rows. Deterministic end to end: re-running produces the
identical funnel, sampled doc set, shuffle order, and packed sequences.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from super_speedy_syslog_searcher_spark.functions.codec import encode_text_udf
from super_speedy_syslog_searcher_spark.operators.curation import (
    badwords_filter,
    decontaminate,
    extract_html_text,
    gopher_quality_stats,
    html_escape_min,
    leakage_safe_splits,
    ngram_novelty,
    normalize_text,
    repetition_stats,
)
from super_speedy_syslog_searcher_spark.operators.dedup import (
    connected_components,
    dedup_report,
    minhash_lsh_dedup_pairs,
)
from super_speedy_syslog_searcher_spark.operators.textstats import quality_stats
from super_speedy_syslog_searcher_spark.operators.tokens import (
    assemble_sequences,
    global_shuffle,
    mixture_sample_stats,
    perplexity_buckets,
    sample_to_mixture,
    stupid_backoff_logprob,
)
from super_speedy_syslog_searcher_spark.session import get_spark

# mixture by LANGUAGE (the documents table's lang column): en-dominant
MIX_PPM = {"en": 500_000, "de": 150_000, "es": 150_000, "fr": 100_000, "zh": 100_000}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None, help="packed-sequence parquet dir")
    ap.add_argument("--max-len", type=int, default=512)
    args = ap.parse_args()

    spark = get_spark("s4spark-curation-demo", cores=8)
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    funnel = [("input", docs.count())]

    # 0. crawl on-ramp: render each doc into deterministic HTML chrome
    #    (the stand-in for raw crawl pages), recover the main content,
    #    and canonicalize unicode/whitespace; the cleaned text is what
    #    the rest of the pipeline consumes — map-only, count unchanged
    esc = html_escape_min(F.col("text"))
    html = docs.select(
        "doc_id",
        F.concat(
            F.lit('<html><head><style>p{margin:0}</style><script>render(1 < 2);</script>'),
            F.lit("</head><body><!-- crawl --><p>"),
            F.replace(esc, F.lit("\n"), F.lit("</p><p>")),
            F.lit("</p></body></html>"),
        ).alias("html"),
    )
    cleaned = normalize_text(extract_html_text(html).select("doc_id", "text"))
    docs = docs.drop("text").join(
        cleaned.select("doc_id", F.col("norm_text").alias("text")), "doc_id"
    )
    funnel.append(("html-extract+norm", docs.count()))

    # 1. quality gate: map-only column pipelines, one semi-join each
    q_keep = quality_stats(docs).filter(F.col("keep") == 1).select("doc_id")
    g_keep = repetition_stats(docs).filter(F.col("keep") == 1).select("doc_id")
    gq_keep = (
        gopher_quality_stats(docs, min_words=20, min_stop_hits=1)
        .filter(F.col("gopher_pass") == 1)
        .select("doc_id")
    )
    docs = (
        docs.join(q_keep, "doc_id", "left_semi")
        .join(g_keep, "doc_id", "left_semi")
        .join(gq_keep, "doc_id", "left_semi")
    )
    # truncate lineage here: every later stage (dedup telemetry,
    # pagerank, novelty, splits, …) re-derives `docs`, and under plain
    # spark-submit the driver runs at the default heap — replaying the
    # on-ramp + quality plan per stage is what blows it
    docs = docs.localCheckpoint(eager=True)
    funnel.append(("quality+gopher", docs.count()))

    # 2. dedup: LSH candidate pairs (subsumes exact dups) → closure →
    #    drop every non-keeper (keeper = min doc_id of its cluster)
    pairs = minhash_lsh_dedup_pairs(docs, threshold=0.8)
    clusters = connected_components(pairs)
    losers = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    print("== dedup telemetry (per source-language) ==")
    dedup_report(
        docs.withColumn("n_tok", F.length("text")), clusters, source_col="lang"
    ).orderBy("source").show(truncate=False)
    print("== domain authority (PageRank over the extracted link graph) ==")
    # the synthetic corpus carries no URLs, so seed the same
    # deterministic ones the hash-gated url_domain_stats row uses
    from super_speedy_syslog_searcher_spark.entry_queries_curation import _seed_urls
    from super_speedy_syslog_searcher_spark.operators.curation import (
        extract_link_graph,
        pagerank,
    )

    seeded = _seed_urls(docs.select("doc_id", "text")).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    pagerank(extract_link_graph(seeded), iters=8).orderBy(
        F.desc("rank"), "node"
    ).limit(5).withColumn("rank", F.round("rank", 6)).show(truncate=False)
    print("== n-gram novelty by language (low = template/near-copy heavy) ==")
    ngram_novelty(docs).join(docs.select("doc_id", "lang"), "doc_id").groupBy(
        "lang"
    ).agg(
        F.round(F.avg("novelty_frac"), 4).alias("avg_novelty"),
        F.sum(F.when(F.col("novelty_frac") < 0.05, 1).otherwise(0)).alias("near_copies"),
    ).orderBy("lang").show(truncate=False)
    docs = docs.join(losers, "doc_id", "left_anti")
    funnel.append(("dedup", docs.count()))

    # 2c. C4 bad-word page drop (Raffel et al. §2.2): any blocked word
    #     removes the page; the word stream is broadcast-pruned before
    #     the per-doc aggregate so clean docs cost no shuffle rows.
    #     (Runs after dedup here because the synthetic corpus marks its
    #     seeded duplicates with the literal word 'dup' — blocking
    #     first would empty the dedup demonstration.)
    bw = badwords_filter(docs, ["dup"])
    docs = docs.join(
        bw.filter(F.col("bw_keep") == 1).select("doc_id"), "doc_id", "left_semi"
    )
    funnel.append(("badwords", docs.count()))

    # 2b. leakage-safe split: the split key is the duplicate CLUSTER
    #     (unclustered docs are their own singleton cluster), so
    #     near-duplicates can never straddle the train/eval boundary
    labels = clusters.select(F.col("node").alias("doc_id"), "cluster_id")
    with_cl = docs.join(labels, "doc_id", "left")
    split_docs = leakage_safe_splits(with_cl, cluster_col="cluster_id", id_col="doc_id")
    print("== leakage-safe split (cluster-keyed) ==")
    split_docs.groupBy("split").count().orderBy("split").show(truncate=False)
    docs = split_docs.filter(F.col("split") == "train").drop("cluster_id", "split")
    funnel.append(("train-split", docs.count()))

    # 3. decontaminate against a synthetic benchmark: the first 5 docs'
    #    first 40 words stand in for eval prompts (so hits are real)
    bench = (
        spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .limit(5)
        .select(
            F.col("doc_id").alias("bench_id"),
            F.array_join(F.slice(F.split("text", " "), 1, 40), " ").alias("text"),
        )
    )
    flags = decontaminate(docs, bench, n=8)
    docs = docs.join(
        flags.filter(F.col("contaminated") == 0).select("doc_id"), "doc_id", "left_semi"
    )
    funnel.append(("decontaminated", docs.count()))

    # 4. mixture sampling (exact integer keep rule, deterministic)
    tok = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("lang").alias("source"),  # mix/pack per language stream
        encode_text_udf("text").alias("tokens"),
    ).withColumn("n_tok", F.size("tokens"))
    # 3b. LM filter: trigram Stupid Backoff perplexity per doc, then the
    #     CCNet slice selection per language stream — keep head + middle
    sb = stupid_backoff_logprob(tok, carry_cols=("source",))
    bucketed = perplexity_buckets(sb, stratum_col="source", value_col="sb_ppl")
    lm_keep = bucketed.filter(F.col("ppl_bucket") != "tail").select("doc_id")
    tok = tok.join(lm_keep, "doc_id", "left_semi")
    funnel.append(("lm-filtered", tok.count()))

    stats = mixture_sample_stats(tok, MIX_PPM)
    sampled = sample_to_mixture(tok, MIX_PPM)
    funnel.append(("mixture-sampled", sampled.count()))

    # 4b. tokenizer: train a unigram-LM vocabulary IN-ENGINE on the kept
    #     corpus, encode it, and report fertility per language — the
    #     train → encode → evaluate loop of real data prep (printed
    #     telemetry; the packing below stays on the codepoint tokens so
    #     the funnel is unchanged)
    from super_speedy_syslog_searcher_spark.operators.tokens import (
        apply_unigram,
        tokenizer_fertility,
        train_unigram,
    )

    kept_docs = docs.join(sampled.select(F.col("doc_id").cast("long").alias("doc_id")), "doc_id", "left_semi")
    uni_vocab, _ = train_unigram(
        kept_docs, vocab_size=512, max_piece_len=6, seed_size=3000, n_rounds=2
    )
    seg = apply_unigram(kept_docs, uni_vocab, max_piece_len=6)
    print(f"== unigram tokenizer (trained in-engine, |vocab|={len(uni_vocab)}) ==")
    tokenizer_fertility(kept_docs, seg, group_col="lang").orderBy("lang").show(
        truncate=False
    )

    # 5. deterministic training-order shuffle
    shuffled = global_shuffle(sampled, seed="epoch0")

    # 6. pack into fixed-length training rows, in shuffle order per source
    packed = assemble_sequences(
        shuffled.select(
            F.lpad(F.col("shuffle_rank").cast("string"), 12, "0").alias("doc_id"),
            "source",
            "tokens",
            "n_tok",
        ),
        max_len=args.max_len,
    )
    funnel.append(("packed-sequences", packed.count()))

    print("== funnel ==")
    for stage, n in funnel:
        print(f"{stage:20s} {n:>10d}")

    print("== mixture: target vs achieved (token shares) ==")
    stats.orderBy("source").show(20, truncate=False)

    print("== packed head (source | seq_id | n_tok | n_docs) ==")
    packed.orderBy("source", "seq_id").select("source", "seq_id", "n_tok", "n_docs").show(
        8, truncate=False
    )

    if args.out:
        packed.write.mode("overwrite").parquet(args.out)
        print(f"packed sequences written to {args.out}")


if __name__ == "__main__":
    main()
