"""Corpus-layer batch driver: the curation/dedup operators as a
spark-submit entry point (the corpus-side sibling of
``tika_spark.pipeline.runner``, H4).

    python -m tika_spark.analysis.runner \
        --input /data/docs.parquet --output /data/out \
        --op dedup-exact [--op quality ...] [--cpus 8] \
        [--budget 2048] [--threshold 0.5]

Each ``--op`` runs one operator over the input documents table
(columns ``doc_id, text[, source, lang]``) and writes one parquet
directory ``<output>/<op>/``. Ops compose by running in sequence over
the same input snapshot — the operators themselves are pure
DataFrame transforms, so chaining happens in library code (see
``streaming.ingest.curate_stream`` for the composed incremental
form); this driver is the offline, one-op-at-a-time surface.
"""

from __future__ import annotations

import argparse
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _ops(args):
    """op name → (docs DataFrame) -> DataFrame."""
    from tika_spark.analysis import curation, dedup, similarity, textstats

    def exact(d):
        return dedup.exact_dedup(d)

    def minhash(d):
        return dedup.minhash_lsh_pairs(d, threshold=args.threshold)

    def simhash(d):
        return dedup.simhash_pairs(d)

    def substring(d):
        return dedup.substring_dup_spans(d, k=args.k)

    def remove_spans(d):
        return dedup.remove_dup_spans(d, k=args.k,
                                      keep_first=args.keep_first)

    def splits(d):
        return textstats.assign_splits(
            d, {"train": args.train_frac, "val": args.val_frac,
                "test": args.test_frac}, salt=args.salt)

    def shuffle(d):
        return curation.shuffle_order(d, salt=args.salt)

    def clusters(d):
        pairs = dedup.minhash_lsh_pairs(d, threshold=args.threshold)
        return dedup.dedup_representatives(d, pairs)

    def quality(d):
        return textstats.fingerprint(textstats.quality_features(d))

    def repetition(d):
        return curation.repetition_features(d)

    def paragraph(d):
        return curation.paragraph_dedup(d)

    def pii(d):
        return curation.pii_scrub(d)

    def normalize(d):
        return curation.normalize_text(d)

    def perplexity(d):
        return curation.lm_perplexity(d)

    def pack(d):
        return curation.pack_sequences(d, budget=args.budget)

    def split(d):
        return curation.split_long_docs(d, max_tokens=args.budget,
                                        overlap=args.overlap)

    def mixture(d):
        return curation.mixture_weights(d)

    def c4(d):
        return curation.c4_rules(d)

    def gopher(d):
        return curation.gopher_rules(d)

    def para_intra(d):
        return curation.dedup_paragraphs_intra(d)

    def winnow(d):
        return textstats.winnow_fingerprints(d)

    # media ops: input is a media table (id, payload[, media_type]),
    # not the documents table — decode runs mapInPandas per row
    def pixel_stats(d):
        from tika_spark.analysis.pixels import image_pixel_stats
        return image_pixel_stats(d)

    def pcm_stats(d):
        from tika_spark.analysis.pcm import audio_pcm_stats
        return audio_pcm_stats(d)

    def video_frames(d):
        from tika_spark.analysis.video import sample_frame_stats
        return sample_frame_stats(d, every=args.every)

    def image_dhash_op(d):
        from tika_spark.analysis.imagehash import image_dhash
        return image_dhash(d)

    def image_dhash_pairs_op(d):
        from tika_spark.analysis.imagehash import (dhash_pairs,
                                                   image_dhash)
        hashes = image_dhash(d).filter(F.col("status") == "ok")
        return dhash_pairs(hashes, max_dist=args.hamming)

    def video_dhash_op(d):
        from tika_spark.analysis.videohash import video_dhash
        return video_dhash(d)

    def video_neardup_op(d):
        from tika_spark.analysis.videohash import (video_dhash,
                                                   video_neardup_pairs)
        return video_neardup_pairs(video_dhash(d))

    def audio_fp_op(d):
        from tika_spark.analysis.audiohash import audio_fingerprint
        return audio_fingerprint(d)

    def audio_neardup_op(d):
        from tika_spark.analysis.audiohash import (
            audio_fingerprint, audio_neardup_pairs)
        return audio_neardup_pairs(audio_fingerprint(d))

    def bpe_merges(d):
        from tika_spark.analysis.bpe import bpe_train
        return bpe_train(d, num_merges=args.merges)

    def quality_clf(d):
        # label column must exist on the input (±1 seed labels);
        # output is the per-doc margin/prediction table
        from tika_spark.analysis.classifier import (perceptron_scores,
                                                    perceptron_train)
        from tika_spark.analysis.textstats import quality_features
        feat_cols = ["n_tokens", "n_stopwords", "n_digit",
                     "max_token_len"]
        feats = (quality_features(d)
                 .select("doc_id", *feat_cols, "y").persist())
        w = perceptron_train(feats, feat_cols, epochs=args.epochs)
        return perceptron_scores(feats, w, feat_cols)

    # html-tables / structured-data ops: input is a raw pages table
    # (url, html)
    def tables_op(d):
        from tika_spark.analysis.tables import html_tables
        return html_tables(d)

    def structdata_op(d):
        from tika_spark.html.structdata import structured_data
        return structured_data(d)

    def unigram_op(d):
        from tika_spark.analysis.unigram import unigram_train
        return unigram_train(d, vocab_size=args.vocab_size)

    def perplexity_kn(d):
        return curation.lm_perplexity_kn(d)

    def host_boiler(d):
        return curation.host_boilerplate_removal(d)

    def blocklist_op(d):
        return curation.blocklist_filter(
            d, [t for t in (args.terms or "").split(",") if t])

    def lang_spans_op(d):
        from tika_spark.language.spans import language_spans
        return language_spans(d)

    def pii_ext(d):
        return curation.pii_scrub_extended(d)

    def report_op(d):
        from tika_spark.analysis.textstats import corpus_report
        return corpus_report(d)

    def epoch_mix_op(d):
        return curation.epoch_mix(d, budget_tokens=args.mix_budget)

    # webgraph ops: input is an extraction output table carrying the
    # `links` column (url, links), not the documents table
    def pagerank_op(d):
        from tika_spark.analysis import webgraph
        hg = webgraph.host_graph(webgraph.link_edges(d))
        return webgraph.pagerank(hg, iterations=args.iterations)

    def anchors_op(d):
        from tika_spark.analysis import webgraph
        return webgraph.anchor_summary(webgraph.link_edges(d))

    def tfidf_op(d):
        return textstats.tfidf_keywords(d, k=args.k)

    def best_passage_op(d):
        from tika_spark.analysis.retrieval import best_passage
        return best_passage(d, args.query or "")

    # crawl-traps input is a url-bearing table (url[, ...]), like
    # the frontier/pages tables — not the documents table
    def crawl_traps_op(d):
        return curation.crawl_trap_flags(d)

    def containment_op(d):
        return dedup.containment_pairs(d, threshold=args.threshold)

    def hits_op(d):
        from tika_spark.analysis import webgraph
        if "html" in d.columns:
            from tika_spark.pipeline.job import extract
            d = extract(d, mode="text")
        edges = webgraph.link_edges(d)
        return webgraph.hits(webgraph.host_graph(edges))

    return {
        "dedup-exact": exact, "dedup-minhash": minhash,
        "dedup-simhash": simhash, "dedup-substring": substring,
        "dedup-remove-spans": remove_spans,
        "dedup-clusters": clusters, "quality": quality,
        "repetition": repetition, "paragraph-dedup": paragraph,
        "pii-scrub": pii, "normalize": normalize,
        "perplexity": perplexity, "pack": pack, "split": split,
        "mixture": mixture, "winnow": winnow, "c4": c4,
        "gopher": gopher, "paragraph-intra": para_intra,
        "pixel-stats": pixel_stats, "pcm-stats": pcm_stats,
        "video-frames": video_frames,
        "image-dhash": image_dhash_op,
        "image-dhash-pairs": image_dhash_pairs_op,
        "video-dhash": video_dhash_op,
        "video-neardup-pairs": video_neardup_op,
        "audio-fingerprint": audio_fp_op,
        "audio-neardup-pairs": audio_neardup_op,
        "bpe-merges": bpe_merges, "quality-classifier": quality_clf,
        "assign-splits": splits, "shuffle-order": shuffle,
        "pagerank": pagerank_op, "anchor-text": anchors_op,
        "html-tables": tables_op,
        "structured-data": structdata_op,
        "unigram-train": unigram_op,
        "perplexity-kn": perplexity_kn,
        "host-boilerplate": host_boiler,
        "blocklist": blocklist_op,
        "language-spans": lang_spans_op,
        "pii-scrub-extended": pii_ext,
        "corpus-report": report_op,
        "epoch-mix": epoch_mix_op,
        "tfidf-keywords": tfidf_op,
        "best-passage": best_passage_op,
        "crawl-traps": crawl_traps_op,
        "dedup-containment": containment_op,
        "hits": hits_op,
    }


def run(spark: SparkSession, input_path: str, output: str,
        ops: list[str], args) -> dict:
    docs: DataFrame = spark.read.parquet(input_path)
    table = _ops(args)
    written = {}
    for op in ops:
        out = table[op](docs)
        dest = os.path.join(output, op.replace("-", "_"))
        out.write.mode("overwrite").parquet(dest)
        written[op] = dest
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--op", action="append", required=True,
                   dest="ops", choices=sorted(_ops(
                       argparse.Namespace(threshold=0.5, k=8,
                                          budget=2048, overlap=128,
                                          every=2, hamming=7,
                                          merges=64, epochs=3,
                                          iterations=10,
                                          keep_first=False,
                                          train_frac=0.9,
                                          val_frac=0.05,
                                          test_frac=0.05,
                                          salt="")).keys()))
    p.add_argument("--query", default="",
                   help="query string for best-passage")
    p.add_argument("--threshold", type=float, default=0.5,
                   help="near-dup Jaccard threshold")
    p.add_argument("--k", type=int, default=8,
                   help="shingle size (dedup-substring)")
    p.add_argument("--budget", type=int, default=2048,
                   help="token budget (pack / split; split requires "
                        "budget > overlap)")
    p.add_argument("--overlap", type=int, default=128,
                   help="split chunk overlap in tokens "
                        "(must be < budget)")
    p.add_argument("--every", type=int, default=2,
                   help="sample every Nth frame (video-frames)")
    p.add_argument("--hamming", type=int, default=7,
                   help="max Hamming distance (image-dhash-pairs, "
                        "< 8 for banding completeness)")
    p.add_argument("--keep-first", action="store_true",
                   help="span dedup keeps the first occurrence "
                        "(dedup-remove-spans)")
    p.add_argument("--train-frac", type=float, default=0.9)
    p.add_argument("--val-frac", type=float, default=0.05)
    p.add_argument("--test-frac", type=float, default=0.05)
    p.add_argument("--salt", default="",
                   help="re-roll key for splits / shuffle order")
    p.add_argument("--merges", type=int, default=64,
                   help="BPE merges to learn (bpe-merges)")
    p.add_argument("--epochs", type=int, default=3,
                   help="perceptron epochs (quality-classifier)")
    p.add_argument("--iterations", type=int, default=10,
                   help="PageRank iterations (pagerank)")
    p.add_argument("--vocab-size", type=int, default=64,
                   dest="vocab_size",
                   help="unigram-LM vocab target (unigram-train)")
    p.add_argument("--terms", default="",
                   help="comma-separated blockterms (blocklist)")
    p.add_argument("--mix-budget", type=int, default=1_000_000,
                   dest="mix_budget",
                   help="token budget (epoch-mix)")
    p.add_argument("--cpus", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = p.parse_args(argv)

    spark = (SparkSession.builder
             .master(f"local[{args.cpus}]")
             .appName("tika-spark-curate")
             .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    try:
        written = run(spark, args.input, args.output, args.ops, args)
        for op, dest in written.items():
            n = spark.read.parquet(dest).count()
            print(f"[curate] {op}: {n} rows -> {dest}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
