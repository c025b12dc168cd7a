package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextOps
import graft.text.Corpus

/** The composite pre-training corpus pipeline — the operators of this
  * library chained the way a user actually runs them: normalize → quality
  * gates → exact dedup → near-dup dedup → training-window chunking. Every
  * stage is an operator that is individually oracle-gated elsewhere
  * (q56/q80/q20/q40/q44/q61); q85 gates the whole composition end-to-end.
  *
  * Scale shape, stage by stage: normalization and the quality gates are
  * per-row (zero shuffle); exact dedup is one fingerprint-keyed window;
  * near-dup is the simhash band join (Σ bucket², cap-able via
  * `maxBucketSize`) plus connected components; chunking is per-row again.
  * No stage materializes to the driver.
  */
object PretrainCorpus {

  /** Thresholds are data-dependent knobs; defaults suit the synthetic
    * corpus (drop the ~10% shortest and the most repetitive tail). */
  final case class Config(
      minChars: Int = 120,
      maxRepPpm: Long = 80000,
      simhashMaxHamming: Int = 1,
      chunkSize: Int = 64,
      chunkOverlap: Int = 16,
      scrubPii: Boolean = false,
      maxBucketSize: Int = Int.MaxValue)

  /** Documents surviving normalize + quality + exact-dedup + near-dup
    * stages, as (id, text) — the corpus a tokenizer would consume. */
  def survivors(docs: DataFrame, idCol: String, textCol: String,
                cfg: Config = Config()): DataFrame = {
    val normed0 = docs.select(col(idCol).as("id"),
      TextOps.normalizeNfc(col(textCol)).as("text"))
    val normed =
      if (cfg.scrubPii) normed0.withColumn("text", TextOps.scrubPii(col("text")))
      else normed0
    // quality gates, all per-row: length floor + duplicate-2-gram ceiling
    // (the shared [[Corpus.repetitionPpm]] formula — same as q80's gate,
    // stats from the same one-pass [[TextOps.ngramStats]] kernel).
    // The non-null-stats gate also drops sub-2-token documents that pass
    // the length floor (a 500-char single token: URL, hash blob,
    // unsegmented script) — deliberate: they carry no shingle signal for
    // the near-dup stage and no usable training tokens, but it IS a
    // third gate, stated here.
    val quality = normed
      .withColumn("g", TextOps.ngramStats(col("text"), 2))
      .filter(length(col("text")) >= cfg.minChars && col("g").isNotNull)
      .filter(Corpus.repetitionPpm(col("g.n_grams"), col("g.n_distinct"))
        <= cfg.maxRepPpm)
      .select(col("id"), col("text"))
    // exact dedup: smallest id per content fingerprint survives.
    // Materialized eagerly: two consumers read it (the near-dup signature
    // derivation and the final anti-join), and without the checkpoint each
    // would re-run the normalize + shingle gates AND the fingerprint
    // window's full-text shuffle — at warehouse scale, two corpus-sized
    // exchanges for one. The checkpoint write is local (no network), the
    // same bytes the window shuffle already moved once.
    val exact = quality
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy(col("id"))))
      .filter(col("rn") === 1).drop("rn")
      .localCheckpoint(true)
    // near-dup dedup: sig-level components (the doc-pair graph never
    // materializes — see Dedup.simhashComponents) → the cluster's min id
    // survives; capped/singleton docs are absent or self-labeled and
    // therefore survive
    val losers = Dedup.simhashComponents(exact, "id", "text",
        cfg.simhashMaxHamming, cfg.maxBucketSize)
      .filter(col("cluster_id") =!= col("id")).select(col("id"))
    exact.join(losers, Seq("id"), "left_anti")
  }

  /** The full pipeline: [[survivors]] chunked into training windows. */
  def prepare(docs: DataFrame, idCol: String, textCol: String,
              cfg: Config = Config()): DataFrame =
    Corpus.chunk(survivors(docs, idCol, textCol, cfg), "id", "text",
      cfg.chunkSize, cfg.chunkOverlap)
}
