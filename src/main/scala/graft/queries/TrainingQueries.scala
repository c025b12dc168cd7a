package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.dedup.Dedup
import graft.functions.TextOps
import graft.sampling.Sampling
import graft.similarity.Similarity

/** Training-data pipeline query pack: dedup (exact / MinHash-LSH / SimHash /
  * n-gram Jaccard), similarity search (brute-force + IVF), and text analysis
  * (tokens, quality, language-ID, fingerprints) — each paired with a DuckDB
  * oracle that restates the same deterministic md5-based hash math.
  */
object TrainingQueries {

  /** The 8 seed centroids every IVF query shares (vec_id < 8, decoded to
    * primitive arrays, id-sorted). ONE definition — this block used to be
    * copy-pasted into q28/q41/q130/q134, and a centroid-count or decode
    * change applied to one site would silently desynchronize them. */
  private def seedCentroids(emb: DataFrame): Array[(Long, Array[Double])] =
    emb.filter(col("vec_id") < 8)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup: single hash-groupBy with map-side combine.
    "q20_exact_dedup" -> ((s, dir) =>
      Dedup.exactDupGroups(t(s, dir, "documents"), "doc_id", col("text"))),

    // Token statistics: whitespace + BPE-ish counts, mean token length.
    // fanOut(minBytes=0) on q21-q23/q53: pure per-row text work whose
    // interpreted-HOF/regex cost is orders beyond the scan, so a
    // single-split corpus must not run it on one core (see q29).
    "q21_token_stats" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      graft.core.Parallelize.fanOut(t(s, dir, "documents"), 0L).select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        TextOps.bpeTokenCount(col("text")).as("n_bpe_tokens"),
        // try_divide: a no-token document divides by zero, where the DuckDB
        // oracle's bare `/` yields NULL — ANSI Spark would abort the job.
        round(try_divide(
          aggregate(transform(toks, tk => length(tk)), lit(0L), (a, x) => a + x)
            .cast("double"), size(toks).cast("double")), 6).as("avg_token_len"))
    }),

    // Quality scoring: stopword/punct ratios + composite score. quant6,
    // not round(double, 6): floor-quantization is the cross-engine-exact
    // 6-dp form (both engines floor the identical double).
    "q22_quality_score" -> ((s, dir) =>
      graft.core.Parallelize.fanOut(t(s, dir, "documents"), 0L).select(
        col("doc_id"),
        TextOps.quant6(TextOps.stopwordRatio(col("text"))).as("stop_ratio"),
        TextOps.quant6(TextOps.punctRatio(col("text"))).as("punct_ratio"),
        TextOps.qualityScore(col("text")).as("quality"))),

    // Language ID: marker-profile argmax vs the labeled lang column.
    "q23_lang_id" -> ((s, dir) =>
      graft.core.Parallelize.fanOut(t(s, dir, "documents"), 0L)
        .select(col("lang").as("actual_lang"), TextOps.langId(col("text")).as("predicted_lang"))
        .groupBy(col("actual_lang"), col("predicted_lang"))
        .agg(count(lit(1)).as("n"))),

    // MinHash + LSH near-dup candidates (16 perms, 4 bands × 4 rows).
    "q24_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashCandidatePairs(t(s, dir, "documents"), "doc_id", "text")
        .filter(col("est_jaccard") >= 0.5)),

    // Exact n-gram Jaccard near-dups via inverted shingle index.
    "q25_ngram_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text", 3, 0.5)),

    // Per-document 31-bit SimHash + popcount, via the explode/aggregate
    // formulation (hash each token once, codegen'd bit aggregates) — the
    // per-row HOF variant interprets 31 bit-lambdas per row. Docs with no
    // tokens (no exploded rows) rejoin with simhash 0, matching simhash31's
    // empty-input value.
    "q26_simhash" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sigs = Dedup.simhashSignatures(docs, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
      docs.select(col("doc_id")).join(sigs, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("simhash"), lit(0L)).as("simhash"),
          bit_count(coalesce(col("simhash"), lit(0L))).cast("int").as("n_bits"))
    }),

    // Brute-force cosine top-5 for 10 query vectors (ANN baseline).
    "q27_ann_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, 5)
        .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
    }),

    // IVF bucket assignment to 8 seed centroids (the ANN scale path).
    "q28_ivf_assign" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val centroids = seedCentroids(emb)
      Similarity.ivfAssign(emb, centroids)
        .select(col("vec_id"), col("cluster_id"), col("cluster_dist"))
    }),

    // SemDeDup-style semantic dedup, fully oracle-gated (the scale path
    // q39's doc only described): IVF-assign to the 8 seed centroids, score
    // pairs only WITHIN a cluster (Σ cluster² not n²), then the
    // deterministic survivor rule — a vector is dropped iff some LOWER-id
    // vector in its cluster is ≥ τ cosine-similar. Output is per-vector
    // accounting (cluster, kept), so the gate certifies assignment, pair
    // recall, and survivor logic. One call: under the broadcast guard the
    // accounting kernel emits kept flags from a single range job (no pair
    // materialization, no distinct/join shuffles, no second argmin scan);
    // past it the declarative twin runs — assignment left-joined against
    // the distinct dropped-id set, shuffled on cluster_id so AQE splits
    // skewed clusters.
    "q134_semantic_dedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Dedup.semanticDedupIvf(emb, seedCentroids(emb), 0.4)
    }),

    // Document fingerprints: Karp-Rabin rolling hash + winnowing min-hash.
    // fanOut(minBytes=0): the per-char HOF folds cost ~1000× a scan of the
    // same bytes, so even a single-split corpus is worth one exchange —
    // measured 59.5s single-task vs ~2s fanned on a 50k-doc corpus.
    "q29_fingerprint" -> ((s, dir) =>
      graft.core.Parallelize.fanOut(t(s, dir, "documents"), 0L).select(
        col("doc_id"),
        TextOps.rollingHash(col("text")).as("doc_hash"),
        TextOps.minShingleFingerprint(col("text"), 3).as("min_shingle_hash"))),

    // Embedding-cosine near-dup pairs (exact all-pairs baseline; threshold
    // 0.4 is the demo knob for this synthetic near-orthogonal corpus — real
    // embedding dedup runs ~0.95). The IVF-bucketed scale path is
    // Dedup.embeddingNearDupsIvf, exercised in DedupSimilaritySpec.
    "q39_embedding_neardup" -> ((s, dir) =>
      Dedup.embeddingNearDups(t(s, dir, "embeddings"), "vec_id", "embedding", 0.4)),

    // SimHash near-dup pairs via 4-byte-band LSH bucket join + exact
    // Hamming verify (maxHamming 1 keeps perfect band recall).
    "q40_simhash_neardup" -> ((s, dir) =>
      Dedup.simhashNearDupPairs(t(s, dir, "documents"), "doc_id", "text", 1)),

    // Unicode NFC normalization before hashing: the text is adversarially
    // suffixed with a DECOMPOSED "é" (e + combining acute); after NFC both
    // engines must hash the COMPOSED form identically — without
    // normalization, hash dedup treats equal-looking strings as distinct.
    "q56_unicode_norm" -> ((s, dir) => {
      // decomposed suffix: 'e' + COMBINING ACUTE (U+0301); NFC composes it
      val decomposed = concat(col("text"), lit(" cafe"), lit("\u0301"))
      t(s, dir, "documents").select(
        col("doc_id"),
        md5(TextOps.normalizeNfc(decomposed)).as("norm_hash"),
        length(TextOps.normalizeNfc(decomposed)).as("norm_len"))
    }),

    // PII scrubbing: URL/email/phone redaction to typed placeholders, with
    // a pre-scrub email count as the audit metric. Output hashes the
    // scrubbed text so the gate verifies every replacement byte-exactly.
    "q53_pii_scrub" -> ((s, dir) =>
      graft.core.Parallelize.fanOut(t(s, dir, "documents"), 0L).select(
        col("doc_id"),
        md5(TextOps.scrubPii(col("text"))).as("scrubbed_hash"),
        TextOps.emailCount(col("text")).cast("int").as("n_emails"))),

    // Deterministic hash sampling (20%): membership from the row key alone —
    // reproducible across partitionings/reruns, subset-monotone in the rate.
    "q54_hash_sample" -> ((s, dir) =>
      Sampling.hashSample(t(s, dir, "documents"), col("doc_id"), 20)
        .select(col("doc_id"), col("lang"))),

    // Deterministic stratified quota: 20 docs per language by ascending key
    // hash — rebalances skewed language distributions reproducibly.
    "q55_stratified_quota" -> ((s, dir) =>
      Sampling.stratifiedQuota(t(s, dir, "documents"), col("lang"),
          col("doc_id"), 20)
        .select(col("doc_id"), col("lang"))),

    // Dup-cluster resolution: exact-Jaccard near-dup pairs (q25) collapsed
    // into connected components; cluster_id = smallest doc_id in the
    // component (the canonical survivor).
    "q44_dup_clusters" -> ((s, dir) =>
      Dedup.dupClusters(
          Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text", 3, 0.5))
        .withColumnRenamed("id", "doc_id")),

    // ANN quality metric under the gate: recall@5 of the IVF path (q41)
    // against the exact brute-force top-5 (q27), in integer ppm per query.
    // Both neighbor sets are independently oracle-verified; this gates the
    // EVALUATION arithmetic itself — the metric a 100 TB ANN deployment
    // watches when tuning nlist/nprobe.
    "q130_ivf_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // both derived sets are referenced twice below — materialize once
      // (MEMORY: spark-materialize-before-reuse)
      val exact = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, 5)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(true)
      val centroids = seedCentroids(emb)
      val assigned = Similarity.ivfAssign(emb, centroids).localCheckpoint(true)
      val approx = Similarity.ivfTopK(assigned,
          assigned.filter(col("vec_id") < 10), 5)
        .select(col("query_id"), col("neighbor_id"))
      // both joins carry |queries|*k rows — broadcast them explicitly
      // (checkpointed inputs have no stats, the static planner would SMJ)
      val hits = broadcast(exact).join(approx, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_match"))
      exact.select(col("query_id")).distinct()
        .join(broadcast(hits), Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_match"), lit(0L)).as("n_match"),
          expr("(coalesce(n_match, 0L) * 1000000) div 5").as("recall_ppm"))
    }),

    // IVF search path: assign corpus to 8 seed centroids, then cosine top-5
    // scored only within each query's own cluster (nprobe=1).
    "q41_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val centroids = seedCentroids(emb)
      val assigned = Similarity.ivfAssign(emb, centroids)
      val queries = assigned.filter(col("vec_id") < 10)
      Similarity.ivfTopK(assigned, queries, 5)
        .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
    })
  )

  // ---- oracle SQL --------------------------------------------------------

  /** DuckDB restatement of [[TextOps.h31]]. */
  private def h31(e: String): String =
    s"(('0x' || substr(md5($e), 1, 15))::BIGINT % 2147483647)"

  /** DuckDB: distinct word 3-gram shingles of column `text`. */
  private val shingles3 =
    """list_distinct(CASE WHEN len(string_split_regex(text,'\s+')) < 3 THEN []::VARCHAR[]
      | ELSE [array_to_string(list_slice(string_split_regex(text,'\s+'), i, i+2), ' ')
      |        for i in range(1, len(string_split_regex(text,'\s+')) - 1)] END)""".stripMargin

  /** DuckDB: Karp-Rabin rolling hash of string expression `e` (BIGINT fold —
    * int32 would overflow loudly in DuckDB). */
  private def rollSql(e: String): String =
    s"""list_reduce([0]::BIGINT[] || list_transform(string_split($e, ''), ch -> ascii(ch)::BIGINT),
       | (acc, x) -> (acc * 31 + x) % 2147483647)""".stripMargin

  /** DuckDB: sequential-left-fold dot product of DOUBLE[] a·b (bit-identical
    * to Spark's aggregate(zip_with(...))). Expressed as the native
    * `list_inner_product` since round 9: it accumulates in the same
    * left-to-right order, verified BIT-IDENTICAL (raw doubles, not just
    * at round-6) against the explicit list_reduce fold over all 2M sf0.1
    * pairs and a 40M-dot rotated-10× sample — and it is what makes the
    * q39/q134 all-pairs oracles tractable at 20k vectors (the lambda
    * fold interprets ~38G lambda steps there; the native kernel
    * vectorizes). The identity is EMPIRICAL, pinned to duckdb 1.0.0
    * (`DUCKDB_PINNED` in scripts/oracle_check.py): a DuckDB upgrade that
    * vectorizes/reorders accumulation (pairwise, FMA) would shift the
    * oracle by ulps, so every oracle run re-proves
    * `list_inner_product == sequential fold` on a 64-vector sample
    * (oracle_check.dot_sanity) and aborts loudly on drift instead of
    * absorbing it. */
  private def dotSql(a: String, b: String): String =
    s"list_inner_product($a, $b)"

  val oracles: Map[String, String] = Map(
    "q20_exact_dedup" ->
      """SELECT md5(concat_ws('~', COALESCE(text, chr(0)))) AS content_hash,
        | MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "q21_token_stats" ->
      """SELECT doc_id,
        | len(list_filter(string_split_regex(text,'\s+'), t -> t <> '')) AS n_tokens,
        | len(regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe_tokens,
        | round(list_sum(list_transform(list_filter(string_split_regex(text,'\s+'), t -> t <> ''), t -> length(t)))::DOUBLE
        |   / len(list_filter(string_split_regex(text,'\s+'), t -> t <> ''))::DOUBLE, 6) AS avg_token_len
        |FROM documents""".stripMargin,

    "q22_quality_score" ->
      """WITH q AS (
        | SELECT doc_id,
        |  list_filter(string_split_regex(text,'\s+'), t -> t <> '') AS toks,
        |  length(text) AS n_chars,
        |  length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS n_punct
        | FROM documents)
        |SELECT doc_id,
        | FLOOR((CASE WHEN len(toks) = 0 THEN 0.0 ELSE
        |   len(list_filter(toks, t -> t IN ('the','a','an','of','and','or','in','on','to','is')))::DOUBLE / len(toks)::DOUBLE END) * 1e6 + 0.5) / 1e6 AS stop_ratio,
        | FLOOR((CASE WHEN n_chars = 0 THEN 0.0 ELSE n_punct::DOUBLE / n_chars::DOUBLE END) * 1e6 + 0.5) / 1e6 AS punct_ratio,
        | FLOOR((least(len(toks)::DOUBLE / 100.0, 1.0) * 0.5
        |   + (1.0 - CASE WHEN len(toks) = 0 THEN 0.0 ELSE
        |       len(list_filter(toks, t -> t IN ('the','a','an','of','and','or','in','on','to','is')))::DOUBLE / len(toks)::DOUBLE END) * 0.3
        |   + (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE n_punct::DOUBLE / n_chars::DOUBLE END) * 0.2) * 1e6 + 0.5) / 1e6 AS quality
        |FROM q""".stripMargin,

    "q23_lang_id" ->
      """WITH s AS (
        | SELECT lang AS actual_lang,
        |  len(list_filter(string_split_regex(text,'\s+'), t -> t IN ('the','a','of','and'))) AS s_en,
        |  len(list_filter(string_split_regex(text,'\s+'), t -> t IN ('el','la','de','que'))) AS s_es,
        |  len(list_filter(string_split_regex(text,'\s+'), t -> t IN ('der','die','und','das'))) AS s_de,
        |  len(list_filter(string_split_regex(text,'\s+'), t -> t IN ('le','les','et','une'))) AS s_fr
        | FROM documents)
        |SELECT actual_lang,
        | CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
        |      WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
        |      WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
        |      WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
        |      ELSE 'fr' END AS predicted_lang,
        | COUNT(*) AS n
        |FROM s GROUP BY 1, 2""".stripMargin,

    "q24_minhash_lsh" ->
      s"""WITH sh AS (
         | SELECT doc_id, $shingles3 AS shingles FROM documents),
         |sig AS (
         | SELECT doc_id,
         |  list_transform(range(0, 16), i -> list_min(list_transform(
         |    list_transform(shingles, sg -> ${h31("sg")}),
         |    h -> (h * (2*i + 3) + (7919*i + 1)) % 2147483647))) AS sig
         | FROM sh WHERE len(shingles) > 0),
         |bk AS MATERIALIZED (
         | SELECT doc_id, sig, unnest(list_transform(range(0, 4),
         |   b -> md5(concat_ws('_', b::VARCHAR, array_to_string(list_slice(sig, b*4 + 1, b*4 + 4), '_'))))) AS bucket
         | FROM sig)
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         | len(list_filter(range(1, 17), i -> a.sig[i] = b.sig[i]))::DOUBLE / 16.0 AS est_jaccard
         |FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
         |WHERE len(list_filter(range(1, 17), i -> a.sig[i] = b.sig[i]))::DOUBLE / 16.0 >= 0.5""".stripMargin,

    "q25_ngram_jaccard" ->
      s"""WITH s AS (
         | SELECT doc_id, $shingles3 AS shingles FROM documents),
         |e AS MATERIALIZED (
         | SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle
         | FROM s WHERE len(shingles) > 0)
         |SELECT id_a, id_b, jaccard FROM (
         | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(COUNT(*)::DOUBLE / (a.n_sh + b.n_sh - COUNT(*))::DOUBLE, 6) AS jaccard
         | FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         | GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh)
         |WHERE jaccard >= 0.5""".stripMargin,

    "q26_simhash" -> {
      val powers = (0 until 31).map(j => 1L << j).mkString("[", ", ", "]")
      s"""WITH h AS (
         | SELECT doc_id,
         |  list_transform(list_distinct(list_filter(string_split_regex(text,'\\s+'), t -> t <> '')),
         |    tk -> ${h31("tk")}) AS hs
         | FROM documents)
         |SELECT doc_id,
         | list_sum(list_transform($powers::BIGINT[],
         |   e -> CASE WHEN 2 * len(list_filter(hs, v -> v % (e * 2) >= e)) > len(hs) THEN e ELSE 0 END))::BIGINT AS simhash,
         | bit_count(list_sum(list_transform($powers::BIGINT[],
         |   e -> CASE WHEN 2 * len(list_filter(hs, v -> v % (e * 2) >= e)) > len(hs) THEN e ELSE 0 END))::BIGINT)::INT AS n_bits
         |FROM h""".stripMargin
    },

    "q27_ann_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
         |s AS (
         | SELECT query_id, e.vec_id AS neighbor_id,
         |  round(${dotSql("qv", "e.v")} / (sqrt(${dotSql("qv", "qv")}) * sqrt(${dotSql("e.v", "e.v")})), 6) AS cos_sim
         | FROM e CROSS JOIN q WHERE e.vec_id <> query_id)
         |SELECT query_id, neighbor_id, cos_sim, rank FROM (
         | SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
         | FROM s) WHERE rank <= 5""".stripMargin,

    "q130_ivf_recall" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS MATERIALIZED (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
         |bfs AS (
         | SELECT query_id, e.vec_id AS neighbor_id,
         |  round(${dotSql("qv", "e.v")} / (sqrt(${dotSql("qv", "qv")}) * sqrt(${dotSql("e.v", "e.v")})), 6) AS cos_sim
         | FROM e CROSS JOIN q WHERE e.vec_id <> query_id),
         |bf AS MATERIALIZED (
         | SELECT query_id, neighbor_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
         |  FROM bfs) WHERE rank <= 5),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |d AS (
         | SELECT e.vec_id, c.cid,
         |  list_reduce([0.0]::DOUBLE[] || list_transform(range(1, len(e.v) + 1), i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])),
         |   (acc, x) -> acc + x) AS dist
         | FROM e CROSS JOIN c),
         |asg AS MATERIALIZED (
         | SELECT vec_id, cid AS cluster_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn FROM d)
         | WHERE rn = 1),
         |q2 AS (SELECT e.vec_id AS query_id, e.v AS qv, a.cluster_id AS qc
         |       FROM e JOIN asg a ON e.vec_id = a.vec_id WHERE e.vec_id < 10),
         |ivs AS (
         | SELECT q2.query_id, e.vec_id AS neighbor_id,
         |  round(${dotSql("q2.qv", "e.v")} / (sqrt(${dotSql("q2.qv", "q2.qv")}) * sqrt(${dotSql("e.v", "e.v")})), 6) AS cos_sim
         | FROM e JOIN asg a ON e.vec_id = a.vec_id
         | JOIN q2 ON a.cluster_id = q2.qc AND e.vec_id <> q2.query_id),
         |ivf AS MATERIALIZED (
         | SELECT query_id, neighbor_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
         |  FROM ivs) WHERE rank <= 5),
         |h AS (SELECT bf.query_id, COUNT(*) AS n_match
         |      FROM bf JOIN ivf USING (query_id, neighbor_id) GROUP BY 1)
         |SELECT qq.query_id, CAST(COALESCE(h.n_match, 0) AS BIGINT) AS n_match,
         |  CAST((COALESCE(h.n_match, 0) * 1000000) // 5 AS BIGINT) AS recall_ppm
         |FROM (SELECT DISTINCT query_id FROM bf) qq
         |LEFT JOIN h ON h.query_id = qq.query_id""".stripMargin,

    "q28_ivf_assign" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |d AS (
         | SELECT e.vec_id, c.cid,
         |  list_reduce([0.0]::DOUBLE[] || list_transform(range(1, len(e.v) + 1), i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])),
         |   (acc, x) -> acc + x) AS dist
         | FROM e CROSS JOIN c)
         |SELECT vec_id, cid AS cluster_id, round(dist, 6) AS cluster_dist FROM (
         | SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
         | FROM d) WHERE rn = 1""".stripMargin,

    "q134_semantic_dedup" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |d AS (
         | SELECT e.vec_id, c.cid,
         |  list_reduce([0.0]::DOUBLE[] || list_transform(range(1, len(e.v) + 1), i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])),
         |   (acc, x) -> acc + x) AS dist
         | FROM e CROSS JOIN c),
         |asg AS MATERIALIZED (
         | SELECT vec_id, cid AS cluster_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn FROM d)
         | WHERE rn = 1),
         |p AS (
         | SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(${dotSql("a.v", "b.v")} / (sqrt(${dotSql("a.v", "a.v")}) * sqrt(${dotSql("b.v", "b.v")})), 6) AS cos_sim
         | FROM e a JOIN asg aa ON a.vec_id = aa.vec_id
         | JOIN asg bb ON bb.cluster_id = aa.cluster_id AND aa.vec_id < bb.vec_id
         | JOIN e b ON b.vec_id = bb.vec_id),
         |drp AS (SELECT DISTINCT id_b AS vec_id FROM p WHERE cos_sim >= 0.4)
         |SELECT a.vec_id, a.cluster_id,
         |  CASE WHEN drp.vec_id IS NULL THEN 1 ELSE 0 END AS kept
         |FROM asg a LEFT JOIN drp ON a.vec_id = drp.vec_id""".stripMargin,

    "q29_fingerprint" ->
      s"""SELECT doc_id,
         | ${rollSql("text")} AS doc_hash,
         | list_min(list_transform($shingles3, sg -> ${rollSql("sg")})) AS min_shingle_hash
         |FROM documents""".stripMargin,

    "q39_embedding_neardup" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s AS (
         | SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(${dotSql("a.v", "b.v")} / (sqrt(${dotSql("a.v", "a.v")}) * sqrt(${dotSql("b.v", "b.v")})), 6) AS cos_sim
         | FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |SELECT id_a, id_b, cos_sim FROM s WHERE cos_sim >= 0.4""".stripMargin,

    "q40_simhash_neardup" -> {
      val powers = (0 until 31).map(j => 1L << j).mkString("[", ", ", "]")
      s"""WITH h AS (
         | SELECT doc_id,
         |  list_transform(list_distinct(list_filter(string_split_regex(text,'\\s+'), t -> t <> '')),
         |    tk -> ${h31("tk")}) AS hs
         | FROM documents),
         |sig AS (
         | SELECT doc_id, list_sum(list_transform($powers::BIGINT[],
         |   e -> CASE WHEN 2 * len(list_filter(hs, v -> v % (e * 2) >= e)) > len(hs) THEN e ELSE 0 END))::BIGINT AS simhash
         | FROM h),
         |bands AS (
         | SELECT doc_id, simhash, unnest(list_transform(range(0, 4),
         |   k -> k::VARCHAR || '_' || ((simhash // (256**k)::BIGINT) % 256)::VARCHAR)) AS band
         | FROM sig)
         |SELECT id_a, id_b, hamming FROM (
         | SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |  bit_count(xor(a.simhash, b.simhash))::INT AS hamming
         | FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id)
         |WHERE hamming <= 1""".stripMargin
    },

    "q56_unicode_norm" ->
      """SELECT doc_id,
        | md5(nfc_normalize(text || ' cafe' || chr(769))) AS norm_hash,
        | length(nfc_normalize(text || ' cafe' || chr(769))) AS norm_len
        |FROM documents""".stripMargin,

    "q53_pii_scrub" ->
      """SELECT doc_id,
        | md5(regexp_replace(regexp_replace(regexp_replace(text,
        |   'https?://[^\s]+', '<URL>', 'g'),
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\+?[0-9][0-9()\-. ]{7,}[0-9]', '<PHONE>', 'g')) AS scrubbed_hash,
        | len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::INT AS n_emails
        |FROM documents""".stripMargin,

    "q54_hash_sample" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${h31("COALESCE(CAST(doc_id AS VARCHAR), chr(0) || 'null')")} % 100 < 20""".stripMargin,

    "q55_stratified_quota" ->
      s"""SELECT doc_id, lang FROM (
         | SELECT doc_id, lang, row_number() OVER (
         |   PARTITION BY lang
         |   ORDER BY ${h31("COALESCE(CAST(doc_id AS VARCHAR), chr(0) || 'null')")} ASC, doc_id ASC) AS rn
         | FROM documents) WHERE rn <= 20""".stripMargin,

    // Transitive closure over the q25 pair set; label = min reachable id.
    "q44_dup_clusters" ->
      s"""WITH RECURSIVE
         |s AS MATERIALIZED (SELECT doc_id, $shingles3 AS shingles FROM documents),
         |e AS MATERIALIZED (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle
         |      FROM s WHERE len(shingles) > 0),
         |pairs AS MATERIALIZED (
         | SELECT id_a, id_b FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |   round(COUNT(*)::DOUBLE / (a.n_sh + b.n_sh - COUNT(*))::DOUBLE, 6) AS jaccard
         |  FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh)
         | WHERE jaccard >= 0.5),
         |edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |closure(a, b) AS (
         | SELECT src, dst FROM edges
         | UNION
         | SELECT c.a, ed.dst FROM closure c JOIN edges ed ON c.b = ed.src)
         |SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
         |FROM closure GROUP BY a""".stripMargin,

    "q41_ivf_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |d AS (
         | SELECT e.vec_id, c.cid,
         |  list_reduce([0.0]::DOUBLE[] || list_transform(range(1, len(e.v) + 1), i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])),
         |   (acc, x) -> acc + x) AS dist
         | FROM e CROSS JOIN c),
         |asg AS (
         | SELECT vec_id, cid AS cluster_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn FROM d)
         | WHERE rn = 1),
         |q AS (SELECT e.vec_id AS query_id, e.v AS qv, a.cluster_id AS qc
         |      FROM e JOIN asg a ON e.vec_id = a.vec_id WHERE e.vec_id < 10),
         |s AS (
         | SELECT q.query_id, e.vec_id AS neighbor_id,
         |  round(${dotSql("q.qv", "e.v")} / (sqrt(${dotSql("q.qv", "q.qv")}) * sqrt(${dotSql("e.v", "e.v")})), 6) AS cos_sim
         | FROM e JOIN asg a ON e.vec_id = a.vec_id
         | JOIN q ON a.cluster_id = q.qc AND e.vec_id <> q.query_id)
         |SELECT query_id, neighbor_id, cos_sim, rank FROM (
         | SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
         | FROM s) WHERE rank <= 5""".stripMargin
  )
}
