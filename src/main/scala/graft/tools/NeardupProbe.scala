package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{ColumnOps, TextOps}

/** Stage decomposition of Dedup.jaccardPairs (the shared kernel of
  * q25/q44/q118 — ~8s of the round-12 baseline): times each prefix of the
  * pipeline with the noop sink so the marginal cost of every stage is
  * readable by subtraction. Mirrors the kernel's internals (same exprs) —
  * if the kernel changes, re-sync or retire this probe.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.NeardupProbe [reps]"
  */
object NeardupProbe {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = graft.core.Sessions.local("neardup-probe")
    val tau = 0.5 - 1e-6

    def docs = graft.core.Tables.load(spark, dir, "documents")
    def base = graft.core.Parallelize.fanOut(docs)
      .select(col("doc_id").as("id"),
        TextOps.wordShingles(col("text"), 3).as("shingles"))
      .filter(size(col("shingles")) > 0)
    def postings = base.select(col("id"), size(col("shingles")).as("n_sh"),
        explode(col("shingles")).as("shingle"))
      .select(col("id"), col("n_sh"), ColumnOps.stable64(col("shingle")).as("h"))
    def dfreq = postings.groupBy(col("h")).agg(count(lit(1)).as("df"))
    def withDf = postings.join(dfreq, "h")
    def prefix = {
      val byRarity = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("df").asc, col("h").asc)
      withDf.withColumn("rn", row_number().over(byRarity))
        .where(col("rn") <=
          floor(col("n_sh") * lit(1.0 - tau)).cast("int") + lit(1))
        .select(col("id"), col("n_sh"), col("rn"), col("h"))
    }
    def joined = prefix.as("a")
      .join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
          least(col("a.n_sh"), col("b.n_sh")).cast("double") >=
            greatest(col("a.n_sh"), col("b.n_sh")) * lit(tau) &&
          (least(col("a.n_sh") - col("a.rn"), col("b.n_sh") - col("b.rn"))
            + lit(1)).cast("double") * lit(1.0 + tau) >=
            (col("a.n_sh") + col("b.n_sh")).cast("double") * lit(tau))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    def sets0 = withDf.groupBy(col("id"))
      .agg(first(col("n_sh")).as("n_sh"),
        sort_array(collect_list(col("h"))).as("sh"))
    def pairs = graft.dedup.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)

    def time(tag: String, fn: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        spark.sparkContext.setJobDescription(s"probe $tag")
        val t0 = System.nanoTime()
        fn
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        dt
      }
      println(f"$tag%-28s min ${ts.min}%.3f reps ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    def noop(df: => DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm the whole stack once
    noop(pairs); noop(graft.dedup.Dedup.dupClusters(pairs))

    time("a_postings", noop(postings))
    time("b_withDf", noop(withDf))
    time("c_prefix", noop(prefix))
    time("d_joined(cands)", noop(joined))
    time("e_sets0", noop(sets0))
    time("f_octet_agg", {
      docs.agg(sum(octet_length(col("text")).cast("long"))).head
      ()
    })
    // variant: verification sets derived MAP-SIDE from the per-doc shingle
    // arrays (wordShingles is already distinct), skipping the exchange-by-id
    // + object agg that rebuilt them from the exploded postings
    def setsB = base.select(col("id"), size(col("shingles")).as("n_sh"),
      sort_array(transform(col("shingles"), s => ColumnOps.stable64(s))).as("sh"))
    def pairsB = {
      val threshold = 0.5
      joined
        .join(broadcast(setsB.select(col("id").as("id_a"), col("n_sh").as("n_a"),
          col("sh").as("sh_a"))), "id_a")
        .join(broadcast(setsB.select(col("id").as("id_b"), col("n_sh").as("n_b"),
          col("sh").as("sh_b"))), "id_b")
        .withColumn("inter",
          graft.functions.Intersect.sortedCount(col("sh_a"), col("sh_b")))
        .withColumn("jaccard", round(col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .distinct()
    }
    // variant: candidate generation via groupBy(h) + in-bucket pair
    // expansion (the q124 shape) instead of the prefix self-join — one
    // exchange + object agg vs two join exchanges; filters move into the
    // expansion lambda
    def joinedG = {
      val tauL = tau
      prefix.groupBy(col("h"))
        .agg(sort_array(collect_list(struct(col("id"), col("n_sh"),
          col("rn")))).as("ps"))
        .filter(size(col("ps")) > 1)
        .select(explode(expr(
          s"""flatten(transform(ps, (x, i) ->
             |  filter(transform(slice(ps, i + 2, size(ps)),
             |      y -> struct(x.id AS id_a, y.id AS id_b,
             |                  x.n_sh AS na, y.n_sh AS nb,
             |                  x.rn AS ra, y.rn AS rb)),
             |    p -> least(p.na, p.nb) >= greatest(p.na, p.nb) * $tauL
             |      AND (least(p.na - p.ra, p.nb - p.rb) + 1) * ${1.0 + tauL}
             |          >= (p.na + p.nb) * $tauL)))""".stripMargin)).as("p"))
        .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
    }
    def pairsG = {
      val threshold = 0.5
      joinedG
        .join(broadcast(setsB.select(col("id").as("id_a"), col("n_sh").as("n_a"),
          col("sh").as("sh_a"))), "id_a")
        .join(broadcast(setsB.select(col("id").as("id_b"), col("n_sh").as("n_b"),
          col("sh").as("sh_b"))), "id_b")
        .withColumn("inter",
          graft.functions.Intersect.sortedCount(col("sh_a"), col("sh_b")))
        .withColumn("jaccard", round(col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .distinct()
    }
    // variant: df via a window count over h (one exchange, no agg+join-back)
    def withDfW = postings.withColumn("df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("h"))))
    def prefixW = {
      val byRarity = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("df").asc, col("h").asc)
      withDfW.withColumn("rn", row_number().over(byRarity))
        .where(col("rn") <=
          floor(col("n_sh") * lit(1.0 - tau)).cast("int") + lit(1))
        .select(col("id"), col("n_sh"), col("rn"), col("h"))
    }
    def joinedW = prefixW.as("a")
      .join(prefixW.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
          least(col("a.n_sh"), col("b.n_sh")).cast("double") >=
            greatest(col("a.n_sh"), col("b.n_sh")) * lit(tau) &&
          (least(col("a.n_sh") - col("a.rn"), col("b.n_sh") - col("b.rn"))
            + lit(1)).cast("double") * lit(1.0 + tau) >=
            (col("a.n_sh") + col("b.n_sh")).cast("double") * lit(tau))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    def pairsW = {
      val threshold = 0.5
      joinedW
        .join(broadcast(setsB.select(col("id").as("id_a"), col("n_sh").as("n_a"),
          col("sh").as("sh_a"))), "id_a")
        .join(broadcast(setsB.select(col("id").as("id_b"), col("n_sh").as("n_b"),
          col("sh").as("sh_b"))), "id_b")
        .withColumn("inter",
          graft.functions.Intersect.sortedCount(col("sh_a"), col("sh_b")))
        .withColumn("jaccard", round(col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .distinct()
    }
    noop(pairsB); noop(pairsG); noop(pairsW) // warm
    time("g_jaccardPairs", noop(pairs))
    time("i_pairs_setsFromBase", noop(pairsB))
    time("j_pairs_groupExpand", noop(pairsG))
    time("k_pairs_windowDf", noop(pairsW))
    val pg = pairsG.collect().map(_.toSeq).toSet
    println(s"groupExpand parity vs shipped: ${pg == pairs.collect().map(_.toSeq).toSet}")
    println(s"windowDf parity vs shipped: ${pairsW.collect().map(_.toSeq).toSet == pairs.collect().map(_.toSeq).toSet}")
    time("h_dupClusters", noop(graft.dedup.Dedup.dupClusters(pairs)))
    val pa = pairs.collect().map(_.toSeq).toSet
    val pb = pairsB.collect().map(_.toSeq).toSet
    println(s"pairs parity: ${pa == pb} (${pa.size} vs ${pb.size})")
    println(s"cand rows=${joined.count()}, pair rows=${pairs.count()}, " +
      s"postings=${postings.count()}")
    spark.stop()
  }
}
