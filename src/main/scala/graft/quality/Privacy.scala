package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-risk auditing for release pipelines, complementing the PII
  * scrubbing in [[graft.functions.TextOps]]: before a dataset ships,
  * measure how identifiable its quasi-identifier combinations are.
  */
object Privacy {

  /** k-anonymity audit over the quasi-identifier columns: one row per QI
    * equivalence class with its size, whether it violates k (size < k),
    * and the re-identification risk as integer ppm (1e6 div size — the
    * probability an attacker who knows the QI tuple pins the exact row).
    * One map-side-combine hash-agg; output is |QI-space|, not |rows|. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select(qiCols.map(col) ++ Seq(
        col("n"),
        (col("n") < k).as("violates"),
        expr("1000000 div n").as("risk_ppm")): _*)
}
