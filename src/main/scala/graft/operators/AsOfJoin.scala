package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark's built-ins don't name,
  * composed scalably from union + window instead of an inequality join:
  * for every left row, attach the latest right row with the same key whose
  * timestamp is at-or-before the left timestamp.
  *
  * Why not `l.join(r, keys && r.ts <= l.ts)` + max-per-group? That
  * inequality join explodes to Σ (left_key × right_key) rows before the
  * reduction — quadratic per key. Here both sides are UNIONED, shuffled
  * once on the key, sorted by (ts, side), and each left row reads the
  * running `last(right_payload, ignoreNulls)` over rows-unbounded-preceding
  * — one shuffle + sort, linear in rows, with running window state (no
  * re-scan per row). This is the plan a native ASOF operator produces;
  * DuckDB's `ASOF JOIN` is the oracle for it (q45).
  *
  * Ties: a right row AT the left timestamp matches (`>=` semantics — the
  * right side sorts before the left at equal ts). Right rows should be
  * unique per (key, ts); pre-dedupe with [[latestPerKeyTs]] for
  * deterministic results (any engine's ASOF is otherwise free to pick
  * either duplicate).
  */
object AsOfJoin {

  /** Deduplicate `df` to one row per (keys, ts): the one with the greatest
    * `tiebreak` value. */
  def latestPerKeyTs(df: DataFrame, keys: Seq[String], ts: String,
                     tiebreak: String): DataFrame = {
    val w = Window.partitionBy((keys :+ ts).map(col): _*)
      .orderBy(col(tiebreak).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Left as-of join: every `left` row, plus `right`'s payload columns from
    * the nearest right row with the same key — at-or-before the left
    * timestamp (`direction = "backward"`, default) or at-or-after it
    * (`"forward"`); nulls when no right row qualifies. `rightCols` are the
    * payload columns to carry and must not collide with left's columns.
    *
    * `toleranceUs` (µs) bounds how far the match may be from the left
    * timestamp: a nearest row beyond it is nulled out (left-join
    * semantics), exactly like a native ASOF ... TOLERANCE clause. The
    * plan is unchanged — the bound is a post-window null-out, not a join
    * condition, so it costs nothing. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKeys: Seq[String], rightKeys: Seq[String],
               leftTs: String, rightTs: String,
               rightCols: Seq[String],
               direction: String = "backward",
               toleranceUs: Option[Long] = None): DataFrame = {
    require(leftKeys.length == rightKeys.length, "key arity mismatch")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val reserved = Set("__k", "__ts", "__side", "__p", "__match")
    require(!left.columns.exists(reserved), s"left columns collide with " +
      s"asofJoin internals: ${left.columns.filter(reserved).mkString(", ")}")
    require(!rightCols.contains("__rts"), "__rts is reserved in rightCols")
    // Enforce the documented no-collision precondition loudly: emitting a
    // frame with duplicate column names only blows up (ambiguous
    // reference) at the caller's NEXT use, far from the true call site.
    val collide = rightCols.filter(left.columns.toSet)
    require(collide.isEmpty,
      s"rightCols collide with left's columns: ${collide.mkString(", ")}")
    val leftOut = left.columns.toSeq
    // Key struct fields named positionally so unionByName sees the same
    // nested names on both sides.
    def keyStruct(keys: Seq[String]) =
      struct(keys.zipWithIndex.map { case (c, i) => col(c).as(s"k$i") }: _*)
    // The matched right timestamp rides inside the payload (µs) so the
    // tolerance can be applied after the window without a second join.
    def micros(c: Column) = unix_micros(c.cast("timestamp"))
    // A right row with a NULL timestamp can never be an as-of match (every
    // native ASOF's NULL comparison is false) — but under `asc` it would
    // SORT FIRST, so the running last() attached its payload to every left
    // row preceding the first real right row. Filter it out of the union.
    val rSel = right.where(col(rightTs).isNotNull).select(
      keyStruct(rightKeys).as("__k"),
      col(rightTs).as("__ts"),
      lit(0).as("__side"),
      struct((rightCols.map(col) :+ micros(col(rightTs)).as("__rts")): _*).as("__p"))
    val payloadType = rSel.schema("__p").dataType
    val lSel = left.select(
      (leftOut.map(col) :+
        keyStruct(leftKeys).as("__k") :+
        col(leftTs).as("__ts") :+
        lit(1).as("__side") :+
        lit(null).cast(payloadType).as("__p")): _*)
    val rAligned = rSel.select(
      (leftOut.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__k"), col("__ts"), col("__side"), col("__p"))): _*)
    // backward: ascending ts, running last-right ⇒ latest at-or-before;
    // forward: descending ts, same running last ⇒ earliest at-or-after.
    // Right sorts before left at equal ts either way (>= / <= inclusive).
    val ord = if (direction == "backward")
      Seq(col("__ts").asc, col("__side").asc)
    else Seq(col("__ts").desc, col("__side").asc)
    val w = Window.partitionBy(col("__k"))
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lSel.unionByName(rAligned)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      // A NULL-timestamp LEFT row matches nothing either: under `desc`
      // (forward) it sorts after every right row and the running last()
      // would hand it the final payload — null it explicitly.
      .withColumn("__match",
        when(col("__ts").isNull, lit(null).cast(payloadType))
          .otherwise(col("__match")))
    val bounded = toleranceUs match {
      case None => matched
      case Some(tol) =>
        val dist =
          if (direction == "backward") micros(col(leftTs)) - col("__match.__rts")
          else col("__match.__rts") - micros(col(leftTs))
        matched.withColumn("__match",
          when(dist <= tol, col("__match")).otherwise(lit(null).cast(payloadType)))
    }
    bounded.select(
      (leftOut.map(col) ++ rightCols.map(c => col(s"__match.$c").as(c))): _*)
  }
}
