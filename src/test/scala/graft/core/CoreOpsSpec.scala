package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkSpec

class ChecksSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq((1L, "a", "a"), (2L, "b", "b"), (3L, "c", "C")).toDF("id", "x", "y")
  }

  test("requireColumns passes/throws with the missing names") {
    Checks.requireColumns(df, Seq("id", "x"))
    val e = intercept[Checks.MissingColumnsException](
      Checks.requireColumns(df, Seq("id", "nope")))
    assert(e.missing == Seq("nope"))
  }

  test("requireColumnsAbsent throws when a forbidden column exists") {
    Checks.requireColumnsAbsent(df, Seq("z"))
    intercept[Checks.UnexpectedColumnsException](
      Checks.requireColumnsAbsent(df, Seq("x")))
  }

  test("requireSchemaSubset checks name AND type") {
    Checks.requireSchemaSubset(df, StructType.fromDDL("id BIGINT, x STRING"))
    intercept[Checks.SchemaMismatchException](
      Checks.requireSchemaSubset(df, StructType.fromDDL("id INT")))
  }

  test("column extracts collect driver-side views") {
    assert(Checks.columnToList[Long](df, "id") == Seq(1L, 2L, 3L))
    assert(Checks.twoColumnsToMap[Long, String](df, "id", "x") ==
      Map(1L -> "a", 2L -> "b", 3L -> "c"))
    val maps = Checks.toListOfMaps(df.select(col("id"), col("x")))
    assert(maps.head == Map("id" -> 1L, "x" -> "a"))
  }

  test("assertColumnsEqual counts mismatches distributed") {
    Checks.assertColumnsEqual(df.filter(col("id") < 3), "x", "y")
    val e = intercept[Checks.ColumnMismatchException](
      Checks.assertColumnsEqual(df, "x", "y"))
    assert(e.getMessage.contains("1 rows"))
  }
}

class ObservedSpec extends SparkSpec {

  test("observe metrics ride the query and arrive via the listener") {
    import org.apache.spark.sql.functions._
    val listener = Observed.attach(spark)
    try {
      val df = Observed.withMetrics(
        graft.core.Tables.load(spark, sf, "orders"), "orders_obs",
        count(lit(1)).as("rows"),
        sum(when(col("o_totalprice") > 100000.0, 1L).otherwise(0L)).as("big"))
      val total = df.count()
      val m = listener.await("orders_obs")
      assert(m.getAs[Long]("rows") == total)
      assert(m.getAs[Long]("big") > 0 && m.getAs[Long]("big") < total)
    } finally spark.listenerManager.unregister(listener)
  }

  test("await consumes its observation: a reused name yields each run's OWN row") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val listener = Observed.attach(spark)
    try {
      def run(n: Int): Long = {
        val df = Observed.withMetrics(
          spark.range(n).toDF("id"), "loop_obs", count(lit(1)).as("rows"))
        df.count()
        listener.await("loop_obs").getAs[Long]("rows")
      }
      // a presence-only await returned run 1's stale row for run 2
      assert(run(3) == 3L)
      assert(run(7) == 7L)
      assert(listener.latest("loop_obs").isEmpty, "await must consume")
    } finally spark.listenerManager.unregister(listener)
  }
}

class JobContextSpec extends SparkSpec {

  test("counters accumulate from executor-side code and report as a table") {
    import spark.implicits._
    val ctx = new JobContext(spark)
    val rowsRead = ctx.counter("rows_read")
    val odd = ctx.counter("odd_rows")
    spark.createDataset(1 to 100).foreachPartition { (it: Iterator[Int]) =>
      it.foreach { i => rowsRead.add(1); if (i % 2 == 1) odd.add(1) }
    }
    assert(ctx.value("rows_read") == 100L)
    assert(ctx.value("odd_rows") == 50L)
    assert(ctx.report.contains("rows_read") && ctx.report.contains("100"))
  }

  test("counter registration on an executor fails fast with a clear error") {
    import spark.implicits._
    val ctx = new JobContext(spark)
    val e = intercept[Exception] {
      spark.createDataset(1 to 10).foreachPartition { (it: Iterator[Int]) =>
        it.foreach(_ => ctx.inc("never_registered"))
      }
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("never_registered")))
  }
}

class ScratchSpec extends graft.SparkSpec {

  test("cleanStale spares a tree with RECENT nested writes, reclaims truly idle ones") {
    import java.io.File
    val old = System.currentTimeMillis() - 3 * 60 * 60 * 1000
    // live: top dir old, but a nested state file written recently — the
    // streaming-checkpoint shape whose base mtime never refreshes
    val live = graft.core.Scratch.tempDir("spec_live").toFile
    val nested = new File(live, "q1/state"); nested.mkdirs()
    val fresh = new File(nested, "1.delta")
    java.nio.file.Files.writeString(fresh.toPath, "x")
    live.setLastModified(old); new File(live, "q1").setLastModified(old)
    nested.setLastModified(old) // only the FILE is fresh
    // idle: everything old
    val idle = graft.core.Scratch.tempDir("spec_idle").toFile
    val idleF = new File(idle, "f"); java.nio.file.Files.writeString(idleF.toPath, "y")
    idleF.setLastModified(old); idle.setLastModified(old)
    graft.core.Scratch.cleanStale()
    assert(live.isDirectory && fresh.isFile,
      "a tree with recent nested activity must survive")
    assert(!idle.exists, "a truly idle tree must be reclaimed")
    // targeted cleanup of THIS test's fixture only — cleanStale(0) would
    // reclaim the live process's own checkpoint base and staged fixtures
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
    }
    rm(live)
  }
}
