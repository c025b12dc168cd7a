package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Extensions inject at session construction, so this suite builds a fresh
  * SparkSession over the SHARED SparkContext (clear default/active, build
  * with extensions, restore the shared session afterwards — suites run
  * sequentially in the forked test JVM, so the swap is safe). */
class GraftExtensionsSpec extends AnyFunSuite {

  private def withExtendedSession[A](f: SparkSession => A): A = {
    val shared = TestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("custom expressions are SQL-callable via SparkSessionExtensions") {
    withExtendedSession { s =>
      val r = s.sql(
        """SELECT iso_duration_micros('PT1H30M') AS mic,
          |       format_iso_duration(5400000000) AS iso,
          |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
          |       l2sq_distance(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS d2
          |""".stripMargin).collect().head
      assert(r.getLong(0) == 5400000000L)
      assert(r.getString(1) == "PT1H30M")
      assert(r.getDouble(2) == 11.0)
      assert(r.getDouble(3) == 25.0)
    }
  }

  test("malformed ISO input yields null through the SQL surface") {
    withExtendedSession { s =>
      assert(s.sql("SELECT iso_duration_micros('bogus')").collect().head.isNullAt(0))
    }
  }

  test("wrong-arity SQL calls get a usage message, not IndexOutOfBounds") {
    withExtendedSession { s =>
      val e = intercept[Exception] {
        s.sql("SELECT dot_product(array(1.0d))").collect()
      }
      // the arity gate's message (possibly wrapped by the analyzer) must
      // carry the usage hint — metadata-driven SQL needs to know WHICH
      // call was malformed
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("dot_product(a, b)")),
        s"expected the usage string in: ${messages(e).mkString(" | ")}")
      val z = intercept[Exception] {
        s.sql("SELECT iso_duration_micros()").collect()
      }
      assert(messages(z).exists(_.contains("expected 1 argument")))
    }
  }

  test("normalize_nfc composes decomposed sequences via SQL") {
    withExtendedSession { s =>
      val r = s.sql("SELECT length(normalize_nfc(concat('cafe', '́')))")
        .collect().head
      assert(r.getInt(0) == 4) // e + combining acute composed to one char
    }
  }
}
