package graft.mapper

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FlattenerSpec extends SparkSpec {

  /** Depth-3 ragged document: struct → array-of-struct → array-of-scalar,
    * plus a map column and a name collision (`id` inside the struct). */
  private lazy val nested = {
    val json = Seq(
      """{"id":1,"info":{"id":99,"country":"US"},
         "sponsors":[{"name":"acme","grants":[1,2]},{"name":"beta","grants":[]}],
         "tags":["x","y"],"attrs":{"k1":"v1"}}""".filter(_ != '\n'),
      """{"id":2,"info":{"id":98,"country":"DE"},
         "sponsors":[],"tags":[],"attrs":{}}""".filter(_ != '\n'))
    import spark.implicits._
    spark.read.json(json.toDS)
  }

  test("flatten emits one view per nesting level with xpaths") {
    val result = Flattener.flatten(nested, "study", cascadeKeys = Seq(("id", "pk_id")))
    assert(result.views.keySet == Set(
      "study", "study_attrs", "study_info", "study_sponsors",
      "study_sponsors_grants", "study_tags"))
    assert(result.xpaths.contains("/study/sponsors/grants"))
  }

  test("struct expansion resolves name collisions by prefixing") {
    val result = Flattener.flatten(nested, "study", cascadeKeys = Seq(("id", "pk_id")))
    val info = result.views("study_info")
    // info.id collides with nothing inherited (pk_id is aliased) → plain name
    assert(info.columns.contains("id") && info.columns.contains("country"))
    val got = rows(info.orderBy(col("pk_id")))
    assert(got.map(r => (r.getAs[Long]("pk_id"), r.getAs[Long]("id"))) ==
      Seq((1L, 99L), (2L, 98L)))
  }

  test("array-of-struct explodes with parent keys cascaded") {
    val result = Flattener.flatten(nested, "study", cascadeKeys = Seq(("id", "pk_id")))
    val sponsors = rows(result.views("study_sponsors").orderBy(col("name")))
    assert(sponsors.map(r => (r.getAs[Long]("pk_id"), r.getAs[String]("name"))) ==
      Seq((1L, "acme"), (1L, "beta")))
  }

  test("deep array-of-scalar reaches level 3 with all ancestors' keys") {
    val result = Flattener.flatten(nested, "study", cascadeKeys = Seq(("id", "pk_id")))
    val grants = result.views("study_sponsors_grants")
    assert(grants.columns.contains("pk_id"))
    assert(grants.columns.contains("surrogate_id_study_sponsors"))
    assert(rows(grants).map(_.getAs[Long]("value")).sorted == Seq(1L, 2L))
  }

  test("map columns explode to key/value rows") {
    // JSON inference yields structs, so build a real MapType column directly.
    val mdf = spark.range(2).select(col("id"),
      map(lit("k"), concat(lit("v"), col("id"))).as("attrs"))
    val result = Flattener.flatten(mdf, "m", cascadeKeys = Seq(("id", "pk_id")))
    val attrs = rows(result.views("m_attrs").orderBy(col("value")))
    assert(attrs.map(r => (r.getAs[String]("key"), r.getAs[String]("value"))) ==
      Seq(("k", "v0"), ("k", "v1")))
  }

  test("parent-child surrogate join reconstructs the relationship") {
    val result = Flattener.flatten(nested, "study")
    Flattener.registerViews(result)
    val joined = spark.sql(
      """SELECT s.id, sp.name FROM study s
        |JOIN study_sponsors sp ON s.surrogate_id_study = sp.surrogate_id_study
        |ORDER BY sp.name""".stripMargin)
    assert(rows(joined).map(r => (r.getLong(0), r.getString(1))) ==
      Seq((1L, "acme"), (1L, "beta")))
  }

  test("flatten refuses colliding view names instead of silently losing a table") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // struct `a` holding STRUCT field `b` yields view root_a_b, and the
    // sibling struct literally named `a_b` yields root_a_b too; the old
    // LinkedHashMap overwrite silently dropped one child table.
    val df = Seq((1L, 2L, 3L)).toDF("x", "y", "z")
      .select(col("x"),
        struct(struct(col("y").as("yy")).as("b")).as("a"),
        struct(col("z").as("c")).as("a_b"))
    val e = intercept[IllegalArgumentException] {
      Flattener.flatten(df, "root")
    }
    assert(e.getMessage.contains("root_a_b"))
  }

  test("flatten: the natural same-name cascade rides along; shadowing is refused") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "x")).toDF("id", "v")
      .select(col("id"), col("v"), struct(col("v").as("w")).as("s"))
    // ("id","id"): alias == existing column == path — legal, no duplicate
    val res = Flattener.flatten(df, "root", Seq(("id", "id")))
    val child = res.views("root_s")
    assert(child.columns.count(_ == "id") == 1)
    assert(child.select("id").collect().head.getLong(0) == 1L)
    // alias shadowing a DIFFERENT column is refused loudly
    val e = intercept[IllegalArgumentException] {
      Flattener.flatten(df, "root", Seq(("s.w", "v")))
    }
    assert(e.getMessage.contains("cascade alias"))
  }

  test("flatten refuses a post-prefix sibling collision loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the literal sibling `s_x` claims its name first; the inherited key
    // `x` then forces struct field `x` to prefix to `s_x` — a collision
    // that was previously a silent duplicate column exploding later as
    // AMBIGUOUS_REFERENCE. (In the other field order the resolver
    // double-prefixes the literal to `s_s_x` and proceeds — only a true
    // dead end is refused.)
    val df = Seq((1L, 2L, 3L)).toDF("x", "a", "b")
      .select(struct(col("b").as("s_x"), col("a").as("x")).as("s"))
      .withColumn("x", lit(9L))
    val e = intercept[IllegalArgumentException] {
      Flattener.flatten(df, "root", Seq(("x", "x")))
    }
    assert(e.getMessage.contains("collides"))
  }

  test("withZipIndexKey prepends dense deterministic keys") {
    val df = graft.core.Tables.load(spark, sf, "region")
    val keyed = Flattener.withZipIndexKey(df, "sk", offset = 100)
    assert(keyed.columns.head == "sk")
    val ks = rows(keyed).map(_.getAs[Long]("sk")).sorted
    assert(ks == (100L until (100L + df.count())).toSeq)
  }
}
