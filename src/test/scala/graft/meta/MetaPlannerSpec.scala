package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.meta.Model._

/** End-to-end metadata-driven ETL over regenerated FIXTURES.md §2-4 fixtures:
  * star-schema CSVs with whitespace dirt, a meta.csv mapping, and a
  * datamodel.csv FK graph with mixed LEFT/INNER joins (storeid 1004 is
  * absent from store.csv to pin the join semantics).
  */
class MetaPlannerSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-meta").toString
    def write(name: String, content: String): Unit =
      Files.writeString(java.nio.file.Paths.get(s"$d/$name"), content)
    write("product.csv",
      """id,name,price
        |1,Apple ,10
        |2, Banana,5
        |3,Cherry,50
        |""".stripMargin)
    write("store.csv",
      """id,name
        |1001,Mumbai
        |1002,Pune
        |""".stripMargin)
    write("purchase.csv",
      """id,productid,purchasedate,storeid
        |10,1,1/5/2024,1001
        |11,1,2/6/2024,1002
        |12,2,,1001
        |13,2,3/7/2024,1004
        |14,9,4/8/2024,1001
        |""".stripMargin)
    write("meta.csv",
      """src_table,src_filetype,src_file_path,src_col,src_col_datatype,key_constraints,src_col_filter,src_col_aggregator,src_col_aggregator_filter,udf,udfarguments,src_table_order,target_table,target_col,target_col_datatype
        |purchase,csv,DIR/purchase.csv,id,int,pk,,,,,,1,invoice,purchase_id,int
        |purchase,csv,DIR/purchase.csv,purchasedate,string,,,,,nvl,1/1/1900,1,invoice,purchase_date,string
        |product,csv,DIR/product.csv,name,string,,,,,trim,,2,invoice,product_name,string
        |product,csv,DIR/product.csv,price,int,,,,,,,2,invoice,price,int
        |store,csv,DIR/store.csv,name,string,,,,,,,3,invoice,store_name,string
        |purchase,csv,DIR/purchase.csv,storeid,int,,,,,,,1,salesummary,store_id,int
        |purchase,csv,DIR/purchase.csv,id,int,,,count,,,,1,salesummary,totalsolditems,bigint
        |""".stripMargin.replace("DIR", d))
    write("datamodel.csv",
      """table,pk,fk_table,fk_col,fk_table_jointype
        |product,id,purchase,productid,LEFT
        |store,id,purchase,storeid,INNER
        |purchase,id,,,
        |""".stripMargin)
    d
  }

  test("predicate mini-language parses every operator") {
    import spark.implicits._
    val df = Seq(("R", 5), ("N", 45), ("A", 60)).toDF("flag", "qty")
    def count(c: String, spec: String): Long =
      df.filter(Model.parsePredicate(col(c), spec)).count()
    assert(count("flag", "eq('R')") == 1)
    assert(count("flag", "ne('R')") == 2)
    assert(count("qty", "gt(45)") == 1)
    assert(count("qty", "gte(45)") == 2)
    assert(count("qty", "lt(45)") == 1)
    assert(count("qty", "lte(45)") == 2)
    assert(count("flag", "in('R';'N')") == 2)
    assert(count("flag", "notin('R';'N')") == 1)
    assert(count("flag", "like('%R%')") == 1)
    assert(count("qty", "between(5;45)") == 2)
    intercept[IllegalArgumentException](Model.parsePredicate(col("qty"), "frob(1)"))
  }

  test("datamodel.csv loads into the FK graph with BFS join order") {
    val model = Model.loadDataModel(spark, s"$dir/datamodel.csv")
    assert(model("purchase").parents.keySet == Set("product", "store"))
    assert(model("purchase").parents("product") ==
      FkEdge(Seq("productid"), Seq("id"), "left"))
    assert(model("purchase").parents("store").joinType == "inner")
    assert(Model.joinOrder(model, "purchase") == Seq("purchase", "product", "store"))
  }

  test("transformAll: LEFT keeps missing product, INNER drops store 1004") {
    val out = Planner.transformAll(spark, s"$dir/meta.csv", s"$dir/datamodel.csv")
    val invoice = rows(out("invoice").orderBy(col("purchase_id")))
    // purchase 13 (store 1004) dropped by INNER; 14 (product 9) kept by LEFT
    assert(invoice.map(_.getAs[Int]("purchase_id")) == Seq(10, 11, 12, 14))
    val p14 = invoice.find(_.getAs[Int]("purchase_id") == 14).get
    assert(p14.getAs[String]("product_name") == null)
    // udf nvl: empty purchasedate → default
    val p12 = invoice.find(_.getAs[Int]("purchase_id") == 12).get
    assert(p12.getAs[String]("purchase_date") == "1/1/1900")
    // udf trim applied to product name
    assert(invoice.head.getAs[String]("product_name") == "Apple")

    val summary = rows(out("salesummary").orderBy(col("store_id")))
    assert(summary.map(r => (r.getAs[Int]("store_id"), r.getAs[Long]("totalsolditems"))) ==
      Seq((1001, 3L), (1002, 1L), (1004, 1L)))
  }

  test("fact table appearing only as fk_table still gets its edges") {
    // No standalone `purchase,...` row: purchase exists only as fk_table.
    // Pre-fix, loadDataModel built nodes from the `table` column alone, so
    // purchase had no node, its edges were dropped, and the invoice target
    // silently lost every parent column — wrong data, no error.
    val d = java.nio.file.Files.createTempDirectory("graft-meta-fkonly").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/datamodel.csv"),
      """table,pk,fk_table,fk_col,fk_table_jointype
        |product,id,purchase,productid,LEFT
        |store,id,purchase,storeid,INNER
        |""".stripMargin)
    val model = Model.loadDataModel(spark, s"$d/datamodel.csv")
    assert(model.contains("purchase"), "child-only table must get a node")
    assert(model("purchase").parents.keySet == Set("product", "store"))
    assert(Model.joinOrder(model, "purchase") == Seq("purchase", "product", "store"))
    // End-to-end: same invoice rows as with the standalone purchase row.
    val out = Planner.transformAll(spark, s"$dir/meta.csv", s"$d/datamodel.csv")
    val invoice = rows(out("invoice").orderBy(col("purchase_id")))
    assert(invoice.map(_.getAs[Int]("purchase_id")) == Seq(10, 11, 12, 14))
    assert(invoice.head.getAs[String]("product_name") == "Apple")
  }

  test("datamodel metadata bugs are refused loudly, never silently truncated") {
    def write(body: String): String = {
      val d = java.nio.file.Files.createTempDirectory("graft-meta-bad").toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$d/datamodel.csv"),
        "table,pk,fk_table,fk_col,fk_table_jointype\n" + body)
      s"$d/datamodel.csv"
    }
    // composite pk vs single fk col: zip would DROP the unmatched key and
    // under-constrain the join (silent fan-out duplicates)
    val e1 = intercept[IllegalArgumentException] {
      Model.loadDataModel(spark,
        write("orders,o_orderkey|o_custkey,lineitem,l_orderkey,LEFT\n"))
    }
    assert(e1.getMessage.contains("mismatched"))
    // a duplicate table row with a BLANK pk must not erase the declared
    // key (toMap later-wins did); the blank row defers
    val ok = Model.loadDataModel(spark,
      write("product,id,purchase,productid,LEFT\nproduct,,returns,productid,LEFT\n"))
    assert(ok("purchase").parents("product").parentPk == Seq("id"))
    assert(ok("returns").parents("product").parentPk == Seq("id"))
    // two DIFFERENT declared pks are a metadata bug, named by table
    val e2 = intercept[IllegalArgumentException] {
      Model.loadDataModel(spark,
        write("product,id,purchase,productid,LEFT\nproduct,code,returns,productid,LEFT\n"))
    }
    assert(e2.getMessage.contains("conflicting"))
  }

  test("predicate parser refuses unbalanced quotes and wrong arity loudly") {
    import spark.implicits._
    val c = col("v")
    // missing closing quote swallowed every later ';' into one token and
    // the IN matched nothing — silent row loss
    val e1 = intercept[IllegalArgumentException] {
      Model.parsePredicate(c, "in('a;'b')")
    }
    assert(e1.getMessage.contains("unbalanced"))
    val e2 = intercept[IllegalArgumentException] {
      Model.parsePredicate(c, "between(5)")
    }
    assert(e2.getMessage.contains("2 arguments"))
  }

  test("conflicting source bindings for one src_table are refused") {
    // same src_table declared with two different paths: binding rows.head
    // silently read target B's data from target A's path
    val d = java.nio.file.Files.createTempDirectory("graft-meta-conflict").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/meta.csv"),
      """src_table,src_filetype,src_file_path,src_col,src_col_datatype,target_table,target_col
        |sales,csv,/data/2024,qty,int,t1,qty
        |sales,csv,/data/2025,qty,int,t2,qty
        |""".stripMargin)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/datamodel.csv"),
      "table,pk,fk_table,fk_col,fk_table_jointype\n")
    val e = intercept[IllegalArgumentException] {
      Planner.transformAll(spark, s"$d/meta.csv", s"$d/datamodel.csv")
    }
    assert(e.getMessage.contains("conflicting"))
  }

  test("an unmapped model ancestor neither crashes the fold nor demands its fk column") {
    // category is a declared parent of product, but no target maps it and
    // product.csv carries no categoryid column. Pre-fix, joinAll folded
    // over the full BFS order and crashed on tables("category"); and the
    // key projection demanded product.categoryid, failing analysis.
    val d = java.nio.file.Files.createTempDirectory("graft-meta-anc").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/datamodel.csv"),
      """table,pk,fk_table,fk_col,fk_table_jointype
        |product,id,purchase,productid,LEFT
        |store,id,purchase,storeid,INNER
        |category,id,product,categoryid,LEFT
        |purchase,id,,,
        |""".stripMargin)
    val out = Planner.transformAll(spark, s"$dir/meta.csv", s"$d/datamodel.csv")
    val invoice = rows(out("invoice").orderBy(col("purchase_id")))
    assert(invoice.map(_.getAs[Int]("purchase_id")) == Seq(10, 11, 12, 14))
  }

  test("predicate args split respects quoted semicolons") {
    import spark.implicits._
    val df = Seq("a;b", "c", "a", "b'").toDF("v")
    val got = rows(df.filter(Model.parsePredicate(col("v"), "in('a;b';'c')")))
      .map(_.getString(0)).sorted
    assert(got == Seq("a;b", "c"), s"quoted ';' must not split: $got")
  }

  test("aggregate honors HAVING via aggregatorFilter") {
    val meta = Seq(
      MetaResult("purchase", "csv", s"$dir/purchase.csv", "storeid", "int", None,
        None, None, None, None, Nil, 1, "s", "store_id", "int"),
      MetaResult("purchase", "csv", s"$dir/purchase.csv", "id", "int", None,
        None, Some("count"), Some("gt(1)"), None, Nil, 1, "s", "n", "bigint"))
    val catalog = Catalog(meta, Map("purchase" -> TableNode("purchase", Seq("id"), Map.empty)))
    val src = Map("purchase" -> Planner.bindSource(spark, meta.head))
    val got = rows(Planner.transform(src, catalog, "s"))
    assert(got.map(_.getAs[Int]("store_id")).toSet == Set(1001))
  }

  test("DDL generation from metadata and from schema") {
    val catalog = Catalog(Model.loadMeta(spark, s"$dir/meta.csv"),
      Model.loadDataModel(spark, s"$dir/datamodel.csv"))
    val ddl = Planner.targetDdl(catalog, "invoice", "dw", external = true,
      location = Some("/data/invoice"))
    assert(ddl.contains("CREATE EXTERNAL TABLE IF NOT EXISTS dw.invoice"))
    assert(ddl.contains("purchase_id int"))
    assert(ddl.contains("LOCATION '/data/invoice'"))
    val sDdl = Planner.schemaDdl(graft.core.Tables.load(spark, sf, "nation"), "dw", "nation")
    assert(sDdl.contains("n_nationkey int"))
  }
}
