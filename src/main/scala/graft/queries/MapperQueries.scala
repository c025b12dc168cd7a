package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.mapper.Flattener

/** Flattener exercised through the oracle gate. Nested inputs are built
  * deterministically from the flat TPC-H tables (collect_list of structs /
  * from_json), flattened, and the child views — minus run-scoped surrogate
  * ids — must reproduce the original relations exactly.
  */
object MapperQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Array-of-struct path (LATERAL VIEW INLINE equivalent): nest orders
    // under customer keys, flatten back, expect the original rows.
    "q34_flatten_inline" -> ((s, dir) => {
      val nested = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(collect_list(struct(col("o_orderkey"), col("o_totalprice")))
          .as("order_items"))
      val result = Flattener.flatten(nested, "cust",
        cascadeKeys = Seq(("o_custkey", "pk_custkey")))
      result.views("cust_order_items")
        .select(col("pk_custkey"), col("o_orderkey"), col("o_totalprice"))
    }),

    // Struct path over parsed JSON (events.props) with cascade key.
    "q35_flatten_struct" -> ((s, dir) => {
      val parsed = Tables.load(s, dir, "events")
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .as("props_struct"))
      val result = Flattener.flatten(parsed, "events",
        cascadeKeys = Seq(("event_id", "pk_event_id")))
      result.views("events_props_struct").select(col("pk_event_id"), col("k"))
    }),

    // Array-of-scalar path: explode a split word list, expect wordcount
    // parity with the raw text.
    "q36_flatten_explode" -> ((s, dir) => {
      val withArr = Tables.load(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), "\\s+").as("words"))
      val result = Flattener.flatten(withArr, "docs",
        cascadeKeys = Seq(("doc_id", "pk_doc_id")))
      // Left-join the counts back onto the document list: the oracle
      // emits n_words = 0 for a zero-token document, but a groupBy over
      // the filtered exploded rows emits NO row for it — the aggregate
      // must not silently drop empty docs (the same edge q21 defends
      // with try_divide).
      val counts = result.views("docs_words")
        .filter(col("value") =!= "")
        .groupBy(col("pk_doc_id")).agg(count(lit(1)).as("n_cnt"))
      withArr.select(col("doc_id").as("pk_doc_id"))
        .join(counts, Seq("pk_doc_id"), "left")
        .select(col("pk_doc_id"), coalesce(col("n_cnt"), lit(0L)).as("n_words"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q34_flatten_inline" ->
      """SELECT o_custkey AS pk_custkey, o_orderkey, o_totalprice FROM orders""",

    "q35_flatten_struct" ->
      """SELECT event_id AS pk_event_id,
        | CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events""".stripMargin,

    "q36_flatten_explode" ->
      """SELECT doc_id AS pk_doc_id,
        | len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS n_words
        |FROM documents""".stripMargin
  )
}
