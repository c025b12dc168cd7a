package graft.meta

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The metadata model driving the declarative ETL planner — the engine's
  * "catalog". Re-expresses the reference's `MetaResult`/`datamodel` dicts
  * (reference: src/com/vitthalmirji/etl/meta/MetaModel.py:13-75, 277-296) as
  * typed case classes loaded from the same CSV shapes (FIXTURES.md §3-4).
  */
object Model {

  /** One row of meta.csv: a (source column → target column) mapping with
    * optional filter / udf / aggregator. */
  final case class MetaResult(
      srcTable: String,
      srcFiletype: String,
      srcFilePath: String,
      srcCol: String,
      srcColDatatype: String,
      keyConstraint: Option[String],     // "pk" marks primary-key columns
      srcColFilter: Option[String],      // predicate mini-language, e.g. eq('R')
      srcColAggregator: Option[String],  // min|max|count|sum|avg
      aggregatorFilter: Option[String],  // HAVING predicate on the aggregate
      udf: Option[String],
      udfArguments: Seq[String],         // '|'-separated in CSV
      srcTableOrder: Int,
      targetTable: String,
      targetCol: String,
      targetColDatatype: String)

  /** FK edge: child's columns → parent's pk columns, with join type. */
  final case class FkEdge(childCols: Seq[String], parentPk: Seq[String],
                          joinType: String)

  /** Node in the data-model graph: pk + edges to parent tables. */
  final case class TableNode(table: String, pk: Seq[String],
                             parents: Map[String, FkEdge])

  final case class Catalog(meta: Seq[MetaResult], model: Map[String, TableNode]) {
    def forTarget(t: String): Seq[MetaResult] = meta.filter(_.targetTable == t)
    def targetTables: Seq[String] = meta.map(_.targetTable).distinct
  }

  /** Extended lexical type map (reference: CColumn.py:17-30 — plus decimal /
    * interval / map, which the reference lacks; SURVEY.md §1.2). Any other
    * name falls through to `DataType.fromDDL` (so `decimal(18,2)`,
    * `array<string>`, `map<string,int>` all work). */
  def toDataType(name: String): DataType = name.trim.toLowerCase match {
    case "tinyint" | "smallint" | "int" | "integer" => IntegerType
    case "bigint" | "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "boolean" => BooleanType
    case "string" => StringType
    case "date" => DateType
    case "timestamp" => TimestampType
    case "binary" => BinaryType
    case other => DataType.fromDDL(other)
  }

  // ---- predicate mini-language ------------------------------------------

  private val PredRe = """(?i)\s*(eq|ne|gt|lt|gte|lte|in|notin|like|between)\s*\((.*)\)\s*""".r

  private def lex(raw: String): Any = {
    val s = raw.trim
    if (s.startsWith("'") && s.endsWith("'") && s.length >= 2) s.substring(1, s.length - 1)
    else if (s.matches("[+-]?\\d+")) s.toLong
    else if (s.matches("[+-]?\\d*\\.\\d+")) s.toDouble
    else s
  }

  /** Argument split on `;` that respects single-quoted values: a naive
    * split turned `in('a;b';'c')` into the wrong literals `'a` / `b'` /
    * `'c'` (the first two then failed lex's quote-strip and matched raw
    * quote-bearing strings) — silent mis-filtering, no error. */
  private def splitArgs(args: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    args.foreach {
      case '\'' => inQ = !inQ; sb.append('\'')
      case ';' if !inQ => out += sb.toString; sb.clear()
      case ch => sb.append(ch)
    }
    out += sb.toString
    require(!inQ,
      s"unbalanced quote in argument list '$args' — a missing closing " +
        "quote would swallow every later ';' separator into one token " +
        "and silently mis-filter")
    out.toSeq
  }

  /** Parse the reference's predicate mini-language into a Column predicate —
    * ONE canonical parser (the reference has two diverging copies,
    * ITable.py:40-66 vs MetaModel.py:324-346; SURVEY.md §7.4).
    * `eq('R')`→ `=`, `in('a';'b')` → IN, `between(1;9)` → BETWEEN, etc.
    */
  def parsePredicate(c: Column, spec: String): Column = spec match {
    case PredRe(op, args) =>
      val vals = splitArgs(args).map(lex)
      require(vals.nonEmpty, s"predicate '$spec' has no arguments")
      op.toLowerCase match {
        case "eq" => c === lit(vals.head)
        case "ne" => c =!= lit(vals.head)
        case "gt" => c > lit(vals.head)
        case "lt" => c < lit(vals.head)
        case "gte" => c >= lit(vals.head)
        case "lte" => c <= lit(vals.head)
        case "in" => c.isin(vals: _*)
        case "notin" => !c.isin(vals: _*)
        case "like" => c.like(vals.head.toString)
        case "between" =>
          require(vals.length == 2,
            s"between() needs exactly 2 arguments, got ${vals.length} in '$spec'")
          c.between(lit(vals.head), lit(vals(1)))
      }
    case other =>
      throw new IllegalArgumentException(s"Unparseable predicate: '$other'")
  }

  // ---- CSV codecs --------------------------------------------------------

  private def opt(s: String): Option[String] =
    Option(s).map(_.trim).filter(_.nonEmpty)

  /** Load meta.csv (header row; column names per FIXTURES.md §3). Small by
    * construction (it's metadata) — collected to the driver, which is where
    * plan construction happens anyway. */
  def loadMeta(spark: SparkSession, path: String): Seq[MetaResult] = {
    val df = spark.read.option("header", "true").csv(path)
    df.collect().toSeq.map { r =>
      def g(n: String): String =
        if (df.columns.contains(n)) Option(r.getAs[String](n)).map(_.trim).orNull else null
      val m = MetaResult(
        srcTable = g("src_table"),
        srcFiletype = Option(g("src_filetype")).getOrElse("parquet"),
        srcFilePath = g("src_file_path"),
        srcCol = g("src_col"),
        srcColDatatype = Option(g("src_col_datatype")).getOrElse("string"),
        keyConstraint = opt(g("key_constraints")),
        srcColFilter = opt(g("src_col_filter")),
        srcColAggregator = opt(g("src_col_aggregator")),
        aggregatorFilter = opt(g("src_col_aggregator_filter")),
        udf = opt(g("udf")),
        udfArguments = opt(g("udfarguments")).map(_.split("\\|").toSeq).getOrElse(Nil),
        srcTableOrder = Option(g("src_table_order")).map(_.toInt).getOrElse(0),
        targetTable = g("target_table"),
        targetCol = g("target_col"),
        targetColDatatype = Option(g("target_col_datatype")).getOrElse("string"))
      validate(m)
      m
    }
  }

  /** Required-field validation (reference: MetaModel.py:184-205). */
  def validate(m: MetaResult): Unit = {
    def req(v: String, field: String): Unit =
      require(v != null && v.nonEmpty, s"meta.csv row missing required field '$field': $m")
    req(m.srcTable, "src_table"); req(m.srcCol, "src_col")
    req(m.targetTable, "target_table"); req(m.targetCol, "target_col")
    m.srcColAggregator.foreach(a => require(
      Set("min", "max", "count", "sum", "avg").contains(a.toLowerCase),
      s"Unknown aggregator '$a' for $m"))
  }

  /** Load datamodel.csv: `table, pk ('|'-sep), fk_table, fk_col (';'-sep),
    * fk_table_jointype`. Row `product,id,purchase,productid,LEFT` reads:
    * `purchase.productid` references `product.id`, joined LEFT. */
  def loadDataModel(spark: SparkSession, path: String): Map[String, TableNode] = {
    val rows = spark.read.option("header", "true").csv(path).collect().toSeq
    // One pk per table, declared once: toMap's later-wins let a duplicate
    // table row with a BLANK pk silently erase the declared key for every
    // edge of that parent (the join synthesis then built an empty
    // condition). Blank rows defer to a declared pk; two DIFFERENT
    // declared pks are a metadata bug, reported with the table name.
    val pks: Map[String, Seq[String]] = rows
      .map { r =>
        r.getAs[String]("table").trim ->
          Option(r.getAs[String]("pk")).map(_.trim).filter(_.nonEmpty)
            .map(_.split("\\|").toSeq).getOrElse(Nil)
      }
      .groupBy(_._1)
      .map { case (t, declared) =>
        val distinct = declared.map(_._2).filter(_.nonEmpty).distinct
        require(distinct.size <= 1,
          s"datamodel: table '$t' declares conflicting primary keys " +
            s"${distinct.map(_.mkString("|")).mkString(" vs ")}")
        t -> distinct.headOption.getOrElse(Nil)
      }
    val edges: Seq[(String, String, FkEdge)] = rows.flatMap { r =>
      val parent = r.getAs[String]("table").trim
      for {
        child <- opt(r.getAs[String]("fk_table"))
        fkCols <- opt(r.getAs[String]("fk_col")).map(_.split(";").map(_.trim).toSeq)
      } yield {
        // zip would silently DROP the unmatched key columns of a
        // composite-key mismatch, under-constraining the join (fan-out
        // duplicates with no error) — refuse at load with the row.
        require(fkCols.length == pks(parent).length && pks(parent).nonEmpty,
          s"datamodel: fk '$child'(${fkCols.mkString(";")}) references " +
            s"'$parent' pk (${pks(parent).mkString("|")}) with mismatched " +
            "column count — the join condition would be silently truncated")
        (child, parent, FkEdge(fkCols, pks(parent),
          opt(r.getAs[String]("fk_table_jointype")).getOrElse("LEFT").toLowerCase))
      }
    }
    // Nodes for EVERY table the csv mentions — including tables that only
    // appear as fk_table (a pure fact table with no standalone pk row).
    // Building nodes from pks.keys alone dropped such a table's edges
    // entirely: joinOrder never discovered its parents and the target was
    // emitted with the parents' columns silently missing.
    val allTables = pks.keySet ++ edges.map(_._1)
    allTables.map { t =>
      val es = edges.collect { case (c, p, e) if c == t => p -> e }
      // One FK edge per (child, parent): the join synthesis (joinOrder /
      // joinAll) joins each parent table exactly once, so a role-playing
      // dimension referenced through two different FKs (buyer_id AND
      // seller_id -> customer) cannot be expressed — and letting toMap
      // keep whichever edge came last would silently resolve one of the
      // roles through the WRONG key. Fail with the table pair instead;
      // the workaround is the reference's own: register the parent twice
      // under aliased table names.
      val dup = es.groupBy(_._1).collect { case (p, more) if more.size > 1 => p }
      require(dup.isEmpty,
        s"datamodel: table '$t' references parent(s) ${dup.mkString(", ")} " +
          "through multiple foreign keys — alias the parent per role " +
          "(one edge per child/parent pair is supported)")
      t -> TableNode(t, pks.getOrElse(t, Nil), es.toMap)
    }.toMap
  }

  /** BFS over the parent graph from the main (fact) table — the topological
    * join order (reference: MetaModel.py:457-468). Parents joined in
    * discovery order; each appears once. */
  def joinOrder(model: Map[String, TableNode], mainTable: String): Seq[String] = {
    val visited = scala.collection.mutable.LinkedHashSet(mainTable)
    var frontier = Seq(mainTable)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(t => model.get(t).toSeq.flatMap(_.parents.keys))
        .filterNot(visited.contains)
      next.foreach(visited.add)
      frontier = next
    }
    visited.toSeq
  }
}
