package graft.meta

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ColumnOps
import graft.meta.Model._
import graft.sources.DataReader

/** The metadata-driven ETL planner: `Catalog => DataFrame`.
  *
  * This is the engine's equivalent of the reference's two-stage "compile"
  * (CSV metadata → SQL strings → Spark; reference:
  * src/com/vitthalmirji/etl/ETLTransform.py:99-143, MetaModel.py:129-182)
  * — except there is no SQL-string stage at all: metadata goes straight to
  * Catalyst plan construction, so filters/pruning/join-strategy all come from
  * the optimizer, and errors surface at analysis time with column-level
  * context instead of failing inside generated SQL text.
  *
  * Pipeline per target table:
  *   1. bind each distinct source table (reader by filetype),
  *   2. per-table: filter (pushed to scan) → cast/udf/alias projection,
  *   3. fold parent joins in BFS order from the main (fact) table,
  *   4. optional group-by (non-aggregated cols) + aggregates + HAVING.
  */
object Planner {

  /** UDF registry: name → (input column, args) => Column. All built-in
    * compositions (no real UDFs) — reference: etl/ETL.py:13-87. */
  val udfRegistry: Map[String, (Column, Seq[String]) => Column] = Map(
    "nvl" -> ((c, args) => ColumnOps.nvl(c, args.headOption.getOrElse("-"))),
    "isnullorempty" -> ((c, _) => ColumnOps.nullIfBlank(c)),
    "datetimetogmt" -> ((c, args) =>
      ColumnOps.datetimeToGmt(c, args.headOption.getOrElse("yyyy-MM-dd HH:mm:ss"))),
    "zonedatetimetogmt" -> ((c, args) => {
      require(args.length >= 2,
        s"zonedatetimetogmt needs (format, zone) arguments, got " +
          s"${args.length} (${args.mkString(";")}) — check udfarguments " +
          "in meta.csv")
      ColumnOps.datetimeToGmt(c, args.head, args(1))
    }),
    "squared" -> ((c, _) => pow(c, 2)),
    "upper" -> ((c, _) => upper(c)),
    "lower" -> ((c, _) => lower(c)),
    "trim" -> ((c, _) => trim(c)),
    "singlespace" -> ((c, _) => ColumnOps.singleSpace(c)))

  private val aggRegistry: Map[String, Column => Column] = Map(
    "min" -> min, "max" -> max, "sum" -> sum, "avg" -> avg,
    "count" -> (c => count(c)))

  /** Read one source table (reference: HdfsImport.py:26-56). `filetype`
    * `table` reads a catalog table; everything else goes through the path. */
  def bindSource(spark: SparkSession, m: MetaResult): DataFrame =
    DataReader.read(spark, graft.sources.FileType.fromString(m.srcFiletype),
      m.srcFilePath)

  /** UDFs whose null-defaulting must run AFTER the join fold: for LEFT-joined
    * parent tables an unmatched row yields NULL in the target column, and the
    * intended (oracle) semantics are post-join COALESCE — applying them here
    * would leave those NULLs undefaulted. [[transform]] re-applies them after
    * [[joinAll]]. */
  val postJoinUdfs: Set[String] = Set("nvl")

  /** Compile one source table's projection (the cast-project compiler —
    * reference: CColumn.py:32-52, ITable.py:125-145): combined filter
    * first (so it pushes into the scan), then per-column
    * `cast(udf(col)) as target_col`, PLUS this table's join-key columns
    * (pk + fk cols) aliased `__key_<table>_<col>` so the join fold can
    * still see them without colliding with target columns; they're
    * dropped after the joins. (A keyless variant existed through
    * round 11 but had no callers and a comment claiming keys survived —
    * they didn't; this is the one projection path.) */
  def projectWithKeys(df: DataFrame, table: String, rows: Seq[MetaResult],
                      model: Map[String, TableNode],
                      mappedTables: Set[String]): DataFrame = {
    val filters = rows.flatMap(m => m.srcColFilter.map(f =>
      parsePredicate(col(m.srcCol), f)))
    val filtered = filters.foldLeft(df)((d, p) => d.filter(p))
    val targetCols = rows.map { m =>
      val base = col(m.srcCol)
      val withUdf = m.udf.filterNot(u => postJoinUdfs(u.toLowerCase)).map { u =>
        udfRegistry.getOrElse(u.toLowerCase,
          throw new IllegalArgumentException(s"Unknown udf '$u'"))(base, m.udfArguments)
      }.getOrElse(base)
      withUdf.cast(toDataType(m.targetColDatatype)).as(m.targetCol)
    }
    val keyCols = keyColumnsOf(table, model, mappedTables).map(c =>
      col(c).as(s"__key_${table}_$c"))
    filtered.select(targetCols ++ keyCols: _*)
  }

  /** pk columns + the fk columns this table uses to reach parents THAT THE
    * TARGET MAPS (`mappedTables`): the join fold only traverses edges
    * among mapped tables, and demanding an fk column for an unmapped
    * model ancestor would fail analysis on sources that don't carry it —
    * valid metadata, never-used edge. */
  def keyColumnsOf(table: String, model: Map[String, TableNode],
                   mappedTables: Set[String]): Seq[String] =
    model.get(table).map { n =>
      (n.pk ++ n.parents.collect {
        case (p, e) if mappedTables(p) => e.childCols
      }.flatten).distinct
    }.getOrElse(Nil)

  /** Fold the BFS join order into one DataFrame plan (reference J1/J2:
    * MetaModel.py:129-182 + ETLTransform.py:53-62). Join condition per edge:
    * child.__key_child_fkCol = parent.__key_parent_pkCol (multi-column keys
    * zip pairwise). Catalyst/AQE then picks broadcast vs shuffle per side —
    * the reference could only ever emit SQL text and hope. */
  def joinAll(tables: Map[String, DataFrame], model: Map[String, TableNode],
              mainTable: String): DataFrame = {
    // Restrict the BFS order to tables THIS target actually maps: the
    // datamodel graph may declare further ancestors (valid metadata), and
    // folding over an unmapped one both crashed on the tables() lookup
    // and would have joined a table contributing no output columns. A
    // mapped table reachable only through unmapped ones still fails
    // loudly below ("No FK edge"), which is the right behavior.
    val order = joinOrder(model, mainTable).filter(tables.contains)
    val joined = order.tail.foldLeft(tables(mainTable)) { (acc, parent) =>
      // Find the already-joined child that references this parent.
      val (child, edge) = order.take(order.indexOf(parent))
        .flatMap(t => model(t).parents.get(parent).map(t -> _))
        .headOption
        .getOrElse(throw new IllegalArgumentException(
          s"No FK edge from joined tables to '$parent'"))
      val cond = edge.childCols.zip(edge.parentPk).map { case (fk, pk) =>
        col(s"__key_${child}_$fk") === col(s"__key_${parent}_$pk")
      }.reduce(_ && _)
      acc.join(tables(parent), cond, edge.joinType)
    }
    joined.drop(joined.columns.filter(_.startsWith("__key_")): _*)
  }

  /** Group/aggregate stage with HAVING (reference A2/A3: ETLTransform.py:
    * 83-97 — half-built there; this implements the intended semantics,
    * SURVEY.md §7.4). Group keys = non-aggregated target columns; each
    * aggregated column applies its function and keeps its alias; HAVING
    * predicates apply post-aggregation. */
  def aggregate(df: DataFrame, rows: Seq[MetaResult]): DataFrame = {
    val (aggRows, keyRows) = rows.partition(_.srcColAggregator.isDefined)
    if (aggRows.isEmpty) df
    else {
      val keys = keyRows.map(m => col(m.targetCol))
      val aggs = aggRows.map { m =>
        val f = aggRegistry(m.srcColAggregator.get.toLowerCase)
        f(col(m.targetCol)).cast(toDataType(m.targetColDatatype)).as(m.targetCol)
      }
      val grouped = df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
      val having = aggRows.flatMap(m =>
        m.aggregatorFilter.map(f => parsePredicate(col(m.targetCol), f)))
      having.foldLeft(grouped)((d, p) => d.filter(p))
    }
  }

  /** Full pipeline for one target table from pre-bound source DataFrames
    * (keyed by source table name). The fact table is the one with the
    * highest `src_table_order`... no — the reference orders by
    * `src_table_order` ascending and mains the FIRST (MetaModel.py:102-103);
    * we follow that. */
  def transform(sources: Map[String, DataFrame], catalog: Catalog,
                targetTable: String): DataFrame = {
    val rows = catalog.forTarget(targetTable)
    require(rows.nonEmpty, s"No metadata rows for target table '$targetTable'")
    val byTable = rows.groupBy(_.srcTable)
    val mainTable = rows.minBy(_.srcTableOrder).srcTable
    val projected = byTable.map { case (tbl, tblRows) =>
      tbl -> projectWithKeys(sources(tbl), tbl, tblRows, catalog.model,
        byTable.keySet)
    }
    val joined =
      if (projected.size == 1) {
        val only = projected.values.head
        only.drop(only.columns.filter(_.startsWith("__key_")): _*)
      } else joinAll(projected, catalog.model, mainTable)
    // Post-join null-defaulting (see [[postJoinUdfs]]): COALESCE semantics
    // must see the NULLs produced by unmatched LEFT-join parents.
    val defaulted = rows.filter(_.udf.exists(u => postJoinUdfs(u.toLowerCase)))
      .foldLeft(joined) { (d, m) =>
        val dt = toDataType(m.targetColDatatype)
        d.withColumn(m.targetCol,
          coalesce(col(m.targetCol),
            lit(m.udfArguments.headOption.getOrElse("-")).cast(dt)))
      }
    aggregate(defaulted, rows)
  }

  /** End-to-end: load catalog CSVs, bind sources, transform every target.
    * (reference: Transform.transform, ETLTransform.py:99-143). */
  def transformAll(spark: SparkSession, metaCsv: String,
                   modelCsv: String): Map[String, DataFrame] = {
    val catalog = Catalog(loadMeta(spark, metaCsv), loadDataModel(spark, modelCsv))
    val sources = catalog.meta.groupBy(_.srcTable).map { case (t, rows) =>
      // Every row of a source table must agree on WHERE it comes from:
      // binding rows.head silently read target B's data from target A's
      // declared path/filetype when the metadata conflicted.
      val bindings = rows.map(m => (m.srcFilePath, m.srcFiletype)).distinct
      require(bindings.size == 1,
        s"meta.csv: src_table '$t' is declared with conflicting " +
          s"source bindings ${bindings.mkString(" vs ")} — one path and " +
          "filetype per source table")
      t -> bindSource(spark, rows.head)
    }
    catalog.targetTables.map(t => t -> transform(sources, catalog, t)).toMap
  }

  // ---- DDL generation (reference S14: MetaModel.py:401-451) --------------

  /** `CREATE [EXTERNAL] TABLE ... STORED AS fmt LOCATION ...` from metadata. */
  def targetDdl(catalog: Catalog, targetTable: String, database: String,
                format: String = "parquet", location: Option[String] = None,
                external: Boolean = false): String = {
    val rows = catalog.forTarget(targetTable)
    val cols = rows.map(m => s"  ${m.targetCol} ${toDataType(m.targetColDatatype).simpleString}")
      .mkString(",\n")
    val ext = if (external) "EXTERNAL " else ""
    val loc = location.map(l => s"\nLOCATION '$l'").getOrElse("")
    s"CREATE ${ext}TABLE IF NOT EXISTS $database.$targetTable (\n$cols\n)\nSTORED AS $format$loc"
  }

  /** DDL from an inferred schema (reference: Mapper.py:35-59). */
  def schemaDdl(df: DataFrame, database: String, table: String,
                format: String = "parquet"): String = {
    val cols = df.schema.fields.map(f => s"  ${f.name} ${f.dataType.simpleString}")
      .mkString(",\n")
    s"CREATE TABLE IF NOT EXISTS $database.$table (\n$cols\n)\nSTORED AS $format"
  }
}
