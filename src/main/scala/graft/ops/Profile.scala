package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiler — the `ANALYZE TABLE` / data-quality shape: per
  * column, row count, null count, exact distinct count, and
  * engine-stable min/max representations — one column-pruned value
  * histogram per column (see [[profile]]'s plan-shape note for why this
  * beats the classic single multi-distinct aggregation 11×).
  *
  * Representation contract (what makes the output engine-exact):
  *   - integer / string columns: min/max rendered directly (binary
  *     collation, decimal integer rendering — identical across engines);
  *   - timestamps: UTC-formatted `yyyy-MM-dd HH:mm:ss`;
  *   - doubles: `floor(x × 1e6)` micro-units as a long — floor is
  *     monotonic so min/max commute with the scaling, and no
  *     shortest-roundtrip float printing (which differs between
  *     engines) ever happens;
  *   - other types: null representations (profiled for counts only).
  *
  * Scale note: the per-column value histogram is exact and shuffles
  * only distinct values, but a column that is UNIQUE at corpus scale
  * shuffles its whole self once. At the 100 TB posture swap such
  * columns' distinct counts for per-column KMV sketches
  * ([[Sketches.kmvPerGroup]] — bounded state, one pass, ~1/√k error);
  * the exact form is the oracle-checkable contract.
  *
  * [[oracleSql]] generates the DuckDB replay from the SAME column walk,
  * so operator and oracle cannot drift (the [[graft.graph.PageRank]]
  * pattern).
  */
object Profile {

  private val TsFmtSpark = "yyyy-MM-dd HH:mm:ss"
  private val TsFmtDuck = "%Y-%m-%d %H:%M:%S"

  /** Renderer pair applied to the AGGREGATED min/max value (render after
    * aggregating — min over a rendered string would be lexicographic;
    * every renderer here is monotonic in the value, so render-of-min ==
    * min-of-rendered anyway, but the aggregate runs on the native type).
    * None = counts-only profiling. */
  private def renderers(dt: DataType): Option[(org.apache.spark.sql.Column => org.apache.spark.sql.Column, String => String)] =
    dt match {
      case ByteType | ShortType | IntegerType | LongType => Some((
        c => c.cast("string"),
        a => s"CAST($a AS VARCHAR)"))
      case StringType => Some((c => c, a => a))
      case TimestampType | TimestampNTZType => Some((
        c => date_format(c, TsFmtSpark),
        a => s"strftime($a, '$TsFmtDuck')"))
      case FloatType | DoubleType => Some((
        c => floor(c * 1e6).cast("long").cast("string"),
        a => s"CAST(CAST(floor($a * 1e6) AS BIGINT) AS VARCHAR)"))
      case _ => None
    }

  /** Profile every column of `df`: (column, dtype, n_rows, n_nulls,
    * n_distinct, min_repr, max_repr) — one row per column, in schema
    * order.
    *
    * Plan shape: one VALUE HISTOGRAM per column (groupBy(value) with
    * map-side combine over a column-pruned scan), each folded to a
    * single row — rows/nulls/distinct/min/max all derive from the
    * histogram, so no second pass exists. This replaces the original
    * single multi-distinct aggregation, whose Expand stage multiplied
    * the scan by the column count before the exchange (measured 17.2 s
    * → 1.5 s min-of-3 at sf0.1: eleven narrow parallel histograms beat one
    * 11×-expanded pipeline even though the file is opened eleven
    * times — the scans are column-pruned, so total I/O is the SAME
    * bytes, minus the Expand). */
  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    fields.map { f =>
      val hist = df.select(col(f.name).as("__v"))
        .groupBy("__v").agg(count(lit(1)).as("__c"))
      val (mn, mx) = renderers(f.dataType) match {
        case Some((render, _)) =>
          (render(min(col("__v"))), render(max(col("__v"))))
        case None =>
          (lit(null).cast("string"), lit(null).cast("string"))
      }
      hist.agg(
          sum(col("__c")).as("n_rows"),
          coalesce(sum(when(col("__v").isNull, col("__c"))), lit(0L))
            .as("n_nulls"),
          count(col("__v")).as("n_distinct"),
          mn.as("min_repr"), mx.as("max_repr"))
        .select(
          lit(f.name).as("column"),
          lit(f.dataType.simpleString).as("dtype"),
          col("n_rows"), col("n_nulls"), col("n_distinct"),
          col("min_repr"), col("max_repr"))
    }.reduce(_ unionAll _)
  }

  /** DuckDB replay of [[profile]] for the table named `table`, generated
    * from the same schema walk. DuckDB's count(*)/count(col) are BIGINT
    * already; distinct counts cast explicitly. */
  def oracleSql(schema: StructType, table: String): String = {
    val arms = schema.fields.toSeq.map { f =>
      val (mn, mx) = renderers(f.dataType) match {
        case Some((_, duck)) =>
          (s"CAST(${duck(s"min(${f.name})")} AS VARCHAR)",
            s"CAST(${duck(s"max(${f.name})")} AS VARCHAR)")
        case None => ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      }
      s"""SELECT '${f.name}' AS column, '${f.dataType.simpleString}' AS dtype,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(*) - count(${f.name}) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT ${f.name}) AS BIGINT) AS n_distinct,
         |  $mn AS min_repr, $mx AS max_repr
         |FROM $table""".stripMargin
    }
    arms.mkString("\nUNION ALL\n")
  }

  /** Referential-integrity audit — one row per declared FK relation:
    * child rows, null FKs, distinct FKs, and orphan keys/rows (FK values
    * with no parent). The join-health check a pipeline runs BEFORE
    * trusting its enrichment joins (an inner join silently drops orphan
    * rows; this makes the loss measurable first).
    *
    * Scale posture: the child table is aggregated to (fk, cnt) — a
    * distinct-key-sized frame — in one map-side-combined pass; the
    * parent side reduces to its distinct keys; one key-sized left join
    * and one single-row aggregate per relation, so the fact table is
    * scanned once and nothing row-sized ever joins. Relations audit
    * independently (separate cheap jobs, unioned). */
  def fkAudit(relations: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(relations.nonEmpty, "need at least one FK relation")
    relations.map { case (rel, child, fkCol, parent, pkCol) =>
      val keyCnt = child.groupBy(col(fkCol).as("fk"))
        .agg(count(lit(1)).as("cnt"))
      val pk = parent.select(col(pkCol).as("pk")).distinct()
      val orphanRow = col("fk").isNotNull && col("pk").isNull
      keyCnt.join(pk, col("fk") === col("pk"), "left")
        .agg(
          sum(col("cnt")).as("child_rows"),
          coalesce(sum(when(col("fk").isNull, col("cnt"))), lit(0L))
            .as("null_fks"),
          count(col("fk")).as("distinct_fks"),
          count(when(orphanRow, lit(1))).as("orphan_keys"),
          coalesce(sum(when(orphanRow, col("cnt"))), lit(0L))
            .as("orphan_rows"))
        .select(lit(rel).as("rel"), col("child_rows"), col("null_fks"),
          col("distinct_fks"), col("orphan_keys"), col("orphan_rows"))
    }.reduce(_ unionAll _)
  }

  /** [[fkAudit]] oracle from the same relation tuples
    * (rel, childTable, fkCol, parentTable, pkCol). */
  def fkAuditOracleSql(
      relations: Seq[(String, String, String, String, String)]): String =
    relations.map { case (rel, child, fkCol, parent, pkCol) =>
      s"""SELECT '$rel' AS rel,
         |  CAST(sum(cnt) AS BIGINT) AS child_rows,
         |  CAST(coalesce(sum(cnt) FILTER (fk IS NULL), 0) AS BIGINT)
         |    AS null_fks,
         |  CAST(count(fk) AS BIGINT) AS distinct_fks,
         |  CAST(count(*) FILTER (fk IS NOT NULL AND pk IS NULL) AS BIGINT)
         |    AS orphan_keys,
         |  CAST(coalesce(sum(cnt) FILTER (fk IS NOT NULL AND pk IS NULL), 0)
         |    AS BIGINT) AS orphan_rows
         |FROM (SELECT $fkCol AS fk, count(*) AS cnt FROM $child GROUP BY 1) k
         |LEFT JOIN (SELECT DISTINCT $pkCol AS pk FROM $parent) p
         |  ON k.fk = p.pk""".stripMargin
    }.mkString("\nUNION ALL\n")
}
