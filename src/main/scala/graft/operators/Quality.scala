package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks over a corpus — the dbt-test /
  * Deequ-style gate a production pipeline runs before (and after) every
  * transform stage, here as plain aggregations so the whole suite is
  * one scan.
  *
  * Row-local checks (`notNull` / `accepted` / `inRange` / `matches` /
  * custom `expr`) compile to conditional sums and run in a SINGLE
  * aggregation pass over the table — adding a check adds a column to
  * the agg, not a job. Set-level checks need their own shape:
  * `unique` is one groupBy on the key, `referential` is one anti-join
  * count against the parent. Each check yields one report row
  * `(check, total, violations, pass)`; the report is check-cardinality
  * sized, never data-sized.
  */
object Quality {

  /** One check = a name + a per-row VIOLATION predicate (true = bad row).
    * Nulls in the predicate count as violations (a null comparison is
    * exactly the "I couldn't prove it's fine" case a gate must flag). */
  final case class Check(name: String, violation: Column)

  def notNull(colName: String): Check =
    Check(s"not_null($colName)", col(colName).isNull)

  def accepted(colName: String, values: Seq[Any]): Check =
    Check(s"accepted($colName)",
      !coalesce(col(colName).isin(values: _*), lit(false)))

  def inRange(colName: String, lo: Double, hi: Double): Check =
    Check(s"range($colName,$lo,$hi)",
      !coalesce(col(colName) >= lo && col(colName) <= hi, lit(false)))

  def matches(colName: String, pattern: String): Check =
    Check(s"matches($colName)",
      !coalesce(regexp_like(col(colName), lit(pattern)), lit(false)))

  /** Row-local checks in ONE aggregation pass: every check is a
    * conditional sum over the same scan. */
  def rowChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Quality.rowChecks: no checks given")
    val aggs = count(lit(1)).cast("long").as("__total") +:
      checks.zipWithIndex.map { case (c, i) =>
        sum(when(c.violation, 1L).otherwise(0L)).as(s"__v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      one.select(lit(c.name).as("check"), col("__total").as("total"),
        col(s"__v$i").as("violations"), (col(s"__v$i") === 0L).as("pass"))
    }
    rows.reduce(_ unionByName _)
  }

  /** Key-uniqueness check: one map-side-combined groupBy on the key;
    * violations = rows beyond the first per duplicated key. */
  def unique(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val dup = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") - 1), lit(0L)).cast("long").as("violations"),
        coalesce(sum(col("__n")), lit(0L)).cast("long").as("total"))
    dup.select(lit(s"unique(${keyCols.mkString(",")})").as("check"),
      col("total"), col("violations"), (col("violations") === 0L).as("pass"))
  }

  /** Referential-integrity check: child FK values with no parent PK —
    * a left anti join counted (parent side broadcast when small, AQE
    * decides). Null FKs are orphans (use [[notNull]] to split them out
    * if they're expected). */
  def referential(child: DataFrame, fkCol: String,
                  parent: DataFrame, pkCol: String): DataFrame = {
    val total = child.agg(count(lit(1)).cast("long").as("total"))
    val orphans = child.select(col(fkCol))
      .join(parent.select(col(pkCol).as(fkCol)), Seq(fkCol), "left_anti")
      .agg(count(lit(1)).cast("long").as("violations"))
    total.crossJoin(orphans)
      .select(lit(s"referential($fkCol->$pkCol)").as("check"),
        col("total"), col("violations"), (col("violations") === 0L).as("pass"))
  }

  /** Run a full suite and stack the report, ordered by check name. */
  def report(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "Quality.report: empty suite")
    parts.reduce(_ unionByName _).orderBy(col("check"))
  }
}
