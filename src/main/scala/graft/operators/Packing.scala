package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Sequence packing — assemble documents into fixed token-budget packs
  * (training context windows): greedy sequential fill in doc order, a
  * new pack whenever the next document would overflow `capacity`
  * (oversized documents get a pack of their own).
  *
  * Scale design: a GLOBAL greedy scan is inherently sequential, so the
  * corpus is split into deterministic ranges of `rangeSize` ids and the
  * greedy fill runs independently per range — embarrassingly parallel,
  * deterministic under any partitioning, and the per-range waste is at
  * most one underfull pack. One shuffle (groupBy range); the per-range
  * scan is an `aggregate` HOF over ≤rangeSize collected rows (bounded,
  * cold). Pack ids are globally unique: range_id * rangeSize + local
  * pack (a range of n docs can't open more than n packs).
  */
object Packing {

  /** (idCol, n_tokens, pack_id) — one row per document. */
  def packSequences(docs: DataFrame, capacity: Int, rangeSize: Int = 1000,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(capacity > 0 && rangeSize > 0, "packSequences: capacity and rangeSize must be positive")
    // FLOOR division in long arithmetic: the double-divide-then-truncate
    // form merged ranges −(rs−1)..rs−1 into one (up to 2·rs−1 docs — its
    // local pack index could collide with the next range's pack_id
    // space) and rounded ids past 2^53; (id − pmod) div rs is exact for
    // every long
    val toks = docs.select(col(idCol),
      TextFunctions.wsTokenCount(col(textCol)).cast("long").as("__tokens"),
      expr(s"(cast($idCol as bigint) - pmod(cast($idCol as bigint), ${rangeSize}L)) " +
        s"div ${rangeSize}L").as("__range"))
    toks
      .groupBy(col("__range"))
      .agg(array_sort(collect_list(struct(col(idCol).as("id"), col("__tokens").as("t")))).as("__rows"))
      .select(col("__range"), explode(expr(
        s"""aggregate(
           |  __rows,
           |  named_struct('fill', 0L, 'pack', 0L,
           |    'out', cast(array() as array<struct<id: bigint, t: bigint, pack: bigint>>)),
           |  (acc, x) -> if (acc.fill > 0 and acc.fill + x.t > $capacity,
           |    named_struct('fill', x.t, 'pack', acc.pack + 1L,
           |      'out', concat(acc.out, array(named_struct('id', x.id, 't', x.t, 'pack', acc.pack + 1L)))),
           |    named_struct('fill', acc.fill + x.t, 'pack', acc.pack,
           |      'out', concat(acc.out, array(named_struct('id', x.id, 't', x.t, 'pack', acc.pack))))),
           |  acc -> acc.out)""".stripMargin)).as("__p"))
      .select(col("__p.id").as(idCol), col("__p.t").as("n_tokens"),
        (col("__range") * rangeSize + col("__p.pack")).as("pack_id"))
  }

  /** Pack-level summary: (pack_id, n_docs, pack_tokens, fill_ratio). */
  def packStats(packed: DataFrame, capacity: Int): DataFrame =
    packed.groupBy(col("pack_id"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tokens")).cast("long").as("pack_tokens"))
      .withColumn("fill_ratio", round(col("pack_tokens") / lit(capacity.toDouble), 4))
}
