package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import graft.functions.TextFunctions

/** 64-bit SimHash near-duplicate detection.
  *
  * Scale design: the signature is row-local (one native expression);
  * near-dup pair generation uses the pigeonhole banding trick — split the
  * 64-bit hash into 4 × 16-bit chunks; any pair within Hamming distance 3
  * must agree on at least one chunk, so an equi-join on (chunk_id,
  * chunk_value) finds ALL such pairs without an O(n²) comparison, then
  * `bit_count(xor)` (codegen'd) verifies the true distance.
  */
object SimHash {

  /** FNV-1a 64-bit — deterministic, dependency-free token hash. */
  private[operators] def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private[operators] def simhashOf(tokens: Iterator[String]): Long = {
    val votes = new Array[Int](64)
    while (tokens.hasNext) {
      val h = fnv1a(tokens.next().getBytes("UTF-8"))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Native expression: array<string> shingles → 64-bit simhash. */
  case class SimHashExpr(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "simhash64"

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      simhashOf((0 until n).iterator.map(i => arr.getUTF8String(i).toString))
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def simhash64(shingles: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(shingles)))

  /** doc_id → simhash signature over word shingles. */
  def signatures(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                 shingleN: Int = 3): DataFrame =
    docs.select(col(idCol), TextFunctions.wordShingles(col(textCol), shingleN).as("__sh"))
      .select(col(idCol), simhash64(col("__sh")).as("simhash"))

  /** (id, simhash, chunk_id, chunk_val) — the 4 × 16-bit banding keys. */
  private def chunkKeys(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    signatures(docs, idCol, textCol).select(col(idCol), col("simhash"),
        explode(array((0 until 4).map { c =>
          struct(lit(c).as("chunk_id"),
            shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xffffL)).as("chunk_val"))
        }: _*)).as("ck"))
      .select(col(idCol), col("simhash"),
        col("ck.chunk_id").as("chunk_id"), col("ck.chunk_val").as("chunk_val"))

  /** The buckets [[nearDupPairs]]'s guard would drop at this `maxBucket`
    * — (chunk_id, chunk_val, n_docs), largest first. Run alongside
    * nearDupPairs: a non-empty result means some near-dup cliques were
    * cut and should be handled by exact dedup or a bigger budget. */
  def droppedBuckets(docs: DataFrame, maxBucket: Int = 1000,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    chunkKeys(docs, idCol, textCol)
      .groupBy(col("chunk_id"), col("chunk_val"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
      .where(col("n_docs") > maxBucket)
      .orderBy(col("n_docs").desc, col("chunk_id"), col("chunk_val"))

  /** Near-dup pairs with Hamming distance ≤ maxHamming. The 4-chunk
    * pigeonhole is complete for hamming ≤ 3 AMONG documents whose chunk
    * buckets stay within `maxBucket` — buckets larger than that are
    * dropped wholesale (a hot 16-bit chunk value on a boilerplate-heavy
    * corpus would otherwise expand quadratically), so a >maxBucket
    * duplicate clique yields no pairs here by design; run
    * [[droppedBuckets]] alongside to surface what the guard cut, and
    * catch giant exact-duplicate cliques with `Dedup.exact` first (its
    * groupBy collapses them without pair expansion).
    *
    * Pair generation is the same guarded groupBy-collect shape as
    * `Dedup.candidatePairs`: ONE shuffle groups (id, simhash) per
    * (chunk_id, chunk_val) bucket with map-side partial collect, and
    * in-bucket pairs expand row-locally from the ≤maxBucket array. */
  def nearDupPairs(docs: DataFrame, maxHamming: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text",
                   maxBucket: Int = 1000): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding is only complete for hamming <= 3")
    val buckets = chunkKeys(docs, idCol, textCol)
      .groupBy(col("chunk_id"), col("chunk_val"))
      .agg(collect_list(struct(col(idCol).as("id"), col("simhash").as("h"))).as("__rows"))
      .where(size(col("__rows")).between(2, maxBucket))
      .select(array_sort(col("__rows")).as("__rows"))
    buckets
      // native streaming i<j generator (PairExpressions) — rows are
      // array_sort'ed, so i<j emission keeps id1 < id2 like the HOF
      // chain it replaces
      .select(graft.functions.PairExpressions.pairSelf(col("__rows")).as(Seq("__a", "__b")))
      .select(col("__a.id").as("id1"), col("__b.id").as("id2"),
        bit_count(col("__a.h").bitwiseXOR(col("__b.h"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }
}
