package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's runtime
  * skew-split isn't available (e.g. non-AQE plans, or a known-skewed
  * dimension that must shuffle): the big (skewed) side gets a random salt
  * in [0, salt), the small side is replicated `salt` ways, and the join
  * key becomes (key, salt) — a hot key's rows spread over `salt`
  * reducers instead of one straggler.
  */
object SkewJoin {

  private val SupportedJoins = Set("inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "left_anti", "leftanti")

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int = 8, joinType: String = "inner"): DataFrame = {
    require(salt >= 1)
    // right/full outer would emit `salt` null-extended copies of every
    // unmatched (replicated) small row — semantically wrong, so rejected
    require(SupportedJoins.contains(joinType.toLowerCase.replace("_", "")) ||
      SupportedJoins.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi/left_anti, got $joinType")
    // deterministic spread: hash the full row's key + a physical row id
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salt)))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedBig.join(replicatedSmall,
        saltedBig(key) === replicatedSmall(key) && saltedBig("__salt") === replicatedSmall("__salt"),
        joinType)
      .drop(replicatedSmall(key)).drop(saltedBig("__salt")).drop(replicatedSmall("__salt"))
  }
}
