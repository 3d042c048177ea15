package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salted join: the manual skew killer for when AQE's runtime skew
  * splitting isn't available (non-shuffle-join shapes, stateful streams)
  * or a key is so hot that one task would still own it.
  *
  * `a JOIN b ON k` where a few `k`s dominate `a`: explode the hot side's
  * key into `(k, salt)` with a random salt in [0, buckets), and replicate
  * each `b` row once per salt value. Every hot key now spreads over
  * `buckets` tasks; result multiset is identical to the unsalted join
  * (each a-row matches exactly the one replica carrying its salt).
  *
  * Cost model: replicates `b` `buckets`× — use when `b` is the smaller
  * side but too big to broadcast, and `a` is skewed. At 100 TB the
  * typical call is `saltedJoin(events, userDim, "user_id", 16)` for a
  * power-law user distribution.
  */
object SkewJoin {

  def saltedJoin(a: DataFrame, b: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    require(buckets > 0)
    val salted = a.withColumn("__salt", (rand(seed = 0) * buckets).cast("int"))
    val replicated = b.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
