package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-salting for equi-joins — the manual lever for the
  * cases AQE's runtime skew-split cannot reach (skew under an
  * aggregation-feeding join, stream-static joins, or a planner that
  * chose its partitioning before the skew materialized).
  *
  * Shape: the BIG side gets a deterministic per-row salt in
  * [0, salts) (hash of the row's own key + a row-content disambiguator
  * — no RNG, replay-stable), the SMALL side is replicated once per
  * salt value, and the join key becomes (key, salt). A hot key's rows
  * now spread over `salts` reducers instead of one. Result multiset is
  * EXACTLY the plain join's (each big row meets each of its key's
  * small rows exactly once — the oracle replays the UNSALTED join).
  * Cost: small side × salts, the standard trade.
  */
object SkewJoin {

  /** Inner equi-join of `big ⋈ small` on `key`, salted `salts` ways.
    * `saltBy` disambiguates rows of the same key across salts (any
    * column expression — an id, or a hash of the payload); the salt is
    * `pmod(xxhash64(key, saltBy), salts)`.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBy: Column, salts: Int): DataFrame = {
    require(salts >= 1, "salts >= 1")
    val b = big.withColumn("__salt",
      pmod(xxhash64(col(key), saltBy), lit(salts.toLong)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
