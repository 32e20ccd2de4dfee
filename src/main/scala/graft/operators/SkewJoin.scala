package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY "Optimize for scale": salting
  * for skew). AQE's skew-join handles sort-merge cases adaptively; explicit
  * salting is the deterministic tool when one build-side key dominates —
  * e.g. a single hot table id owning most of a 100 TB timeline.
  *
  * The left (large, skewed) side gets a uniform random-free salt derived
  * from a high-cardinality column; the right side is exploded `salts` times
  * so every (key, salt) bucket finds its match. Results are identical to the
  * plain join; only the shuffle distribution changes: the hot key spreads
  * over `salts` reducers instead of one.
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `key`, salted `salts` ways.
    * `saltSource` must be a deterministic high-cardinality left column (row
    * id, hash of payload) so bucket assignment is stable across retries.
    */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltSource: Column,
      salts: Int = 16): DataFrame = {
    require(salts > 0)
    val l = left.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
