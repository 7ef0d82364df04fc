package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — manual skew mitigation for hot keys.
  *
  * A shuffled join partitions both sides by the key; a hot key (one
  * customer with 10% of all events, a null-ish default id) lands its
  * entire row group on ONE reducer, and that straggler defines the stage's
  * wall-clock. AQE's skew-join split handles many cases at runtime, but
  * only for sort-merge joins and only per already-materialized shuffle
  * block sizes; salting is the deterministic, planner-independent fix.
  *
  * The key becomes (key, salt): the big side computes a salt in
  * [0, saltFactor) from a stable row identity (NOT rand() — retries must
  * re-salt identically), the small side replicates each row saltFactor
  * times. A hot key's rows now spread over saltFactor reducers. The result
  * multiset is exactly a plain inner join's; saltFactor trades small-side
  * replication for straggler spread.
  */
object SkewJoin {

  /** Inner equi-join on `keys`, salted to spread each key over
    * `saltFactor` reducers. `saltFrom` names a stable, preferably-distinct
    * column on `left` (a row id) that seeds the deterministic salt. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                      saltFrom: String, saltFactor: Int): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(saltFrom)), lit(saltFactor.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(i => lit(i)): _*)))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
