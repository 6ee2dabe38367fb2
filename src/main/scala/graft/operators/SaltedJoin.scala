package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the skewed (large) side's key with a
  * deterministic per-row salt, replicate the small side once per salt
  * value, and join on (key, salt). Hot keys spread across `salts`
  * reducers instead of landing on one. AQE's skew-join handles many
  * cases adaptively; explicit salting is for the pathological keys AQE
  * can't split (single-key hot spots in sort-merge joins).
  *
  * Results are identical to the plain join — verified by spec. The salt
  * derives from a hash of the whole large-side row (deterministic, no
  * rand()), so repeated runs produce identical partitioning.
  */
object SaltedJoin {

  def join(large: DataFrame, small: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    require(salts > 0)
    // deterministic row salt: positive xxhash of all large-side columns
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toSeq: _*), lit(salts)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
