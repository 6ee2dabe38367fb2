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
    // a pre-existing __salt column would be silently overwritten by the
    // withColumn and then dropped from the output — refuse instead of
    // corrupting the documented plain-join equivalence
    require(!large.columns.contains("__salt") && !small.columns.contains("__salt"),
      "SaltedJoin reserves the column name __salt; rename it on the inputs")
    // deterministic row salt: positive xxhash of the HASHABLE large-side
    // columns (hash over MapType fails analysis — a map column is legal
    // in the plain equi-join, so it must not break the salted form; the
    // remaining columns still spread a hot key's rows uniformly)
    def hasMap(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val hashable = large.schema.fields
      .filterNot(f => hasMap(f.dataType))
      .map(f => col(f.name)).toSeq
    require(hashable.nonEmpty,
      "SaltedJoin needs at least one non-map column on the large side")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(hashable: _*), lit(salts)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
