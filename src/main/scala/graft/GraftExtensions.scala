package graft

import graft.functions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.types.{IntegerType, StringType}

/** SQL surface for the custom expression layer. Two entry points:
  *
  *  - config: `spark.sql.extensions=graft.GraftExtensions` registers the
  *    functions at session build (the production path for SQL users);
  *  - runtime: `Graft.registerFunctions(spark)` for an existing session.
  *
  * After registration: `keccak256(bin)`, `u256_string(bin)`, `u256_f64`,
  * `u256_u64`, `u256_u32`, `u256_d128`, `u256_from_string(str)`,
  * `zero_byte_count(bin)`, `decode_event(topics, data, 'Sig(...)')`,
  * plus the pipeline kernels: `md5_prefix60(str)`, `dot_f32(a, b)`,
  * `sum_sq_f32(a)`, `abs_max_f32(a)`, `sub_f32(a, b)`,
  * `minhash_sigs(toks, 3)` (default affine family),
  * `explode_shingles(toks, 3)` (lateral view generator), and the
  * table-valued `graft_lake(dir, dataset[, blocks])` frozen-lake scan.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    Graft.functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    e.injectTableFunction((FunctionIdentifier("graft_lake"),
      new ExpressionInfo("graft", "graft_lake"), Graft.lakePlan))
  }
}

object Graft {
  private def literalString(e: Expression, what: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got: $other")
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "keccak256" -> (es => Keccak256(es.head)),
    "u256_string" -> (es => U256ToString(es.head)),
    "i256_string" -> (es => I256ToString(es.head)),
    "u256_f64" -> (es => U256ToDouble(es.head)),
    "u256_d128" -> (es => U256ToDecimal(es.head)),
    "u256_u64" -> (es => U256WrapLong(es.head, 8)),
    "u256_u32" -> (es => U256WrapLong(es.head, 4)),
    "u256_from_string" -> (es => U256FromString(es.head)),
    "zero_byte_count" -> (es => ZeroByteCount(es.head)),
    "decode_event" -> (es =>
      DecodeEvent(es(0), es(1), literalString(es(2), "event signature"))),
    "md5_prefix60" -> (es => Md5Prefix60(es.head)),
    "dot_f32" -> (es => DotF32(es(0), es(1))),
    "sum_sq_f32" -> (es => SumSqF32(es.head)),
    "abs_max_f32" -> (es => AbsMaxF32(es.head)),
    "sub_f32" -> (es => SubF32(es(0), es(1))),
    "minhash_sigs" -> (es =>
      MinhashSigs.default(es(0), literalInt(es(1), "shingle width"))),
    "explode_shingles" -> (es =>
      ExplodeShingles(es(0), literalInt(es(1), "shingle width"))))

  private def literalInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  /** Table-valued lake scan for SQL users:
    * `SELECT * FROM graft_lake('/lake/dir', 'blocks'[, '1000:2000'])` —
    * the TVF resolves at ANALYSIS time into the same pruned file scan
    * as `Lake.read` (filename file pruning + residual block filter), so
    * SQL-only consumers get identical plans to the Scala/CLI/python
    * surfaces. Arguments must be literals: the file pruning happens at
    * planning, before any row exists to evaluate an expression against.
    * `latest` in the blocks spec resolves to the lake head. */
  def lakePlan(es: Seq[Expression]): logical.LogicalPlan = {
    require(es.size == 2 || es.size == 3,
      s"graft_lake(dir, dataset[, blocks]) takes 2-3 arguments, got ${es.size}")
    val dir = literalString(es(0), "lake dir")
    val dataset = literalString(es(1), "dataset")
    val spark = SparkSession.active
    val blocks = if (es.size < 3) None else
      Some(graft.chain.BlockSyntax.parse(
        literalString(es(2), "blocks spec"),
        graft.chain.Lake.head(dir, dataset)))
    graft.chain.Lake.read(spark, dir, dataset, blocks)
      .queryExecution.logical
  }

  /** register on an already-built session */
  def registerFunctions(spark: SparkSession): Unit = {
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_lake", lakePlan, "built-in")
  }
}
