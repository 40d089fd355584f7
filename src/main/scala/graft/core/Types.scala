package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dtype registry (reference `graphblas/core/dtypes.py:329-457`): the 11
  * built-in GraphBLAS dtypes mapped to Spark DataTypes, the `unify` promotion
  * lattice (`dtypes.py:552`), and the pinned integer-division contracts
  * (`operator/binary.py:849-861`: C `cdiv` truncates toward zero; numpy
  * `floordiv` rounds toward −∞).
  *
  * Unsigned contracts (JVM has no unsigned integrals):
  *  - UINT8/16/32 are *widened* to the next signed Spark type, so all values
  *    are exactly representable and arithmetic is exact.
  *  - UINT64 maps to LongType with two's-complement wraparound semantics
  *    (documented divergence: values ≥ 2^63 compare/print as negative;
  *    add/sub/mul/bitwise are bit-exact, division is not — same contract as
  *    Java's `Long.divideUnsigned` caveat).
  */
object Types {

  final case class GrbType(name: String, spark: DataType, rank: Int,
                           isFloat: Boolean, widened: Boolean = false)

  val BOOL   = GrbType("BOOL", BooleanType, 0, isFloat = false)
  val INT8   = GrbType("INT8", ByteType, 1, isFloat = false)
  val UINT8  = GrbType("UINT8", ShortType, 2, isFloat = false, widened = true)
  val INT16  = GrbType("INT16", ShortType, 3, isFloat = false)
  val UINT16 = GrbType("UINT16", IntegerType, 4, isFloat = false, widened = true)
  val INT32  = GrbType("INT32", IntegerType, 5, isFloat = false)
  val UINT32 = GrbType("UINT32", LongType, 6, isFloat = false, widened = true)
  val INT64  = GrbType("INT64", LongType, 7, isFloat = false)
  val UINT64 = GrbType("UINT64", LongType, 8, isFloat = false) // wraparound contract
  val FP32   = GrbType("FP32", FloatType, 9, isFloat = true)
  val FP64   = GrbType("FP64", DoubleType, 10, isFloat = true)

  val all: Seq[GrbType] =
    Seq(BOOL, INT8, UINT8, INT16, UINT16, INT32, UINT32, INT64, UINT64, FP32, FP64)

  /** complex dtypes (OPTIONAL in the reference too — gated by
    * `_supports_complex`, `dtypes.py:15,423-457`): struct(re, im) values.
    * Outside the numeric promotion lattice like records (no implicit
    * real→complex promotion — documented divergence); arithmetic via the
    * c-named ops in the catalog (Ops.cplus/ctimes/conj/…). */
  val FC32 = GrbType("FC32", StructType(Seq(
    StructField("re", FloatType, nullable = false),
    StructField("im", FloatType, nullable = false))), rank = -1, isFloat = true)
  val FC64 = GrbType("FC64", StructType(Seq(
    StructField("re", DoubleType, nullable = false),
    StructField("im", DoubleType, nullable = false))), rank = -1, isFloat = true)

  private val byName = scala.collection.concurrent.TrieMap[String, GrbType](
    (all ++ Seq(FC32, FC64)).map(t => t.name -> t): _*)
  def lookup(name: String): GrbType = byName(name)

  /** UDT / record dtypes (reference `dtypes.py:165` register_new, `:195`
    * register_anonymous; `docs/user_guide/udt.rst`): an arbitrary record of
    * scalar or nested-record fields (array fields via `arrayOf`) becomes a
    * Spark StructType value column. Records take rank -1: they never
    * participate in the numeric promotion lattice — `unify` of a record with
    * anything but ITSELF is an error, like the reference's UDTs (no
    * auto-coercion between record dtypes). */
  def registerRecord(name: String, fields: Seq[(String, DataType)]): GrbType = {
    val t = GrbType(name, StructType(fields.map { case (f, dt) =>
      StructField(f, dt, nullable = false) }), rank = -1, isFloat = false)
    // atomic check-and-register: a contains/put pair on the concurrent map
    // would let two racing registrations both pass the check and the second
    // silently overwrite the first (ADVICE r3)
    require(byName.putIfAbsent(name, t).isEmpty,
      s"dtype $name already registered")
    t
  }

  /** anonymous record (register_anonymous): not added to the registry. */
  def recordOf(fields: (String, DataType)*): GrbType =
    GrbType("record", StructType(fields.map { case (f, dt) =>
      StructField(f, dt, nullable = false) }), rank = -1, isFloat = false)

  def arrayOf(dt: DataType): DataType = ArrayType(dt, containsNull = false)

  /** dtype unification (`dtypes.py:552` → numpy promote_types): the wider
    * type wins; a ≥32-bit integer meeting FP32 promotes to FP64 (an FP32
    * mantissa cannot hold 32-bit integers exactly). Record dtypes only unify
    * with themselves. */
  def unify(a: GrbType, b: GrbType): GrbType = {
    if (a.rank < 0 || b.rank < 0) {
      require(a.spark == b.spark, s"record dtypes do not coerce: $a vs $b")
      return a
    }
    val (lo, hi) = if (a.rank <= b.rank) (a, b) else (b, a)
    if (hi == FP32 && !lo.isFloat && lo.rank >= INT32.rank) FP64 else hi
  }

  def cast(c: Column, t: GrbType): Column = c.cast(t.spark)

  /** C integer division (GraphBLAS `div` = cdiv, truncation toward zero,
    * `operator/binary.py:849-851`). Implemented as exact integer arithmetic:
    * (a − a % b) is exactly divisible by b; the division runs in
    * decimal(38,0) so the full INT64 range stays exact (FP64 would lose
    * exactness above 2^53). Spark/Java `%` is C-style (sign of dividend),
    * matching the identity a = cdiv(a,b)*b + rem(a,b). */
  def cdiv(a: Column, b: Column): Column =
    ((a.cast("decimal(38,0)") - (a % b)) / b).cast("long")

  /** numpy floor division: round toward −∞ (differs from cdiv exactly when
    * the remainder is nonzero and operands have opposite signs). */
  def floordiv(a: Column, b: Column): Column =
    cdiv(a, b) - when((a % b) =!= 0 && ((a % b) < 0) =!= (b < 0), lit(1L))
      .otherwise(lit(0L))

  /** C remainder (sign of dividend) — Spark's `%` already is. */
  def rem(a: Column, b: Column): Column = a % b

  /** numpy remainder / floor-mod (sign of divisor). */
  def floormod(a: Column, b: Column): Column = ((a % b) + b) % b
}
