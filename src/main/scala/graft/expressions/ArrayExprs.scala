package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native array kernels for the similarity/dedup hot paths.
  *
  * Both the near-dup verifiers (q36/q37: Jaccard over hashed shingle
  * sets) and the embedding operators (q38/q39/q41/q43/q54: integer dot
  * products) evaluate one array-combining scalar per CANDIDATE PAIR —
  * the innermost loop of the whole engine. The built-in forms pay real
  * allocation per call: `array_intersect` builds a hash set of boxed
  * values, `zip_with` + `aggregate` materialize an intermediate array
  * and run interpreted lambdas. At 100 TB the pair count is what LSH
  * bucketing bounds, but each pair still costs; these expressions make
  * the per-pair kernel a branch-light primitive loop inside whole-stage
  * codegen (tier (b) of the custom-operator ladder, SURVEY §7.3 — same
  * tier as [[ToNumberExpr]]).
  *
  * Registered by [[GraftExtensions]] as `graft_sorted_intersect_count`
  * and `graft_dot_long`; call via `functions.call_function`.
  */
object ArrayOps {

  /** Intersection cardinality of two SORTED ASCENDING, DISTINCT long
    * arrays (two-pointer merge — O(n+m), zero allocation). Null elements
    * never match (the producers — md5-prefix hashes of non-null shingles
    * — cannot emit them; a defensive skip keeps the kernel total).
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val x = a.getLong(i)
        val y = b.getLong(j)
        if (x == y) { n += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    n
  }

  /** Exact int64 dot product of two equal-length long arrays. Boxed-null
    * result mirrors `aggregate(zip_with(a, b, _*_), 0L, _+_)`: a length
    * mismatch (zip_with pads with null) or a null element nulls the sum.
    */
  def dotLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  private[expressions] def checkLongArrays(name: String, kids: Seq[Expression])
      : TypeCheckResult =
    if (kids.forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name needs (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
        kids.map(_.dataType.sql).mkString(", "))
}

/** `graft_sorted_intersect_count(a, b)`: |a ∩ b| for sorted distinct
  * long arrays. Null iff an input is null.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    ArrayOps.checkLongArrays(prettyName, Seq(left, right))

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayOps.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.ArrayOps.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_dot_long(a, b)`: Σ a[i]·b[i] over equal-length long arrays —
  * the exact-integer embedding dot product. Null if an input is null,
  * lengths differ, or an element is null (zip_with-compatible).
  */
case class DotLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    ArrayOps.checkLongArrays(prettyName, Seq(left, right))

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayOps.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val d = ctx.freshName("graftDot")
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${l.isNull} && !${r.isNull}) {
        java.lang.Long $d = graft.expressions.ArrayOps.dotLong(
          ${l.value}, ${r.value});
        if ($d != null) {
          ${ev.isNull} = false;
          ${ev.value} = $d.longValue();
        }
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
