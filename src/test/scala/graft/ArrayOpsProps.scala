package graft

import graft.expressions.ArrayOps
import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the native array kernels: the
  * two-pointer intersect agrees with set intersection on arbitrary
  * sorted distinct arrays, and the dot product agrees with the naive
  * sum on arbitrary equal-length vectors (kernel-level — the
  * Spark-plan-level equivalences are pinned in ExpressionSpec).
  */
object ArrayOpsProps extends Properties("ArrayOps") {

  private val longSet: Gen[Array[Long]] =
    Gen.listOf(Gen.choose(0L, 80L)).map(_.distinct.sorted.toArray)

  private def ad(a: Array[Long]): ArrayData = ArrayData.toArrayData(a)

  property("sortedIntersectCount == set intersection size") =
    forAll(longSet, longSet) { (a, b) =>
      ArrayOps.sortedIntersectCount(ad(a), ad(b)) ==
        a.toSet.intersect(b.toSet).size
    }

  property("sortedIntersectCount is symmetric and bounded") =
    forAll(longSet, longSet) { (a, b) =>
      val n = ArrayOps.sortedIntersectCount(ad(a), ad(b))
      n == ArrayOps.sortedIntersectCount(ad(b), ad(a)) &&
        n <= math.min(a.length, b.length) &&
        ArrayOps.sortedIntersectCount(ad(a), ad(a)) == a.length
    }

  private val vec: Gen[Array[Long]] =
    Gen.listOfN(16, Gen.choose(-1000L, 1000L)).map(_.toArray)

  property("dotLong == naive sum of products") =
    forAll(vec, vec) { (a, b) =>
      ArrayOps.dotLong(ad(a), ad(b)) ==
        java.lang.Long.valueOf(a.zip(b).map { case (x, y) => x * y }.sum)
    }

  property("dotLong: length mismatch is null, self-dot is non-negative") =
    forAll(vec) { a =>
      ArrayOps.dotLong(ad(a), ad(a.take(8))) == null &&
        ArrayOps.dotLong(ad(a), ad(a)).longValue() >= 0L
    }
}
