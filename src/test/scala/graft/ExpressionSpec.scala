package graft

import graft.functions.Parse
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native ToNumberExpr == Parse kernel, registered via extensions, and
  * actually inside whole-stage codegen (no UDF fence).
  */
class ExpressionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val inputs = Seq("1,250,000", "2.5", "1.250.000", "1,250.50",
    "  3 bedrooms ", "no digits", "450 sqm", "1.5.2.3", "12.345", "7",
    "100.25", "0.5")

  test("graft_to_number_native == kernel on all fixtures") {
    val df = inputs.toDF("s")
      .select(expr("graft_to_number_native(s)").as("v"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    val want = inputs.map(s => Parse.toNumber(s).map(Double.box).orNull)
    assert(got.toSeq == want)
  }

  test("native expression stays inside WholeStageCodegen") {
    // a local Seq would be constant-folded into a LocalTableScan before
    // codegen — use range so the expression runs in generated code
    val df = spark.range(100)
      .selectExpr("concat(cast(id as string), '.', cast(id % 100 as string)) AS s")
      .selectExpr("graft_to_number_native(s) AS v")
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_to_number_native"), plan)
    // and the generated code actually compiles — no silent fallback
    val strict = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
      val want = (0 until 100).map(i => Parse.toNumber(s"$i.${i % 100}").map(Double.box).orNull)
      assert(got.toSeq == want)
    } finally strict match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("two native calls in one projection compile (freshName regression)") {
    val strict = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(10)
        .selectExpr("cast(id as string) a", "cast(id * 2 as string) b")
        .selectExpr("graft_to_number_native(a) va", "graft_to_number_native(b) vb")
      val rows = df.collect().map(r => (r.getDouble(0), r.getDouble(1)))
      assert(rows.forall { case (a, b) => b == a * 2 })
    } finally strict match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("null input and non-parsing input both yield null") {
    val df = Seq(Some("abc"), None).toDF("s")
      .select(expr("graft_to_number_native(s)").as("v"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("wrong arity raises an analysis error naming the function") {
    val e = intercept[Exception](
      spark.sql("SELECT graft_dot_long(array(1L))").collect())
    assert(e.getMessage.contains("graft_dot_long"), e.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_sorted_intersect_count(array(1L), array(1L), array(1L))").collect())
    assert(e2.getMessage.contains("graft_sorted_intersect_count"), e2.getMessage)
  }

  test("graft_sorted_intersect_count == size(array_intersect) on random sets") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { _ =>
      val a = (0 until rnd.nextInt(50)).map(_ => rnd.nextInt(60).toLong)
      val b = (0 until rnd.nextInt(50)).map(_ => rnd.nextInt(60).toLong)
      (a.distinct.sorted.toArray, b.distinct.sorted.toArray)
    }
    val df = rows.toDF("a", "b").select(
      call_function("graft_sorted_intersect_count", col("a"), col("b")).as("n"),
      size(array_intersect(col("a"), col("b"))).as("want"))
    assert(df.collect().forall(r => r.getInt(0) == r.getInt(1)))
  }

  test("graft_dot_long == aggregate(zip_with) and handles null/mismatch") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 100).map { _ =>
      ((0 until 64).map(_ => rnd.nextInt(2001).toLong - 1000).toArray,
       (0 until 64).map(_ => rnd.nextInt(2001).toLong - 1000).toArray)
    }
    val df = rows.toDF("a", "b").select(
      call_function("graft_dot_long", col("a"), col("b")).as("got"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x).as("want"))
    assert(df.collect().forall(r => r.getLong(0) == r.getLong(1)))
    // length mismatch → null (zip_with pads with null and nulls the sum)
    val mm = Seq((Array(1L, 2L), Array(1L, 2L, 3L))).toDF("a", "b")
      .select(call_function("graft_dot_long", col("a"), col("b")))
    assert(mm.collect().head.isNullAt(0))
    // null input → null
    val nn = Seq((Some(Array(1L)), Option.empty[Array[Long]])).toDF("a", "b")
      .select(call_function("graft_dot_long", col("a"), col("b")))
    assert(nn.collect().head.isNullAt(0))
  }

  test("array kernels stay inside WholeStageCodegen") {
    val strict = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(50)
        .selectExpr("sequence(0L, id % 10) AS a", "sequence(0L, 5L) AS b")
        .selectExpr("graft_sorted_intersect_count(a, b) AS n",
          "graft_dot_long(b, b) AS d")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*(1) Project"), plan)
      // sequence(0, k) ∩ sequence(0, 5) = min(k, 5) + 1 elements
      val got = spark.range(50)
        .selectExpr("graft_sorted_intersect_count(sequence(0L, id % 10), sequence(0L, 5L)) AS n",
          "id % 10 AS k")
        .collect().map(r => (r.getLong(1), r.getInt(0)))
      assert(got.forall { case (k, n) => n == math.min(k, 5) + 1 })
      // dot(b, b) with b = [0..5] → Σ i² = 55
      assert(df.collect().forall(_.getLong(1) == 55L))
    } finally strict match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}
