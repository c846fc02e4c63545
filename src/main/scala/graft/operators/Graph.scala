package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph centrality — the crawl-curation signal a 100 TB corpus
  * build ranks domains/hosts by (CommonCrawl publishes exactly this as
  * its harmonic-centrality host ranking; quality-weighted sampling and
  * frontier prioritization both consume it). Implemented as weighted
  * PageRank in EXACT fixed-point integer arithmetic so every iteration
  * is bit-reproducible across engines and parallelism: ranks are
  * BIGINT micro-mass units summing to ~`scale`, every division is a
  * floor div, and all sums are integer — no float accumulation order
  * anywhere.
  *
  * Scale shape: the classic DataFrame power iteration (what GraphFrames
  * does under the hood) — the edge table is pre-joined with per-source
  * out-weights ONCE and persisted; each iteration is one hash join of
  * the rank frame on `src` plus one partial-aggregated sum shuffle on
  * `dst`. Dangling mass is a 1-row aggregate crossJoined back as an
  * explicit broadcast — a BroadcastNestedLoopJoin whose build side is
  * exactly one row (the q73 single-row-aggregate posture; GraphSpec
  * pins it). Nothing ever materializes on the driver; hub skew is
  * AQE's skew-join case. Each
  * round starts from an EAGER localCheckpoint of the previous ranks
  * (the pointer-jumping posture, TextOps.scala:448) — the rank plan
  * references its predecessor through TWO branches (in-sum + dangling),
  * so without lineage truncation the logical plan doubles per iteration
  * and is exponential by round 10. On a real cluster this is
  * `spark.checkpoint` to reliable storage; the truncation requirement
  * is identical.
  */
object Graph {

  /** @param nodes one column `node` (string), the full vertex set
    * @param edges  columns `src`, `dst`, `w` (long weight > 0)
    * @return (node, rank) — rank in integer micro-mass units
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 10,
               dampNum: Long = 85, dampDen: Long = 100,
               scale: Long = 1000000000000L): DataFrame = {
    val spark = nodes.sparkSession
    // bounded driver scalar: the vertex COUNT (one long), needed to
    // fix the integer base share — same posture as langid's minLang
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty vertex set")
    val base = ((scale * (dampDen - dampNum)) / dampDen) / n
    // out-weights and the dangling vertex set are loop-invariant:
    // persisted ONCE — referenced from inside every iteration, they
    // would otherwise recompute the full edge derivation per round
    // (the first formulation paid the source joins 10×)
    val outw = Caches.persistTracked(
      edges.groupBy("src").agg(sum(col("w")).as("ow")))
    val e = Caches.persistTracked(edges.join(outw, Seq("src")))
    val nodesP = Caches.persistTracked(nodes)
    val dangNodes = Caches.persistTracked(
      nodesP.join(outw.withColumnRenamed("src", "node"),
        Seq("node"), "left_anti"))
    var rank = nodesP.withColumn("rank", lit(scale / n))
    for (_ <- 1 to iters) {
      val prev = Caches.trackOnly(rank.localCheckpoint())
      val in = e.join(prev.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          expr("(rank * w) div ow").as("c"))
        .groupBy("node").agg(sum(col("c")).as("inr"))
      // dangling mass: rank parked on vertices with no out-edge — a
      // SINGLE-ROW aggregate crossJoined back under an explicit
      // broadcast (the q73 posture: the nested-loop's build side is
      // exactly one row, so the "loop" is a constant lookup)
      val dang = prev.join(dangNodes, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0L)).as("dang"))
        .select(expr(s"dang div $n").as("dshare"))
      rank = nodesP.join(in, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          (lit(base) + expr(
            s"($dampNum * (coalesce(inr, 0L) + dshare)) div $dampDen"))
            .as("rank"))
    }
    rank.orderBy("node")
  }

  /** Synchronous LABEL PROPAGATION (Raghavan et al. 2007) — the
    * community-detection signal corpus curation uses to group hosts/
    * domains into site families (mirror farms, link rings, CMS
    * clusters) before per-community quality decisions. Every node
    * starts labeled with itself; each round it adopts the label
    * carrying the LARGEST total in-edge weight among its neighbors'
    * current labels, ties broken by MIN label — fully deterministic
    * (classic async LPA breaks ties randomly; this is the
    * reproducible variant), integer/string-exact, bit-stable at any
    * parallelism. Fixed `iters` rounds; synchronous LPA can oscillate
    * on bipartite structure, so the operator contracts a round COUNT,
    * not convergence (the fixed-point is detectable by frame equality
    * exactly as [[pageRank]]'s).
    *
    * Scale shape per round: one hash join of the label frame on `src`,
    * one partial-aggregated (dst, label) weight sum, one bounded rank
    * window (WindowGroupLimit prunes to top-1 per node map-side), one
    * left join back to carry isolated nodes' labels. The previous
    * round is referenced TWICE (contribution + carry), so each round
    * starts from an eager localCheckpoint — the [[pageRank]] lineage
    * posture, without which the plan doubles per round.
    */
  def labelProp(nodes: DataFrame, edges: DataFrame,
                iters: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Caches.persistTracked(edges)
    val nodesP = Caches.persistTracked(nodes)
    var lab = nodesP.withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      val prev = Caches.trackOnly(lab.localCheckpoint())
      val contrib = e
        .join(prev.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"), col("label"))
        .agg(sum(col("w")).as("cw"))
      val top = contrib
        .withColumn("rn", row_number().over(Window.partitionBy("node")
          .orderBy(col("cw").desc, col("label").asc)))
        .filter(col("rn") === 1)
        .select(col("node"), col("label").as("nlabel"))
      lab = prev.join(top, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("nlabel"), col("label")).as("label"))
    }
    lab.orderBy("node")
  }

  /** The shared registered instantiation: the customer↔supplier trade
    * graph from orders ⋈ lineitem (edge weight = lineitem count per
    * pair, both directions so the chain is ergodic; vertices prefixed
    * c/s to disambiguate the overlapping key ranges). Customers who
    * never ordered are dangling vertices — pageRank's redistribution
    * path and labelProp's isolated-carry path are genuinely exercised.
    */
  private[graft] def tradeGraph(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val nodes = Tables.customer(s, d)
      .select(concat(lit("c"), col("c_custkey")).as("node"))
      .unionByName(Tables.supplier(s, d)
        .select(concat(lit("s"), col("s_suppkey")).as("node")))
    val pairs = Tables.orders(s, d)
      .join(Tables.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .agg(count(lit(1)).as("w"))
    val edges = pairs.unionByName(pairs.select(col("dst").as("src"),
      col("src").as("dst"), col("w")))
    (nodes, edges)
  }

  def q143PageRank(s: SparkSession, d: String): DataFrame = {
    val (nodes, edges) = tradeGraph(s, d)
    pageRank(nodes, edges)
  }

  def q148LabelProp(s: SparkSession, d: String): DataFrame = {
    val (nodes, edges) = tradeGraph(s, d)
    labelProp(nodes, edges)
  }

  /** Unrolled-iteration DuckDB oracle (the Bpe.scala generated-CTE
    * pattern): r0 → i1/d1/r1 → … — every arithmetic step mirrors
    * [[pageRank]] in the same integer floor-div form. Every CTE is
    * `AS MATERIALIZED`: each rank level is referenced twice (in-sum +
    * dangling), so plain CTE inlining would duplicate the chain
    * 2^iters times — the SQL-side analogue of the engine's
    * localCheckpoint-per-round requirement.
    */
  /** The trade graph's CTE head, shared by both graph oracles —
    * mirrors [[tradeGraph]]. */
  private val tradeGraphCtes =
    """WITH nodes AS MATERIALIZED (
      |  SELECT 'c' || CAST(c_custkey AS VARCHAR) AS node FROM customer
      |  UNION ALL
      |  SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node FROM supplier),
      |pairs AS MATERIALIZED (
      |  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
      |    's' || CAST(l_suppkey AS VARCHAR) AS dst, count(*) AS w
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY 1, 2),
      |edges AS MATERIALIZED (SELECT src, dst, w FROM pairs
      |  UNION ALL SELECT dst AS src, src AS dst, w FROM pairs)""".stripMargin

  def q143OracleSql(iters: Int = 10): String = {
    val head = tradeGraphCtes +
      """,
        |outw AS MATERIALIZED (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
        |e AS MATERIALIZED (SELECT edges.src, dst, w, ow FROM edges
        |  JOIN outw USING (src)),
        |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
        |base AS MATERIALIZED (SELECT ((1000000000000 * 15) // 100) // n AS b FROM nn),
        |r0 AS MATERIALIZED (SELECT node, (SELECT 1000000000000 // n FROM nn) AS rank
        |  FROM nodes)""".stripMargin
    val its = (1 to iters).map { k =>
      val p = s"r${k - 1}"
      s"""i$k AS MATERIALIZED (
         |  SELECT dst AS node, sum((r.rank * e.w) // e.ow) AS inr
         |  FROM e JOIN $p r ON r.node = e.src GROUP BY dst),
         |d$k AS MATERIALIZED (
         |  SELECT coalesce(sum(rank), 0) //
         |    (SELECT n FROM nn) AS dshare
         |  FROM $p LEFT JOIN outw ON $p.node = outw.src
         |  WHERE outw.src IS NULL),
         |r$k AS MATERIALIZED (
         |  SELECT n0.node, (SELECT b FROM base) +
         |    (85 * (coalesce(i.inr, 0) + (SELECT dshare FROM d$k)))
         |      // 100 AS rank
         |  FROM nodes n0 LEFT JOIN i$k i ON n0.node = i.node)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$its\nSELECT node, CAST(rank AS BIGINT) AS rank " +
      s"FROM r$iters ORDER BY node"
  }

  /** Unrolled-iteration DuckDB oracle for [[labelProp]] — every level
    * `AS MATERIALIZED` for the same dual-reference reason as q143's
    * (each label frame feeds both the next contribution join and the
    * isolated-node carry). */
  def q148OracleSql(iters: Int = 5): String = {
    val head = tradeGraphCtes +
      ",\nl0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)"
    val its = (1 to iters).map { k =>
      val p = s"l${k - 1}"
      s"""c$k AS MATERIALIZED (
         |  SELECT dst AS node, label, sum(w) AS cw
         |  FROM edges JOIN $p ON $p.node = edges.src GROUP BY 1, 2),
         |t$k AS MATERIALIZED (
         |  SELECT node, label FROM (
         |    SELECT node, label, row_number() OVER (
         |      PARTITION BY node ORDER BY cw DESC, label ASC) AS rn
         |    FROM c$k) WHERE rn = 1),
         |l$k AS MATERIALIZED (
         |  SELECT $p.node, coalesce(t$k.label, $p.label) AS label
         |  FROM $p LEFT JOIN t$k ON $p.node = t$k.node)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$its\nSELECT node, label FROM l$iters ORDER BY node"
  }
}
