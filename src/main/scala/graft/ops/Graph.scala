package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables

/** Iterative graph analytics over relational edge lists — PageRank in
  * exact fixed-point integers, so a 5-iteration run is bit-reproducible
  * on any engine and any parallelism.
  *
  * The graph: the customer→supplier trade network (who buys from whom),
  * `distinct (o_custkey, l_suppkey)` through the order join. Node ids
  * live in one integer space (customer 2k, supplier 2k+1) so the edge
  * list stays a pair of BIGINTs — no strings shuffled. Suppliers have no
  * out-edges, which makes the dangling-mass path (the part naive
  * PageRanks drop) load-bearing rather than decorative.
  *
  * The recurrence, all in integral arithmetic on a 10¹² fixed-point mass
  * (`//` floor division, everything non-negative):
  *
  *   base    = SCALE // N
  *   r₀(v)   = base
  *   S(v)    = Σ_{u→v} r(u) // outdeg(u)
  *   D       = Σ_{outdeg(u)=0} r(u)
  *   r'(v)   = (15·base + 85·(S(v) + D // N)) // 100
  *
  * Floor division loses mass (never creates it), so every iterate is
  * bounded by SCALE — no overflow at any corpus size — and both engines
  * agree bit-for-bit. The oracle is the SAME loop unrolled into chained
  * CTEs by [[pagerankSql]]: one code path defines both engines' queries.
  *
  * Scale: the per-iteration cost is one edge-sized aggregate shuffle
  * (contributions grouped by dst, map-side partials) plus a node-sized
  * join; the edge list is partitioned by src ONCE and cached, so
  * iterations reshuffle only the rank table (node-sized); the dangling
  * scalar is a broadcast one-row aggregate; lineage is truncated each
  * round (the [[graft.dedup.Dedup.Components]] discipline) so iteration
  * i never re-evaluates iteration i−1's plan — in particular the
  * dangling-mass branch would otherwise DOUBLE the rank subtree per
  * round (2⁵ blowup at 5 iterations). Truncation mode is
  * [[graft.sources.Checkpoints.truncateLineage]]: executor-local by
  * default, reliable FS checkpoints when
  * `spark.graft.iter.checkpointDir` points at shared storage (the
  * cluster-fault-tolerance mode; results bit-identical either way).
  */
object Graph {

  /** Fixed-point mass: ranks sum to ≤ 10¹² (floor division only loses). */
  val Scale = 1000000000000L

  /** Damping = 85/100 — integer percent, the usual 0.85. */
  val DampingPct = 85L

  val Iters = 5

  /** PageRank over an arbitrary (src, dst) BIGINT edge list. */
  def pagerankOf(edgesIn: DataFrame, iters: Int = Iters): DataFrame = {
    val edges = edgesIn.select(col("src"), col("dst")).distinct()
    val outd = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // (src, dst, deg), partitioned by the per-iteration join key ONCE
    val edgesDeg = edges.join(outd, "src")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val base = Scale / n
    val danglers = nodes
      .join(outd.select(col("src").as("node")), Seq("node"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // lineage truncation per round; spark.graft.iter.checkpointDir flips
    // this to reliable FS checkpoints (see Checkpoints.truncateLineage —
    // executor-loss recovery vs per-round write, bit-identical results)
    var ranks = graft.sources.Checkpoints.truncateLineage(
      nodes.select(col("node"), lit(base).as("r")))
    for (_ <- 1 to iters) {
      val dang = ranks.join(danglers, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("r")), lit(0L)).cast("long").as("d"))
      val contrib = ranks
        .join(edgesDeg, ranks("node") === edgesDeg("src"))
        .select(col("dst").as("node"), expr("r DIV deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).cast("long").as("s"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          // the L suffixes matter: a small base parses as INT and
          // 15·base overflows under ANSI before widening
          expr(s"(${100L - DampingPct}L * ${base}L" +
            s" + ${DampingPct}L * (coalesce(s, 0L) + d DIV ${n}L)) DIV 100L").as("r"))
      ranks = graft.sources.Checkpoints.truncateLineage(ranks)
    }
    edgesDeg.unpersist()
    nodes.unpersist()
    danglers.unpersist()
    ranks
  }

  /** The trade-network edge list: customer 2k → supplier 2k+1. */
  def tradeEdges(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), (col("o_custkey") * 2).as("src"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), (col("l_suppkey") * 2 + 1).as("dst")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("src"), col("dst"))

  def tradePagerank(spark: SparkSession, dir: String): DataFrame =
    pagerankOf(tradeEdges(spark, dir))
      .select(col("node"),
        when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
          .as("kind"),
        col("r").as("rank_fp"))

  /** The identical recurrence as chained CTEs — the loop unrolled, one
    * `d_i`/`r_i` pair per iteration, generated by the same Scala code
    * that drives the Spark loop.
    */
  def pagerankSql(iters: Int = Iters): String = {
    val baseSql = s"($Scale // (SELECT n FROM nn))"
    val steps = (1 to iters).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""d$i AS (
         |  SELECT COALESCE(CAST(sum(r) AS BIGINT), 0) AS d
         |  FROM $prev LEFT JOIN outd ON node = src WHERE deg IS NULL
         |), r$i AS (
         |  SELECT nd.node,
         |    CAST((${100L - DampingPct} * $baseSql
         |      + $DampingPct * (COALESCE(s.s, 0)
         |        + (SELECT d FROM d$i) // (SELECT n FROM nn))) // 100 AS BIGINT) AS r
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum(p.r // o.deg) AS BIGINT) AS s
         |    FROM edges e
         |    JOIN r${i - 1} p ON p.node = e.src
         |    JOIN outd o ON o.src = e.src
         |    GROUP BY e.dst) s ON s.node = nd.node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH edges AS (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |), nodes AS (
       |  SELECT src AS node FROM edges UNION SELECT dst FROM edges
       |), nn AS (SELECT count(*) AS n FROM nodes),
       |outd AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       |r0 AS (SELECT node, CAST($baseSql AS BIGINT) AS r FROM nodes),
       |$steps
       |SELECT node,
       |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       |  r AS rank_fp
       |FROM r$iters""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> ((s, dir) => tradePagerank(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "q_pagerank" -> pagerankSql()
  )
}
